"""chr21-scale run on the real chip (BASELINE config 4 scale on one
chip; VERDICT r1 item 4).

Builds a 46.7 Mbp genome index (native SA-IS + pack.cc path), aligns
>= 1 M reads at k=0 and k=2, and A/Bs sa_rate=1 (full SA resident,
187 MB, one-gather locate) vs sa_rate=8 (23 MB, bounded LF-walk).
Prints one JSON line per configuration; results recorded in
docs/DESIGN.md.

Run:  python scripts/scale_chr21.py [--reads 1048576] [--sa-rates 1,8]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def device_bytes(shard) -> int:
    import jax

    total = 0
    for leaf in jax.tree.leaves(shard):
        total += leaf.size * leaf.dtype.itemsize
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1048576)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--sa-rates", default="1,8")
    ap.add_argument("--genome-bp", type=int, default=46_709_983)
    args = ap.parse_args()

    import jax

    from bwtpu.config import EngineConfig
    from bwtpu.engine import (exact_pipeline_packed, inexact_pipeline_packed,
                              pack_reads_for_bench, pick_kmer_depth,
                              upload_index)
    from bwtpu.index import build_fm_index
    from bwtpu.simulate import random_genome, simulate_reads

    L = 100
    genome = random_genome(args.genome_bp, seed=21)
    n_batches = -(-args.reads // args.batch)

    for sa_rate in [int(s) for s in args.sa_rates.split(",")]:
        cfg = EngineConfig(sa_rate=sa_rate, max_hits=4, max_cand=8,
                           read_len=L)
        t0 = time.time()
        idx = build_fm_index(genome, cfg)
        build_s = time.time() - t0
        t0 = time.time()
        dev = upload_index([idx])
        shard0 = jax.tree.map(lambda x: x[0], dev.shard)
        upload_s = time.time() - t0
        hbm = device_bytes(shard0)
        depths = sorted(idx.kmer_tables)

        encs = []
        for i in range(n_batches):
            rds, _ = simulate_reads(genome, args.batch, read_len=L,
                                    max_mismatches=2, seed=40 + i)
            rw, ab = pack_reads_for_bench(rds)
            encs.append((jax.device_put(rw), jax.device_put(ab)))

        d = pick_kmer_depth(depths, L)
        fx = jax.jit(functools.partial(
            exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
            sa_rate=cfg.sa_rate, loc_factor=1, compact_output=True))
        np.asarray(fx(shard0, *encs[0])[0])
        exact_rps = 0.0
        for _ in range(2):
            t0 = time.time()
            outs = [fx(shard0, *e) for e in encs]
            for o in outs:
                np.asarray(o[0][:64])
            exact_rps = max(exact_rps,
                            args.batch * n_batches / (time.time() - t0))

        d_seed = pick_kmer_depth(depths, L // 3)
        fi = jax.jit(functools.partial(
            inexact_pipeline_packed, L=L, k=2, d=d_seed,
            max_loc=cfg.max_cand, sa_rate=cfg.sa_rate,
            loc_factor=cfg.loc_factor, compact_output=True))
        np.asarray(fi(shard0, *encs[0])[1])
        k2_rps = 0.0
        for _ in range(2):
            t0 = time.time()
            outs = [fi(shard0, *e) for e in encs]
            for o in outs:
                np.asarray(o[1][:64])
            k2_rps = max(k2_rps, args.batch * n_batches / (time.time() - t0))

        print(json.dumps({
            "config": "chr21-scale 1 chip",
            "genome_bp": args.genome_bp,
            "sa_rate": sa_rate,
            "reads": args.batch * n_batches,
            "exact_reads_per_s": round(exact_rps, 1),
            "k2_reads_per_s": round(k2_rps, 1),
            "index_build_s": round(build_s, 1),
            "upload_s": round(upload_s, 1),
            "hbm_index_bytes": hbm,
            "hbm_index_mb": round(hbm / 1e6, 1),
            "kmer_d": d,
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
