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
    ap.add_argument("--shards", type=int, default=1,
                    help="interval shards; > 1 measures the vmapped "
                         "single-dispatch S-shard program (BASELINE "
                         "config 4 on one chip; VERDICT r2 next #5)")
    ap.add_argument("--min-trips", type=int, default=1)
    args = ap.parse_args()

    import jax

    from bwtpu.config import EngineConfig
    from bwtpu.engine import (exact_pipeline_packed, inexact_pipeline_packed,
                              pack_reads_for_bench, pick_kmer_depth,
                              upload_index)
    from bwtpu.index import build_fm_index, build_sharded_index
    from bwtpu.simulate import random_genome, simulate_reads

    L = 100
    genome = random_genome(args.genome_bp, seed=21)
    n_batches = -(-args.reads // args.batch)
    S = args.shards
    mt = args.min_trips

    for sa_rate in [int(s) for s in args.sa_rates.split(",")]:
        cfg = EngineConfig(sa_rate=sa_rate, max_hits=4, max_cand=8,
                           read_len=L, min_trips=mt)
        t0 = time.time()
        if S > 1:
            shards, _manifest = build_sharded_index(
                genome, S, cfg, overlap=256, jobs=2
            )
        else:
            shards = [build_fm_index(genome, cfg)]
        build_s = time.time() - t0
        t0 = time.time()
        dev = upload_index(shards)
        shard0 = jax.tree.map(lambda x: x[0], dev.shard)
        upload_s = time.time() - t0
        hbm = device_bytes(dev.shard)
        depths = sorted(shards[0].kmer_tables)

        def vmap_if_sharded(fn):
            """S > 1: all shards in ONE dispatch (the Engine's vmapped
            production mechanism, engine._packed_fn vmapped=True); the
            per-shard pipeline runs against the stacked shard axis."""
            if S == 1:
                return jax.jit(fn), shard0
            return (
                jax.jit(jax.vmap(fn, in_axes=(0, None, None))),
                dev.shard,
            )

        encs = []
        for i in range(n_batches):
            rds, _ = simulate_reads(genome, args.batch, read_len=L,
                                    max_mismatches=2, seed=40 + i)
            rw, ab = pack_reads_for_bench(rds)
            encs.append((jax.device_put(rw), jax.device_put(ab)))

        d = pick_kmer_depth(depths, L)
        fx, sh_arg = vmap_if_sharded(functools.partial(
            exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
            sa_rate=cfg.sa_rate, loc_factor=0.75, min_trips=mt,
            compact_output=True))
        np.asarray(fx(sh_arg, *encs[0])[0])
        exact_rps = 0.0
        exact_over = 0
        for _ in range(2):
            t0 = time.time()
            outs = [fx(sh_arg, *e) for e in encs]
            for o in outs:
                np.asarray(o[0][..., :64])
            exact_rps = max(exact_rps,
                            args.batch * n_batches / (time.time() - t0))
            exact_over = max(exact_over, sum(
                int(np.asarray(o[5]).sum()) for o in outs))

        d_seed = pick_kmer_depth(depths, L // 3)
        fi, sh_arg = vmap_if_sharded(functools.partial(
            inexact_pipeline_packed, L=L, k=2, d=d_seed,
            max_loc=cfg.max_cand, sa_rate=cfg.sa_rate,
            loc_factor=cfg.loc_factor, min_trips=mt, compact_output=True))
        np.asarray(fi(sh_arg, *encs[0])[1])
        k2_rps = 0.0
        k2_over = 0
        for _ in range(2):
            t0 = time.time()
            outs = [fi(sh_arg, *e) for e in encs]
            for o in outs:
                np.asarray(o[1][..., :64])
            k2_rps = max(k2_rps, args.batch * n_batches / (time.time() - t0))
            k2_over = max(k2_over, sum(
                int(np.asarray(o[5]).sum()) for o in outs))

        print(json.dumps({
            "config": f"chr21-scale 1 chip, S={S} shard(s), "
                      f"min_trips={mt}",
            "genome_bp": args.genome_bp,
            "n_shards": S,
            "min_trips": mt,
            "exact_overflow": exact_over,
            "k2_overflow": k2_over,
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
