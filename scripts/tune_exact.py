"""On-chip tuning sweep for the packed compact pipelines:
min_trips (candidate thinning) x compaction cap (loc_factor), exact and
k=2. The rows/read roofline (DESIGN.md) says the compacted
locate+verify stages pay their CAP in gather rows, so cap below B2 buys
throughput — but ONLY configurations with compact_overflow == 0 are
shippable (overflow = dropped candidates = recall loss). min_trips
narrows intervals before the stop, collapsing false candidates so small
caps stay overflow-free.

Run:  python scripts/tune_exact.py [--kind exact|k2] [--batch N]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="exact", choices=["exact", "k2"])
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--min-trips", default="0,1,2,3")
    ap.add_argument("--loc-factors", default=None)
    args = ap.parse_args()

    import jax

    from bwtpu.config import EngineConfig
    from bwtpu.engine import (exact_pipeline_packed, inexact_pipeline_packed,
                              pack_reads_for_bench, pick_kmer_depth,
                              upload_index)
    from bwtpu.index import build_fm_index
    from bwtpu.simulate import ECOLI_SCALE, random_genome, simulate_reads

    L = 100
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=L)
    genome = random_genome(ECOLI_SCALE, seed=1)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    shard0 = jax.tree.map(lambda x: x[0], dev.shard)
    depths = sorted(idx.kmer_tables)

    B = args.batch
    encs = []
    for i in range(2):
        rds, _ = simulate_reads(genome, B, read_len=L, max_mismatches=2,
                                seed=2 + i)
        rw, ab = pack_reads_for_bench(rds)
        encs.append((jax.device_put(rw), jax.device_put(ab)))

    if args.loc_factors:
        lfs = [float(x) for x in args.loc_factors.split(",")]
    else:
        lfs = [1.5, 1.0, 0.5, 0.25, 0.125] if args.kind == "exact" else \
              [3.0, 2.0, 1.0, 0.5, 0.25]
    over_idx = 5  # scalar compaction overflow (same tuple both kinds)

    for mt in [int(x) for x in args.min_trips.split(",")]:
        for lf in lfs:
            if args.kind == "exact":
                d = pick_kmer_depth(depths, L)
                fn = jax.jit(functools.partial(
                    exact_pipeline_packed, L=L, d=d,
                    max_hits=cfg.max_hits, sa_rate=cfg.sa_rate,
                    loc_factor=lf, min_trips=mt, compact_output=True))
            else:
                d = pick_kmer_depth(depths, L // 3)
                fn = jax.jit(functools.partial(
                    inexact_pipeline_packed, L=L, k=2, d=d,
                    max_loc=cfg.max_cand, sa_rate=cfg.sa_rate,
                    loc_factor=lf, min_trips=mt, compact_output=True))
            np.asarray(fn(shard0, *encs[0])[0])
            best, over = 0.0, 0
            for _ in range(2):
                t0 = time.time()
                outs = [fn(shard0, *e) for e in encs]
                for o in outs:
                    over = max(over, int(np.asarray(o[over_idx])))
                    np.asarray(o[0][:64])
                best = max(best, B * 2 / (time.time() - t0))
            print(json.dumps({
                "kind": args.kind, "batch": B, "min_trips": mt,
                "loc_factor": lf,
                "reads_per_s": round(best, 1),
                "compact_overflow": over,
            }), flush=True)


if __name__ == "__main__":
    main()
