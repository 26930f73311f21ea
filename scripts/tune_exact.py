"""On-chip tuning sweep for the exact compact pipeline: compaction cap
(loc_factor) x batch size. The rows/read roofline (DESIGN.md) says the
compacted locate+verify stages pay their CAP in gather rows, so cap
below B2 buys throughput as long as overflow stays zero.

Run:  python scripts/tune_exact.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from bwtpu.config import EngineConfig
    from bwtpu.engine import (exact_pipeline_packed, pack_reads_for_bench,
                              pick_kmer_depth, upload_index)
    from bwtpu.index import build_fm_index
    from bwtpu.simulate import ECOLI_SCALE, random_genome, simulate_reads

    L = 100
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=L)
    genome = random_genome(ECOLI_SCALE, seed=1)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    shard0 = jax.tree.map(lambda x: x[0], dev.shard)
    d = pick_kmer_depth(sorted(idx.kmer_tables), L)

    for B in (262144, 524288):
        encs = []
        for i in range(2):
            rds, _ = simulate_reads(genome, B, read_len=L, max_mismatches=2,
                                    seed=2 + i)
            rw, ab = pack_reads_for_bench(rds)
            encs.append((jax.device_put(rw), jax.device_put(ab)))
        for lf in (1.0, 0.75, 0.5, 0.375):
            fx = jax.jit(functools.partial(
                exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
                sa_rate=cfg.sa_rate, loc_factor=lf, compact_output=True))
            np.asarray(fx(shard0, *encs[0])[0])
            best = 0.0
            comp_over = 0
            for _ in range(2):
                t0 = time.time()
                outs = [fx(shard0, *e) for e in encs]
                for o in outs:
                    comp_over = max(comp_over, int(np.asarray(o[5])))
                    np.asarray(o[0][:64])
                best = max(best, B * 2 / (time.time() - t0))
            print(json.dumps({
                "batch": B, "loc_factor": lf,
                "exact_reads_per_s": round(best, 1),
                "compact_overflow": comp_over,
            }), flush=True)


if __name__ == "__main__":
    main()
