"""Benchmark harness: prints ONE JSON line with the driver metric.

Metric (BASELINE.json): reads/s/chip for exact + 2-mismatch search vs
the CPU reference. The "CPU reference" is the golden model
(bwtpu.golden) — the reference repo's interpreted per-read walk style
(the mount was empty; SURVEY.md §0) — measured in-process on a sample
and extrapolated.

Config: E. coli-scale (4.6 Mbp) random genome, 100 bp simulated reads,
both strands, replicated index, one chip (BASELINE configs 1-2).
Device throughput is measured on the compiled pipeline with
block_until_ready walls (SURVEY.md §5.1).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bwtpu import dna
    from bwtpu.config import EngineConfig
    from bwtpu.engine import (Engine, exact_pipeline, inexact_pipeline,
                              upload_index)
    from bwtpu.golden import GoldenFMIndex
    from bwtpu.index import build_fm_index
    from bwtpu.simulate import ECOLI_SCALE, random_genome, simulate_reads

    t_setup0 = time.time()
    # sa_rate=8: locate walk length dominates gather-row count (see
    # docs/DESIGN.md); trading 0.5 B/base of ssa memory for 4x fewer
    # locate rows is the right call at bacterial scale.
    cfg = EngineConfig(sa_rate=8, max_hits=4, max_cand=8, read_len=100)
    genome = random_genome(ECOLI_SCALE, seed=1)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])

    B = 8192  # reads per device call (2B strand rows)
    shim = type("S", (), {"config": cfg})()
    # Distinct pre-staged device-resident batches, and every output is
    # materialized to host: repeated identical dispatches can otherwise
    # be served from caches along the relay path and overstate
    # throughput by orders of magnitude (measured).
    n_batches = 4
    batches = []
    reads = None
    for i in range(n_batches):
        rds, _ = simulate_reads(genome, B, read_len=100, max_mismatches=2,
                                seed=2 + i)
        reads = reads or rds
        enc = Engine.encode_batch(shim, rds)[:3]
        batches.append(tuple(jax.device_put(x) for x in enc))

    base = (dev.lattice[0], dev.mark_rank_ck[0], dev.ssa[0], dev.C[0],
            dev.dollar_row[0], dev.n[0])

    # --- exact (config 1) ---
    fx = jax.jit(functools.partial(
        exact_pipeline, max_hits=cfg.max_hits, sa_rate=cfg.sa_rate,
        backend="jnp"))
    np.asarray(fx(*base, *batches[0])[0])  # compile + warm
    t0 = time.time()
    for i in range(n_batches):
        np.asarray(fx(*base, *batches[i])[0])
    exact_rps = B * n_batches / (time.time() - t0)

    # --- inexact k=2 (config 2) ---
    fi = jax.jit(functools.partial(
        inexact_pipeline, k=2, max_loc=cfg.max_cand, sa_rate=cfg.sa_rate,
        backend="jnp"))
    ibase = base + (dev.text_len[0], dev.text_packed[0])
    np.asarray(fi(*ibase, *batches[0])[0])  # compile + warm
    t0 = time.time()
    for i in range(n_batches):
        np.asarray(fi(*ibase, *batches[i])[0])
    k2_rps = B * n_batches / (time.time() - t0)

    # --- CPU reference (golden, interpreted walks) on a sample ---
    golden = GoldenFMIndex(genome)
    sample = reads[:20]
    t0 = time.time()
    for r in sample:
        golden.align_read(r.seq, k=0)
    cpu_exact_rps = len(sample) / (time.time() - t0)
    t0 = time.time()
    for r in sample[:5]:
        golden.align_read(r.seq, k=2)
    cpu_k2_rps = 5 / (time.time() - t0)

    value = exact_rps
    vs = exact_rps / cpu_exact_rps
    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "reads/s/chip exact 100bp E.coli-scale (both strands)",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 1),
        "extras": {
            "k2_reads_per_s": round(k2_rps, 1),
            "cpu_ref_exact_reads_per_s": round(cpu_exact_rps, 2),
            "cpu_ref_k2_reads_per_s": round(cpu_k2_rps, 2),
            "k2_vs_baseline": round(k2_rps / cpu_k2_rps, 1),
            "platform": platform,
            "batch_reads": B,
            "setup_s": round(time.time() - t_setup0, 1),
        },
    }))


if __name__ == "__main__":
    main()
