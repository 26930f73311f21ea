"""On-chip stage-time decomposition of the exact compact pipeline.

sol_fraction ~0.30 in BENCH_r02 means ~70% of wall time is NOT modeled
gather rows; this script attributes it. Each prefix of the pipeline is
jitted separately (search only -> +compact -> +locate -> full) and
timed with the bench's pipelined-dispatch method on distinct inputs,
so stage cost = successive difference. Results -> docs/DESIGN.md.

Run:  python scripts/stage_times.py [--batch 262144] [--stop-width N]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, encs, shard0, touch, reps=3):
    np.asarray(touch(fn(shard0, *encs[0])))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        outs = [fn(shard0, *e) for e in encs]
        for o in outs:
            np.asarray(touch(o))
        best = min(best, (time.time() - t0) / len(encs))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--nbatches", type=int, default=2)
    ap.add_argument("--stop-width", type=int, default=None)
    ap.add_argument("--loc-factor", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bwtpu.config import EngineConfig
    from bwtpu.engine import (_exact_finish, device_prep_uniform,
                              exact_pipeline_packed, pack_reads_for_bench,
                              pick_kmer_depth, upload_index)
    from bwtpu.index import build_fm_index
    from bwtpu.kernels.compact import compact
    from bwtpu.kernels.search import interval_rows
    from bwtpu.kernels.searchk import search_early_stop_uniform
    from bwtpu.simulate import ECOLI_SCALE, random_genome, simulate_reads

    L = 100
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=L)
    sw = args.stop_width or cfg.max_hits
    genome = random_genome(ECOLI_SCALE, seed=1)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    shard0 = jax.tree.map(lambda x: x[0], dev.shard)
    d = pick_kmer_depth(sorted(idx.kmer_tables), L)
    step = cfg.occ_step
    B = args.batch

    encs = []
    for i in range(args.nbatches):
        rds, _ = simulate_reads(genome, B, read_len=L, max_mismatches=2,
                                seed=2 + i)
        rw, ab = pack_reads_for_bench(rds)
        encs.append((jax.device_put(rw), jax.device_put(ab)))

    # --- stage prefixes ---
    @jax.jit
    def prep_only(shard, rw, ab):
        codes2, amb2, *_ = device_prep_uniform(rw, ab, L, 0)
        return codes2.sum() + amb2.sum()

    @functools.partial(jax.jit, static_argnames=())
    def search_only(shard, rw, ab):
        codes2, amb2, *_ = device_prep_uniform(rw, ab, L, 0)
        sp, ep, rem, over = search_early_stop_uniform(
            shard.lattice, shard.latk, shard.latk_inv, shard.C,
            shard.dollar_row, shard.kmer_tables[d], codes2, amb2, L, d,
            step, sw)
        return sp.sum() + ep.sum() + rem.sum()

    @jax.jit
    def search_compact(shard, rw, ab):
        codes2, amb2, *_ = device_prep_uniform(rw, ab, L, 0)
        sp, ep, rem, over = search_early_stop_uniform(
            shard.lattice, shard.latk, shard.latk_inv, shard.C,
            shard.dollar_row, shard.kmer_tables[d], codes2, amb2, L, d,
            step, sw)
        B2 = sp.shape[0]
        rows, rvalid, overflow_s = interval_rows(sp, ep, cfg.max_hits)
        cap = max(int(B2 * args.loc_factor), 4096)
        sel, count, over2 = compact(rvalid.reshape(-1), cap)
        return sel.sum() + count + jnp.take(rows.reshape(-1), sel).sum()

    from bwtpu.kernels.locate import locate_rows

    def upto_locate_body(shard, rw, ab, with_fused):
        codes2, amb2, lens2, rw2, ab2, lm2, _ = device_prep_uniform(
            rw, ab, L, 0)
        sp, ep, rem, over = search_early_stop_uniform(
            shard.lattice, shard.latk, shard.latk_inv, shard.C,
            shard.dollar_row, shard.kmer_tables[d], codes2, amb2, L, d,
            step, sw)
        B2 = sp.shape[0]
        rows, rvalid, overflow_s = interval_rows(sp, ep, cfg.max_hits)
        cap = max(int(B2 * args.loc_factor), 4096)
        sel, count, over2 = compact(rvalid.reshape(-1), cap)
        sel_valid = jnp.arange(cap, dtype=jnp.int32) < count
        rows_c = jnp.take(rows.reshape(-1), sel)
        spos_c = locate_rows(shard.lattice, shard.ssa, shard.C,
                             shard.dollar_row, rows_c, sel_valid,
                             cfg.sa_rate)
        acc = spos_c.sum()
        if with_fused:
            lane = sel // cfg.max_hits
            b_idx = lane
            W = rw2.shape[1]
            fused = jnp.concatenate(
                [rw2, ab2, lm2, lens2[:, None]], axis=1)
            fc = jnp.take(fused, b_idx, axis=0)
            acc = acc + fc.sum()
        return acc

    upto_locate = jax.jit(functools.partial(upto_locate_body,
                                            with_fused=False))
    upto_fused = jax.jit(functools.partial(upto_locate_body,
                                           with_fused=True))

    fx = jax.jit(functools.partial(
        exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
        sa_rate=cfg.sa_rate, loc_factor=args.loc_factor,
        compact_output=True))

    t_prep = timeit(prep_only, encs, shard0, lambda o: o)
    t_search = timeit(search_only, encs, shard0, lambda o: o)
    t_comp = timeit(search_compact, encs, shard0, lambda o: o)
    t_loc = timeit(upto_locate, encs, shard0, lambda o: o)
    t_fused = timeit(upto_fused, encs, shard0, lambda o: o)
    t_full = timeit(fx, encs, shard0, lambda o: o[0][:64])

    print(json.dumps({
        "batch": B, "stop_width": sw, "loc_factor": args.loc_factor,
        "prep_ms": round(t_prep * 1e3, 1),
        "search_ms": round((t_search - t_prep) * 1e3, 1),
        "compact_ms": round((t_comp - t_search) * 1e3, 1),
        "locate_ms": round((t_loc - t_comp) * 1e3, 1),
        "fusedgather_ms": round((t_fused - t_loc) * 1e3, 1),
        "verify_ms": round((t_full - t_fused) * 1e3, 1),
        "full_ms": round(t_full * 1e3, 1),
        "reads_per_s": round(B / t_full, 1),
    }, ), flush=True)


if __name__ == "__main__":
    main()
