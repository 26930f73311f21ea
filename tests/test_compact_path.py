"""Compact-output path regression tests (VERDICT r1 item 2).

Round 1 shipped with `_shard_occ_step` decoding the lattice width with a
wrong map: the multi-step/early-stop path silently fell back to 1-step
everywhere, and bench.py (the only caller of compact_output=True)
crashed on a trace-time assert. These tests pin all three layers the
bug slipped through:

  1. step detection itself (`_shard_occ_step` == config.occ_step),
  2. Engine.dispatch_batch actually selecting mode == "compact",
  3. golden parity THROUGH compact_output=True -> assemble_hits_compact
     (exactly what bench.py runs), at k = 0 and k = 2.
"""

import functools

import jax
import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import (Engine, _shard_occ_step, exact_pipeline_packed,
                          inexact_pipeline_packed, pack_reads_for_bench,
                          pick_kmer_depth, upload_index)
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import OCCK_STEP_FROM_WIDTH, OCCK_WIDTH, build_fm_index
from bwtpu.simulate import random_genome, simulate_reads


def test_width_maps_are_mutual_inverses():
    for s, w in OCCK_WIDTH.items():
        assert OCCK_STEP_FROM_WIDTH[w] == s


@pytest.mark.parametrize("step", [3, 4])
def test_step_detection_and_compact_dispatch(step):
    cfg = EngineConfig(
        sa_rate=8, max_hits=8, max_cand=8, read_len=40, occ_step=step
    )
    genome = random_genome(20000, seed=11)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    sh = jax.tree.map(lambda x: x[0], dev.shard)
    assert _shard_occ_step(sh) == step

    eng = Engine([idx])
    reads, _ = simulate_reads(genome, 16, read_len=40, max_mismatches=0, seed=12)
    for k in (0, 2):
        handle = eng.dispatch_batch(reads, k=k)
        assert handle[-2] == "compact", (
            f"uniform packed batch must dispatch compact at k={k}"
        )
        eng.finish_batch(handle)


def test_step_detection_disabled_lattice():
    cfg = EngineConfig(sa_rate=8, max_hits=8, read_len=40, occ_step=0)
    genome = random_genome(5000, seed=13)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    sh = jax.tree.map(lambda x: x[0], dev.shard)
    assert _shard_occ_step(sh) == 0
    eng = Engine([idx])
    reads, _ = simulate_reads(genome, 8, read_len=40, max_mismatches=0, seed=14)
    handle = eng.dispatch_batch(reads, k=0)
    assert handle[-2] == "dense"
    eng.finish_batch(handle)


@pytest.mark.parametrize("step", [3, 4])
def test_engine_compact_golden_parity(step):
    """Full Engine.align_batch through assemble_hits_compact vs golden."""
    cfg = EngineConfig(
        sa_rate=8, max_hits=8, max_cand=8, read_len=40, occ_step=step
    )
    genome = random_genome(30000, seed=21)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 48, read_len=40, max_mismatches=2, seed=22)

    for k in (0, 2):
        handle = eng.dispatch_batch(reads, k=k)
        assert handle[-2] == "compact"
        out = eng.finish_batch(handle)
        for r, hits in zip(reads, out):
            exp = {(h.pos, h.strand, h.nm) for h in golden.align_read(r.seq, k=k)}
            got = {(h.pos, h.strand, h.nm) for h in hits}
            assert got == exp, (r.rid, k, sorted(got), sorted(exp))


def test_bench_jit_shape_compact():
    """The exact jit'd partials bench.py builds (compact_output=True)
    must trace and produce golden-correct compacted outputs — the
    round-1 crash was a trace-time assert on this very call shape."""
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=40)
    genome = random_genome(30000, seed=31)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    sh = jax.tree.map(lambda x: x[0], dev.shard)
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 32, read_len=40, max_mismatches=2, seed=32)
    rw, ab = pack_reads_for_bench(reads)
    depths = sorted(idx.kmer_tables)
    B, L = len(reads), 40

    d = pick_kmer_depth(depths, L)
    fx = jax.jit(functools.partial(
        exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
        sa_rate=cfg.sa_rate, loc_factor=1, compact_output=True))
    cand_c, nm_c, sel, count, overflow, comp_over = fx(sh, rw, ab)
    cnt = int(count)
    cand_c = np.asarray(cand_c)[:cnt]
    nm_c = np.asarray(nm_c)[:cnt]
    sel = np.asarray(sel)[:cnt]
    keep = np.asarray(nm_c) <= 0
    Ct = cfg.max_hits
    got = [set() for _ in reads]
    for c, s in zip(cand_c[keep], sel[keep]):
        row = int(s) // Ct
        i, strand = (row, "+") if row < B else (row - B, "-")
        if 0 <= c <= len(genome) - L:
            got[i].add((int(c), strand))
    for i, r in enumerate(reads):
        exp = {(h.pos, h.strand) for h in golden.align_read(r.seq, k=0)}
        assert got[i] == exp, (i, sorted(got[i]), sorted(exp))

    ds = pick_kmer_depth(depths, L // 3)
    fi = jax.jit(functools.partial(
        inexact_pipeline_packed, L=L, k=2, d=ds, max_loc=cfg.max_cand,
        sa_rate=cfg.sa_rate, loc_factor=cfg.loc_factor, compact_output=True))
    fi(sh, rw, ab)  # must trace + run (round-1 crash shape)


@pytest.mark.parametrize("min_trips", [1, 2, 9])
def test_engine_compact_golden_parity_min_trips(min_trips):
    """Candidate thinning (min_trips > 0) must not change the hit set:
    stopping later is always sound (intervals only narrow; the verify
    decides the superset either way). min_trips=9 exceeds the whole
    seed chain for k=2 — the gate must degrade to full-chain search."""
    cfg = EngineConfig(
        sa_rate=8, max_hits=8, max_cand=8, read_len=40,
        min_trips=min_trips,
    )
    genome = random_genome(30000, seed=23)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 48, read_len=40, max_mismatches=2,
                              seed=24)
    for k in (0, 2):
        handle = eng.dispatch_batch(reads, k=k)
        assert handle[-2] == "compact"
        out = eng.finish_batch(handle)
        for r, hits in zip(reads, out):
            exp = {(h.pos, h.strand, h.nm)
                   for h in golden.align_read(r.seq, k=k)}
            got = {(h.pos, h.strand, h.nm) for h in hits}
            assert got == exp, (r.rid, k, sorted(got), sorted(exp))
