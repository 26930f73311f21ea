"""Tiered k<=2 search (VERDICT r3 item 2): exact-first, escalate the
reads with no nm == 0 hit to the pigeonhole seed expansion.

Reporting contract (engine.tiered_pipeline_packed docstring):
  - escalated reads (no exact hit): FULL golden-k parity;
  - exact-hit reads: hits are a superset of golden k=0 and a subset of
    golden k (their nm == 0 set is complete), so primary selection and
    MAPQ match the full enumeration exactly.
"""

import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import (pack_reads_for_bench, pick_kmer_depth,
                          tiered_pipeline_packed, tiered_to_columns,
                          upload_index)
from bwtpu.golden import GoldenFMIndex, Hit, sort_hits
from bwtpu.index import build_fm_index
from bwtpu.simulate import random_genome, simulate_reads


def _run_tiered(genome, reads, k, cfg, esc_factor=1.0):
    import jax

    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    shard0 = jax.tree.map(lambda x: x[0], dev.shard)
    L = len(reads[0].seq)
    depths = sorted(idx.kmer_tables)
    d = pick_kmer_depth(depths, L)
    d_seed = pick_kmer_depth(depths, L // (k + 1))
    rw, ab = pack_reads_for_bench(reads)
    out = tiered_pipeline_packed(
        shard0, rw, ab, L=L, k=k, d=d, d_seed=d_seed,
        max_hits=cfg.max_hits, max_cand=cfg.max_cand,
        sa_rate=cfg.sa_rate, loc_factor=cfg.loc_factor,
        k2_loc_factor=cfg.loc_factor, esc_factor=esc_factor,
        min_trips=cfg.min_trips,
    )
    B = len(reads)
    rows, p, m, n_over, co = tiered_to_columns(
        out, cfg.max_hits, cfg.max_cand, k, B)
    assert n_over == 0 and co == 0, (n_over, co)
    n = idx.text_len
    # decode to per-read hit lists (mirror of results.flatten_hits for
    # one shard), deduped on (read, pos, strand) keeping min nm
    hits = [dict() for _ in range(B)]
    for r, pos, nm in zip(rows.tolist(), p.tolist(), m.tolist()):
        b, rev = r % B, r >= B
        if pos < 0 or pos + L > n:
            continue
        key = (pos, rev)
        if key not in hits[b] or nm < hits[b][key]:
            hits[b][key] = nm
    out_lists = []
    for hmap in hits:
        out_lists.append(sort_hits([
            Hit(nm=nm, strand="-" if rev else "+", pos=pos)
            for (pos, rev), nm in hmap.items()
        ]))
    return out_lists


@pytest.mark.parametrize(
    "k", [pytest.param(1, marks=pytest.mark.scale), 2])
def test_tiered_stratum_contract(k):
    genome = random_genome(50_000, seed=21)
    golden = GoldenFMIndex(genome)
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=60,
                       loc_factor=2, min_trips=1)
    reads, _ = simulate_reads(genome, 48, read_len=60, max_mismatches=k,
                              seed=22)
    got = _run_tiered(genome, reads, k, cfg)
    n_esc = 0
    for r, hs in zip(reads, got):
        g0 = golden.align_read(r.seq, k=0)
        gk = golden.align_read(r.seq, k=k)
        if not g0:
            n_esc += 1
            assert hs == gk, (r.rid, hs, gk)  # escalated: full parity
        else:
            s, s0, sk = set(hs), set(g0), set(gk)
            assert s0 <= s <= sk, (r.rid, hs)
            # nm==0 stratum complete -> primary + MAPQ match full enum
            assert {h for h in hs if h.nm == 0} == s0
    assert n_esc > 0, "read set never escalated — test is vacuous"


def test_tiered_esc_capacity_overflow_is_counted():
    """Escalated reads beyond esc_factor capacity must surface in the
    per-row incompleteness channel, never silently."""
    import jax

    genome = random_genome(20_000, seed=31)
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=40,
                       loc_factor=2, min_trips=1)
    # every read carries >= 1 mismatch -> all escalate
    rng = np.random.default_rng(7)
    reads = []
    from bwtpu import dna
    from bwtpu.io import Read

    g = dna.encode(genome)
    for i in range(32):
        pos = int(rng.integers(0, len(g) - 40))
        w = g[pos : pos + 40].copy()
        w[5] = (w[5] + 1) % 4
        reads.append(Read(f"m{i}", dna.decode(w)))
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    shard0 = jax.tree.map(lambda x: x[0], dev.shard)
    rw, ab = pack_reads_for_bench(reads)
    depths = sorted(idx.kmer_tables)
    d = pick_kmer_depth(depths, 40)
    d_seed = pick_kmer_depth(depths, 40 // 3)
    out = tiered_pipeline_packed(
        shard0, rw, ab, L=40, k=2, d=d, d_seed=d_seed,
        max_hits=cfg.max_hits, max_cand=cfg.max_cand,
        sa_rate=cfg.sa_rate, loc_factor=cfg.loc_factor,
        k2_loc_factor=cfg.loc_factor, esc_factor=1.0, min_trips=1,
    )
    esc_cnt = int(np.asarray(out[9]))
    assert esc_cnt == 32  # all escalated, capacity = max(4096,...) holds all


# ---- Engine-level tiered dispatch (round 5: tiered through the block
# path / CLI, not just the bare pipeline) ----


def _stratum_check(golden, reads, lists, k):
    """Assert the tiered reporting contract; returns escalated count."""
    n_esc = 0
    for r, hs in zip(reads, lists):
        g0 = golden.align_read(r.seq, k=0)
        gk = golden.align_read(r.seq, k=k)
        assert [h for h in hs if h.nm == 0] == g0, r.rid
        assert {(h.pos, h.strand, h.nm) for h in hs} <= {
            (h.pos, h.strand, h.nm) for h in gk}, r.rid
        if not g0:
            assert hs == gk, (r.rid, hs, gk)
            n_esc += 1
    return n_esc


@pytest.mark.parametrize("mode", ["single", "fused", "stacked"])
def test_engine_tiered_dispatch(mode):
    """dispatch_block(tiered=True) through every multi-shard dispatch
    form: single shard, unstacked fused-list, stacked vmap."""
    from bwtpu.engine import Engine
    from bwtpu.index import build_sharded_index
    from bwtpu.readblock import ReadBlock
    from bwtpu.results import hit_lists

    genome = random_genome(30_000, seed=41)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, read_len=60,
                       loc_factor=2, min_trips=1)
    reads, _ = simulate_reads(genome, 32, read_len=60, max_mismatches=2,
                              seed=42)
    if mode == "single":
        eng = Engine([build_fm_index(genome, cfg)])
    else:
        shards, man = build_sharded_index(genome, 3, config=cfg,
                                          overlap=64)
        eng = Engine(shards, man, vmap_shards=(mode == "stacked"))
    blk = ReadBlock.from_reads(reads)
    handle = eng.dispatch_block(blk, 2, pad_to=32, tiered=True)
    assert handle[6] == "tiered"
    flat = eng.finish_block(handle)
    golden = GoldenFMIndex(genome)
    n_esc = _stratum_check(golden, reads, hit_lists(flat), 2)
    assert n_esc > 0 and eng.stats.escalated > 0


def test_engine_tiered_healing():
    """Binding caps on a repeat-rich genome: tiered dispatch must heal
    (re-dispatching THROUGH the tiered path) and still satisfy the
    stratum contract."""
    from bwtpu.engine import Engine
    from bwtpu.readblock import ReadBlock
    from bwtpu.results import hit_lists

    base = random_genome(3000, seed=43)
    rep = base[:120] * 5 + base
    cfg = EngineConfig(sa_rate=4, max_hits=2, max_cand=2, read_len=50,
                       loc_factor=0.5, min_trips=1, max_heals=6)
    eng = Engine([build_fm_index(rep, cfg)])
    reads, _ = simulate_reads(rep, 16, read_len=50, max_mismatches=1,
                              seed=44)
    blk = ReadBlock.from_reads(reads)
    flat = eng.finish_block(
        eng.dispatch_block(blk, 2, pad_to=16, tiered=True))
    assert eng.stats.heals >= 1, "binding caps were meant to trigger healing"
    golden = GoldenFMIndex(rep)
    _stratum_check(golden, reads, hit_lists(flat), 2)
