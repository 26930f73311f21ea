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
