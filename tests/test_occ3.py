"""3-step Occ lattice: layout oracle, interval equality with the 1-step
search (including straggler-heavy repetitive genomes), and packed
pipeline parity against the golden model."""

import jax
import numpy as np
import pytest

from bwtpu import dna
from bwtpu.config import EngineConfig
from bwtpu.engine import (device_prep_uniform, exact_pipeline_packed,
                          inexact_pipeline_packed, pack_reads_for_bench,
                          pick_kmer_depth, upload_index)
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import BLOCK3, OCC3_INVALID, build_fm_index, host_occ3
from bwtpu.io import Read
from bwtpu.kernels.search2 import backward_search_ra
from bwtpu.kernels.search3 import backward_search3_uniform
from bwtpu.sais import suffix_array
from bwtpu.simulate import random_genome, simulate_reads


def _shard0(idx):
    dev = upload_index([idx])
    return jax.tree.map(lambda x: x[0], dev.shard)


def test_occ3_layout_oracle():
    """host_occ3 == K3[t] + naive count of preceding-triple t below i."""
    genome = random_genome(3000, seed=5)
    idx = build_fm_index(genome, EngineConfig(sa_rate=8, read_len=20))
    assert idx.occ3_lattice is not None
    tc = dna.encode(dna.sanitize_genome(genome))
    symbols = np.empty(len(tc) + 1, np.uint8)
    symbols[: len(tc)] = tc + 1
    symbols[len(tc)] = 0
    sa = suffix_array(symbols)
    n = len(sa)
    pre = np.full(n, OCC3_INVALID, np.int64)
    v = sa >= 3
    k = sa[v].astype(np.int64)
    pre[v] = tc[k - 3] * 16 + tc[k - 2] * 4 + tc[k - 1]
    rng = np.random.default_rng(0)
    for t in rng.integers(0, 64, 8):
        t = int(t)
        tri = np.array([t >> 4, (t >> 2) & 3, t & 3])
        starts = [
            r for r in range(n)
            if sa[r] + 3 <= len(tc) and np.array_equal(tc[sa[r] : sa[r] + 3], tri)
        ]
        if not starts:
            continue
        for i in [0, 1, BLOCK3 - 1, BLOCK3, BLOCK3 + 1, n // 2, n - 1, n]:
            expected = starts[0] + int(np.sum(pre[:i] == t))
            assert host_occ3(idx, t, i) == expected, (t, i)


@pytest.mark.parametrize(
    "name,genome_fn,L",
    [
        ("random", lambda: random_genome(30000, seed=6), 40),
        ("tandem", lambda: "ACGT" * 3000, 24),
        ("tandem7", lambda: "ACGTACG" * 2000, 25),
        (
            "polyA",
            lambda: "A" * 4000
            + "".join(
                np.random.default_rng(1).choice(list("ACGT"), size=8000)
            ),
            23,
        ),
    ],
)
def test_search3_matches_search2(name, genome_fn, L):
    """3-step intervals are bit-identical to the 1-step search, for all
    three L % 3 phases and on straggler-heavy repeats."""
    genome = genome_fn()
    idx = build_fm_index(genome, EngineConfig(sa_rate=8, read_len=L))
    sh = _shard0(idx)
    rng = np.random.default_rng(13)
    starts = rng.integers(0, len(genome) - L, 64)
    reads = [
        Read(rid=f"r{i}", seq=genome[s : s + L], qual=None)
        for i, s in enumerate(starts)
    ]
    # a few mutated + one all-N read exercise empty/amb lanes
    reads[0] = Read(rid="n", seq="N" * L, qual=None)
    rw, ab = pack_reads_for_bench(reads)
    codes2, amb2, lens2, *_ = device_prep_uniform(rw, ab, L, 0)
    d = pick_kmer_depth(sorted(idx.kmer_tables), L)
    assert d >= 1
    sp3, ep3, _ = backward_search3_uniform(
        sh.lattice, sh.lattice3, sh.C, sh.dollar_row, sh.kmer_tables[d],
        codes2, amb2, L, d,
    )
    sp1, ep1, _ = backward_search_ra(
        sh.lattice, sh.C, sh.dollar_row, sh.n, sh.kmer_tables[d],
        np.asarray(codes2), np.asarray(amb2), np.asarray(lens2), d,
    )
    np.testing.assert_array_equal(np.asarray(sp3), np.asarray(sp1))
    np.testing.assert_array_equal(np.asarray(ep3), np.asarray(ep1))


def test_packed_pipelines_golden_parity_occ3():
    """Engine packed fast path (which auto-selects the 3-step search)
    agrees with the golden model's full hit lists at k=0 and k=2."""
    cfg = EngineConfig(sa_rate=8, max_hits=8, max_cand=8, read_len=40)
    genome = random_genome(30000, seed=3)
    idx = build_fm_index(genome, cfg)
    assert idx.occ3_lattice is not None
    sh = _shard0(idx)
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 48, read_len=40, max_mismatches=2, seed=4)
    rw, ab = pack_reads_for_bench(reads)
    depths = sorted(idx.kmer_tables)
    B, L = len(reads), 40

    d = pick_kmer_depth(depths, L)
    pos, valid, over, _ = exact_pipeline_packed(
        sh, rw, ab, L=L, d=d, max_hits=cfg.max_hits, sa_rate=cfg.sa_rate
    )
    pos, valid = np.asarray(pos), np.asarray(valid)
    for i, r in enumerate(reads):
        for row, strand in ((i, "+"), (B + i, "-")):
            exp = {h.pos for h in golden.align_read(r.seq, k=0) if h.strand == strand}
            assert set(pos[row][valid[row]].tolist()) == exp

    ds = pick_kmer_depth(depths, L // 3)
    cand, nm, hv, _, _, _ = inexact_pipeline_packed(
        sh, rw, ab, L=L, k=2, d=ds, max_loc=cfg.max_cand, sa_rate=cfg.sa_rate
    )
    cand, nm, hv = np.asarray(cand), np.asarray(nm), np.asarray(hv)
    for i, r in enumerate(reads):
        exp = {(h.pos, h.strand, h.nm) for h in golden.align_read(r.seq, k=2)}
        got = set()
        for row, strand in ((i, "+"), (B + i, "-")):
            for c, m, v in zip(cand[row], nm[row], hv[row]):
                if v and 0 <= c <= len(genome) - L:
                    got.add((int(c), strand, int(m)))
        assert got == exp, (i, sorted(got), sorted(exp))
