"""Multi-step Occ lattice (step s = 3 and 4): layout oracle, interval
equality with the 1-step search (including straggler-heavy repetitive
genomes), and packed pipeline parity against the golden model."""

import jax
import numpy as np
import pytest

from bwtpu import dna
from bwtpu.config import EngineConfig
from bwtpu.engine import (device_prep_uniform, exact_pipeline_packed,
                          inexact_pipeline_packed, pack_reads_for_bench,
                          pick_kmer_depth, upload_index)
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import OCCK_BLOCK, build_fm_index, host_occk
from bwtpu.io import Read
from bwtpu.kernels.search2 import backward_search_ra
from bwtpu.kernels.searchk import backward_searchk_uniform
from bwtpu.sais import suffix_array
from bwtpu.simulate import random_genome, simulate_reads


def _shard0(idx):
    dev = upload_index([idx])
    return jax.tree.map(lambda x: x[0], dev.shard)


@pytest.mark.parametrize("step", [3, 4])
def test_occk_layout_oracle(step):
    """host_occk == Ks[t] + naive count of preceding-s-mer t below i,
    with the SA[r] < s rows excluded."""
    genome = random_genome(3000, seed=5)
    idx = build_fm_index(
        genome, EngineConfig(sa_rate=8, read_len=20, occ_step=step)
    )
    assert idx.occk_lattice is not None
    tc = dna.encode(dna.sanitize_genome(genome))
    symbols = np.empty(len(tc) + 1, np.uint8)
    symbols[: len(tc)] = tc + 1
    symbols[len(tc)] = 0
    sa = suffix_array(symbols)
    n = len(sa)
    pre = np.full(n, -1, np.int64)
    v = sa >= step
    k = sa[v].astype(np.int64)
    acc = np.zeros(len(k), np.int64)
    for q in range(step):
        acc = acc * 4 + tc[k - step + q]
    pre[v] = acc
    rng = np.random.default_rng(0)
    ts = list(rng.integers(0, 4**step, 8)) + [0]  # 0 exercises the correction
    for t in ts:
        t = int(t)
        tri = np.array([(t >> (2 * (step - 1 - q))) & 3 for q in range(step)])
        starts = [
            r for r in range(n)
            if sa[r] + step <= len(tc)
            and np.array_equal(tc[sa[r] : sa[r] + step], tri)
        ]
        if not starts:
            continue
        R = OCCK_BLOCK[step]
        for i in [0, 1, R - 1, R, R + 1, n // 2, n - 1, n]:
            expected = starts[0] + int(np.sum(pre[:i] == t))
            assert host_occk(idx, t, i) == expected, (step, t, i)


@pytest.mark.parametrize("step", [3, 4])
@pytest.mark.parametrize(
    "name,genome_fn,L",
    [
        ("random", lambda: random_genome(30000, seed=6), 40),
        ("tandem", lambda: "ACGT" * 3000, 24),
        ("tandem7", lambda: "ACGTACG" * 2000, 26),
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
def test_searchk_matches_search2(step, name, genome_fn, L):
    """Multi-step intervals are bit-identical to the 1-step search, for
    all chain phases and on straggler-heavy repeats. The polyA genome
    with t == 0 queries exercises the invalid-row correction."""
    genome = genome_fn()
    idx = build_fm_index(
        genome, EngineConfig(sa_rate=8, read_len=L, occ_step=step)
    )
    sh = _shard0(idx)
    rng = np.random.default_rng(13)
    starts = rng.integers(0, len(genome) - L, 64)
    reads = [
        Read(rid=f"r{i}", seq=genome[s : s + L], qual=None)
        for i, s in enumerate(starts)
    ]
    reads[0] = Read(rid="n", seq="N" * L, qual=None)
    reads[1] = Read(rid="a", seq="A" * L, qual=None)
    rw, ab = pack_reads_for_bench(reads)
    codes2, amb2, lens2, *_ = device_prep_uniform(rw, ab, L, 0)
    d = pick_kmer_depth(sorted(idx.kmer_tables), L)
    assert d >= 1
    spk, epk, _ = backward_searchk_uniform(
        sh.lattice, sh.latk, sh.latk_inv, sh.C, sh.dollar_row,
        sh.kmer_tables[d], codes2, amb2, L, d, step,
    )
    sp1, ep1, _ = backward_search_ra(
        sh.lattice, sh.C, sh.dollar_row, sh.n, sh.kmer_tables[d],
        np.asarray(codes2), np.asarray(amb2), np.asarray(lens2), d,
    )
    np.testing.assert_array_equal(np.asarray(spk), np.asarray(sp1))
    np.testing.assert_array_equal(np.asarray(epk), np.asarray(ep1))


@pytest.mark.parametrize("step", [3, 4])
def test_packed_pipelines_golden_parity_occk(step):
    """Engine packed fast path (which auto-selects the multi-step search
    from the record width) agrees with the golden model's full hit
    lists at k=0 and k=2."""
    cfg = EngineConfig(
        sa_rate=8, max_hits=8, max_cand=8, read_len=40, occ_step=step
    )
    genome = random_genome(30000, seed=3)
    idx = build_fm_index(genome, cfg)
    assert idx.occk_lattice is not None
    sh = _shard0(idx)
    # The dispatch itself, not just output parity: the round-1 width-map
    # regression silently fell back to the 1-step path and this test
    # still passed (ADVICE r1). Assert the step is actually detected.
    from bwtpu.engine import _shard_occ_step

    assert _shard_occ_step(sh) == step
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
