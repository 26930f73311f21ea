"""Property tests: the golden model vs brute force (SURVEY.md §0.2, §4.2.2).

These pin the behavioral contract every other component is tested
against: exact backward search == brute-force find-all; inexact(k) ==
brute-force Hamming scan; locate recovers true positions.
"""

import numpy as np
import pytest

from bwtpu import dna
from bwtpu.golden import GoldenFMIndex, brute_force_align, suffix_array
from bwtpu.simulate import random_genome


def naive_sa(s):
    n = len(s)
    return np.array(sorted(range(n), key=lambda i: tuple(s[i:])), dtype=np.int64)


@pytest.mark.parametrize("n,seed", [(1, 0), (2, 1), (13, 2), (100, 3), (257, 4)])
def test_suffix_array_matches_naive(n, seed):
    rng = np.random.default_rng(seed)
    s = np.concatenate([rng.integers(1, 5, size=n), [0]])
    np.testing.assert_array_equal(suffix_array(s), naive_sa(s))


def test_bwt_invariants():
    genome = random_genome(500, seed=7)
    idx = GoldenFMIndex(genome)
    # BWT has exactly one '$' (symbol 0) and n == len(T)+1
    assert idx.n == len(genome) + 1
    assert int(np.sum(idx.bwt == 0)) == 1
    # LF-walk from the '$' row reconstructs the text in reverse
    codes = dna.encode(genome)
    r = 0  # row 0 is the '$' suffix; BWT[0] = last char of T
    rebuilt = []
    for _ in range(len(genome)):
        rebuilt.append(int(idx.bwt[r]) - 1)
        r = idx.lf(r)
    np.testing.assert_array_equal(np.array(rebuilt[::-1]), codes)


@pytest.mark.parametrize("plen", [3, 5, 8])
def test_exact_search_equals_bruteforce_all_substrings(plen):
    genome = random_genome(300, seed=11)
    idx = GoldenFMIndex(genome)
    g = dna.encode(genome)
    for start in range(0, len(genome) - plen + 1):
        pat = g[start : start + plen]
        sp, ep = idx.backward_search(pat)
        got = idx.locate_range(sp, ep)
        expected = [
            p
            for p in range(len(genome) - plen + 1)
            if np.array_equal(g[p : p + plen], pat)
        ]
        assert got == expected, f"mismatch at start={start}"


def test_exact_search_absent_pattern():
    genome = "ACGT" * 50
    idx = GoldenFMIndex(genome)
    sp, ep = idx.backward_search(dna.encode("ACGTT"))
    assert sp >= ep


@pytest.mark.parametrize("k", [0, 1, 2])
def test_align_read_equals_bruteforce(k, rng):
    genome = random_genome(800, seed=13)
    idx = GoldenFMIndex(genome)
    g = dna.encode(genome)
    for trial in range(25):
        L = int(rng.integers(10, 40))
        pos = int(rng.integers(0, len(genome) - L + 1))
        window = g[pos : pos + L].copy()
        nmut = int(rng.integers(0, k + 1))
        for p in rng.choice(L, size=nmut, replace=False):
            window[p] = (window[p] + int(rng.integers(1, 4))) % 4
        seq = dna.decode(window)
        if rng.random() < 0.5:
            seq = dna.revcomp_str(seq)
        got = idx.align_read(seq, k=k)
        expected = brute_force_align(genome, seq, k=k)
        assert got == expected


def test_align_read_with_N(rng):
    genome = random_genome(600, seed=17)
    idx = GoldenFMIndex(genome)
    g = dna.encode(genome)
    for trial in range(10):
        L = 20
        pos = int(rng.integers(0, len(genome) - L + 1))
        seq = list(dna.decode(g[pos : pos + L]))
        seq[int(rng.integers(0, L))] = "N"
        seq = "".join(seq)
        # k=0: N never matches, so exact search must find nothing
        assert idx.align_read(seq, k=0) == []
        # k=1: the N costs exactly one mismatch
        got = idx.align_read(seq, k=1)
        expected = brute_force_align(genome, seq, k=1)
        assert got == expected
        assert any(h.pos == pos and h.strand == "+" and h.nm == 1 for h in got)


def test_genome_with_N_sanitized():
    # pinned convention: genome N -> A
    idx_n = GoldenFMIndex("ACGTNNACGT")
    idx_a = GoldenFMIndex("ACGTAAACGT")
    np.testing.assert_array_equal(idx_n.bwt, idx_a.bwt)
