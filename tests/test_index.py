"""Index-builder tests: lattice layout vs golden tables (SURVEY.md §4.2)."""

import numpy as np
import pytest

from bwtpu import dna, sais
from bwtpu.config import EngineConfig
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import (BLOCK, build_fm_index, build_sharded_index, host_occ,
                         host_sa_lookup, load_index, pack_2bit, pack_bits,
                         plan_shards, save_index)
from bwtpu.simulate import random_genome


def test_pack_2bit_roundtrip(rng):
    codes = rng.integers(0, 4, size=1000).astype(np.uint8)
    words = pack_2bit(codes).view(np.uint32)
    got = np.array(
        [(int(words[p // 16]) >> (2 * (p % 16))) & 3 for p in range(1000)]
    )
    np.testing.assert_array_equal(got, codes)


def test_pack_bits_roundtrip(rng):
    bits = rng.random(500) < 0.3
    words = pack_bits(bits).view(np.uint32)
    got = np.array([(int(words[p // 32]) >> (p % 32)) & 1 for p in range(500)])
    np.testing.assert_array_equal(got, bits.astype(np.int64))


@pytest.mark.parametrize("n", [5, 127, 128, 129, 300, 1000])
def test_lattice_occ_matches_golden(n):
    genome = random_genome(n, seed=n)
    golden = GoldenFMIndex(genome)
    idx = build_fm_index(genome)
    assert idx.n == golden.n
    # C table: symbol space
    np.testing.assert_array_equal(idx.C[:5], golden.C[:5])
    # Occ at every (c, i): lattice query == golden prefix table
    rng = np.random.default_rng(n)
    positions = np.unique(
        np.concatenate(
            [
                np.arange(min(idx.n + 1, 140)),
                rng.integers(0, idx.n + 1, size=50),
                [idx.n, idx.dollar_row, idx.dollar_row + 1],
            ]
        )
    )
    for i in positions:
        for c in range(4):
            assert host_occ(idx, c, int(i)) == int(golden.occ[c + 1][i]), (
                f"Occ({c},{i}) n={n}"
            )


def test_lattice_sa_sampling_matches_golden():
    genome = random_genome(700, seed=99)
    golden = GoldenFMIndex(genome)
    cfg = EngineConfig(sa_rate=16)
    idx = build_fm_index(genome, cfg)
    for r in range(idx.n):
        marked, rank = host_sa_lookup(idx, r)
        assert marked == (int(golden.sa[r]) % 16 == 0)
        if marked:
            assert int(idx.ssa[rank]) == int(golden.sa[r])


def test_backward_search_via_lattice_equals_golden():
    genome = random_genome(600, seed=5)
    golden = GoldenFMIndex(genome)
    idx = build_fm_index(genome)
    rng = np.random.default_rng(6)
    for _ in range(30):
        L = int(rng.integers(4, 25))
        start = int(rng.integers(0, len(genome) - L))
        pat = dna.encode(genome)[start : start + L]
        sp, ep = 0, idx.n
        for i in range(L - 1, -1, -1):
            c = int(pat[i])
            sp = int(idx.C[c + 1]) + host_occ(idx, c, sp)
            ep = int(idx.C[c + 1]) + host_occ(idx, c, ep)
        assert (sp, ep) == golden.backward_search(pat)


def test_native_and_fallback_sa_agree(rng):
    for n in [50, 1000]:
        s = np.concatenate([rng.integers(1, 5, size=n), [0]]).astype(np.uint8)
        a = sais.suffix_array(s)
        b = sais.suffix_array(s, force_fallback=True)
        np.testing.assert_array_equal(a, b)


def test_save_load_roundtrip(tmp_path):
    genome = random_genome(2000, seed=1)
    shards, manifest = build_sharded_index(genome, n_shards=2, overlap=64)
    save_index(str(tmp_path / "idx"), shards, manifest)
    shards2, manifest2 = load_index(str(tmp_path / "idx"))
    assert manifest2.starts == manifest.starts
    assert manifest2.lengths == manifest.lengths
    for a, b in zip(shards, shards2):
        np.testing.assert_array_equal(a.search_lattice, b.search_lattice)
        np.testing.assert_array_equal(a.ssa, b.ssa)
        np.testing.assert_array_equal(a.text_packed, b.text_packed)
        assert a.dollar_row == b.dollar_row
        assert a.shard_offset == b.shard_offset


def test_plan_shards_overlap_covers_reads():
    m = plan_shards(10_000, 4, overlap=128)
    assert m.starts[0] == 0
    assert m.starts[-1] + m.lengths[-1] == 10_000
    # every 100-base window is fully inside some shard
    for p in range(0, 10_000 - 100):
        assert any(
            s <= p and p + 100 <= s + l for s, l in zip(m.starts, m.lengths)
        ), p


def test_sharded_search_union_equals_whole():
    genome = random_genome(3000, seed=77)
    golden = GoldenFMIndex(genome)
    shards, manifest = build_sharded_index(genome, n_shards=3, overlap=64)
    g = dna.encode(genome)
    rng = np.random.default_rng(8)
    for _ in range(20):
        L = 40
        start = int(rng.integers(0, len(genome) - L))
        pat = g[start : start + L]
        # union of per-shard hits (global coords, deduped)
        hits = set()
        for sh in shards:
            gs = GoldenFMIndex(genome[sh.shard_offset : sh.shard_offset + sh.text_len])
            sp, ep = gs.backward_search(pat)
            for p in gs.locate_range(sp, ep):
                hits.add(sh.shard_offset + p)
        sp, ep = golden.backward_search(pat)
        assert hits == set(golden.locate_range(sp, ep))


def test_native_lattice_builder_matches_numpy():
    """csrc/pack.cc fused one-pass assembly (bwtpu_build_shard +
    bwtpu_key_hist) == NumPy reference, bit for bit — every output:
    search lattice, ssa, packed text, C, dollar row, the full k-mer
    table ladder (histogram prefix sums vs searchsorted) and the
    multi-step Occ lattice with its invalid rows."""
    from bwtpu import sais as _sais

    if not _sais.native_available():
        pytest.skip("native library unavailable")
    for n, seed, rate, d in (
        (1000, 1, 8, None), (4097, 2, 8, 6), (128 * 3, 3, 8, 4),
        (777, 4, 1, 5), (50, 5, 2, None),
    ):
        genome = random_genome(n, seed=seed)
        cfg = EngineConfig(sa_rate=rate, kmer_d=d)
        a = build_fm_index(genome, cfg)
        b = build_fm_index(genome, cfg, force_numpy=True)
        np.testing.assert_array_equal(a.search_lattice, b.search_lattice)
        np.testing.assert_array_equal(a.ssa, b.ssa)
        np.testing.assert_array_equal(a.text_packed, b.text_packed)
        np.testing.assert_array_equal(a.mark_rank_ck, b.mark_rank_ck)
        np.testing.assert_array_equal(a.C, b.C)
        assert a.dollar_row == b.dollar_row
        assert sorted(a.kmer_tables) == sorted(b.kmer_tables)
        for dd in a.kmer_tables:
            np.testing.assert_array_equal(a.kmer_tables[dd], b.kmer_tables[dd])
        assert (a.occk_lattice is None) == (b.occk_lattice is None)
        if a.occk_lattice is not None:
            np.testing.assert_array_equal(a.occk_lattice, b.occk_lattice)
            np.testing.assert_array_equal(a.occk_invalid, b.occk_invalid)


def test_sharded_build_streaming_paths_agree():
    """build_sharded_index streams memmap slices to workers; string
    input, pre-encoded codes input, jobs=1 and jobs=2 must all produce
    identical shards."""
    from bwtpu import dna

    genome = random_genome(60_000, seed=11)
    cfg = EngineConfig(sa_rate=4)
    base, m1 = build_sharded_index(genome, 3, cfg, jobs=1)
    codes = dna.encode(dna.sanitize_genome(genome))
    for shards, _m in (
        build_sharded_index(genome, 3, cfg, jobs=2),
        build_sharded_index(codes, 3, cfg, jobs=1),
    ):
        for a, b in zip(base, shards):
            np.testing.assert_array_equal(a.search_lattice, b.search_lattice)
            np.testing.assert_array_equal(a.occk_lattice, b.occk_lattice)
            assert a.shard_offset == b.shard_offset
