"""Device-kernel (jnp twin) unit tests against the golden model."""

import jax.numpy as jnp
import numpy as np
import pytest

from bwtpu import dna
from bwtpu.config import EngineConfig
from bwtpu.engine import upload_index
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index
from bwtpu.kernels import common
from bwtpu.kernels.locate import locate_rows
from bwtpu.kernels.search import backward_search, interval_rows
from bwtpu.kernels.verify import NM_INVALID, dedupe_sorted, verify_candidates
from bwtpu.simulate import random_genome


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(2000, seed=21)
    golden = GoldenFMIndex(genome)
    idx = build_fm_index(genome, EngineConfig(sa_rate=8))
    dev = upload_index([idx]).shard
    return genome, golden, idx, dev


def test_popcount32():
    x = np.array([0, 1, 0xFFFFFFFF, 0x80000000, 0x12345678], dtype=np.uint32)
    got = np.asarray(common.popcount32(jnp.asarray(x.view(np.int32))))
    expected = [bin(v).count("1") for v in x]
    np.testing.assert_array_equal(got, expected)


def test_occ_batched_matches_golden(setup):
    genome, golden, idx, dev = setup
    rng = np.random.default_rng(0)
    i = rng.integers(0, idx.n + 1, size=500).astype(np.int32)
    c = rng.integers(0, 4, size=500).astype(np.int32)
    got = np.asarray(
        common.occ(dev.lattice[0], dev.dollar_row[0], jnp.asarray(c), jnp.asarray(i))
    )
    expected = np.array([golden.occ[cc + 1][ii] for cc, ii in zip(c, i)])
    np.testing.assert_array_equal(got, expected)


def test_backward_search_matches_golden(setup):
    genome, golden, idx, dev = setup
    rng = np.random.default_rng(1)
    B, L = 64, 30
    codes = np.zeros((B, L), dtype=np.int32)
    amb = np.zeros((B, L), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    g = dna.encode(genome)
    for b in range(B):
        ln = int(rng.integers(5, L + 1))
        start = int(rng.integers(0, len(genome) - ln))
        pat = g[start : start + ln].copy()
        if b % 4 == 0:  # mutate — often absent
            pat[rng.integers(0, ln)] = rng.integers(0, 4)
        if b % 7 == 0:  # ambiguous base -> must return empty
            amb[b, rng.integers(0, ln)] = 1
        codes[b, :ln] = pat
        lens[b] = ln
    sp, ep = backward_search(
        dev.lattice[0], dev.C[0], dev.dollar_row[0], dev.n[0],
        jnp.asarray(codes), jnp.asarray(amb), jnp.asarray(lens),
    )
    sp, ep = np.asarray(sp), np.asarray(ep)
    for b in range(B):
        gsp, gep = golden.backward_search(
            codes[b, : lens[b]], amb[b, : lens[b]].astype(bool)
        )
        width = max(0, gep - gsp)
        assert max(0, ep[b] - sp[b]) == width, b
        if width:
            assert (sp[b], ep[b]) == (gsp, gep), b


def test_locate_rows_matches_golden(setup):
    genome, golden, idx, dev = setup
    rng = np.random.default_rng(2)
    rows = rng.integers(0, idx.n, size=300).astype(np.int32)
    valid = rng.random(300) < 0.9
    got = np.asarray(
        locate_rows(
            dev.lattice[0], dev.ssa[0], dev.C[0],
            dev.dollar_row[0], jnp.asarray(rows), jnp.asarray(valid),
            sa_rate=8,
        )
    )
    for r, v, p in zip(rows, valid, got):
        assert p == (int(golden.sa[r]) if v else -1)


def test_interval_rows_overflow():
    sp = jnp.asarray(np.array([5, 0], dtype=np.int32))
    ep = jnp.asarray(np.array([12, 0], dtype=np.int32))
    rows, valid, overflow = interval_rows(sp, ep, max_hits=4)
    np.testing.assert_array_equal(np.asarray(rows)[0], [5, 6, 7, 8])
    np.testing.assert_array_equal(np.asarray(valid)[0], [True] * 4)
    np.testing.assert_array_equal(np.asarray(valid)[1], [False] * 4)
    np.testing.assert_array_equal(np.asarray(overflow), [3, 0])


def test_verify_candidates_matches_hamming(setup):
    genome, golden, idx, dev = setup
    rng = np.random.default_rng(3)
    g = dna.encode(genome)
    B, Cm, L = 16, 8, 40
    codes = np.zeros((B, L), dtype=np.int32)
    amb = np.zeros((B, L), dtype=np.int32)
    lens = np.full(B, L, dtype=np.int32)
    cand = rng.integers(-5, len(genome), size=(B, Cm)).astype(np.int32)
    cvalid = rng.random((B, Cm)) < 0.8
    for b in range(B):
        start = int(rng.integers(0, len(genome) - L))
        codes[b] = g[start : start + L]
        if b % 3 == 0:
            amb[b, rng.integers(0, L)] = 1
        cand[b, 0] = start  # one known-good candidate
    nm = np.asarray(
        verify_candidates(
            jnp.asarray(idx.text_packed), dev.text_len[0], jnp.asarray(cand),
            jnp.asarray(cvalid), jnp.asarray(codes), jnp.asarray(amb),
            jnp.asarray(lens),
        )
    )
    for b in range(B):
        for ci in range(Cm):
            p = int(cand[b, ci])
            if not cvalid[b, ci] or p < 0 or p + L > len(genome):
                assert nm[b, ci] == NM_INVALID
            else:
                expected = int(
                    np.sum((g[p : p + L] != codes[b]) | amb[b].astype(bool))
                )
                assert nm[b, ci] == expected


def test_dedupe_sorted():
    cand = jnp.asarray(np.array([[5, 3, 5, 9, 3], [1, 1, 1, 1, 1]], dtype=np.int32))
    valid = jnp.asarray(
        np.array([[1, 1, 1, 1, 0], [1, 1, 0, 1, 1]], dtype=bool)
    )
    c, v = dedupe_sorted(cand, valid)
    c, v = np.asarray(c), np.asarray(v)
    assert list(c[0][v[0]]) == [3, 5, 9]
    assert list(c[1][v[1]]) == [1]


def test_reverse_complement_reads():
    codes = jnp.asarray(np.array([[0, 1, 2, 3, 0, 0]], dtype=np.int32))  # ACGT--
    amb = jnp.asarray(np.array([[0, 1, 0, 0, 0, 0]], dtype=np.int32))
    lens = jnp.asarray(np.array([4], dtype=np.int32))
    rc, ra = common.reverse_complement_reads(codes, amb, lens)
    # revcomp(ACGT) = ACGT; mask moves from index 1 to index 2
    np.testing.assert_array_equal(np.asarray(rc)[0], [0, 1, 2, 3, 0, 0])
    np.testing.assert_array_equal(np.asarray(ra)[0], [0, 0, 1, 0, 0, 0])


def test_packed_prep_matches_unpacked():
    """kernels/prep.py SWAR extractions == the code-plane derivations
    they replace (revcomp, k-mer key, s-mer codes, unpack_slice)."""
    from bwtpu.engine import device_prep_packed, device_prep_uniform
    from bwtpu.kernels import prep
    from bwtpu.kernels.searchk import _smer_codes
    from bwtpu.kernels.verify2 import pack_reads

    rng = np.random.default_rng(7)
    B, L = 48, 100
    codes = rng.integers(0, 4, (B, L)).astype(np.int32)
    amb = (rng.random((B, L)) < 0.05).astype(np.int32)
    rw, ab, _ = pack_reads(codes, amb, np.full(B, L, np.int32))
    rw, ab = jnp.asarray(rw), jnp.asarray(ab)

    # full both-strand prep equality against device_prep_uniform
    _, _, lens_u, rw2_u, ab2_u, lm2_u, _ = device_prep_uniform(rw, ab, L, 0)
    rw2_p, ab2_p, lens_p, lm2_p = device_prep_packed(rw, ab, L)
    np.testing.assert_array_equal(np.asarray(rw2_p), np.asarray(rw2_u))
    np.testing.assert_array_equal(np.asarray(ab2_p), np.asarray(ab2_u))
    np.testing.assert_array_equal(np.asarray(lm2_p), np.asarray(lm2_u))
    np.testing.assert_array_equal(np.asarray(lens_p), np.asarray(lens_u))

    # k-mer key at offset 0 and at a seed offset
    cj, aj = jnp.asarray(codes), jnp.asarray(amb)
    for off, slen, d in ((0, L, 11), (34, 33, 9)):
        w = (4 ** np.arange(d - 1, -1, -1)).astype(np.int64)
        key_ref = (codes[:, off + slen - d : off + slen] * w[None, :]).sum(1)
        key, amb_tail = prep.kmer_key_packed(rw, ab, off, slen, d)
        np.testing.assert_array_equal(np.asarray(key), key_ref)
        np.testing.assert_array_equal(
            np.asarray(amb_tail),
            amb[:, off + slen - d : off + slen].sum(1) > 0,
        )
        for step in (3, 4):
            chain = slen - d
            p, T = chain % step, chain // step
            if T == 0:
                continue
            t_ref, a_ref = _smer_codes(
                cj[:, off + p :], aj[:, off + p :], B, T, step
            )
            t_got, a_got = prep.smer_codes_packed(rw, ab, off + p, T, step)
            np.testing.assert_array_equal(np.asarray(t_got), np.asarray(t_ref))
            np.testing.assert_array_equal(np.asarray(a_got), np.asarray(a_ref))

    np.testing.assert_array_equal(
        np.asarray(prep.unpack_slice(rw, 17, 41)), codes[:, 17:58]
    )


def test_search_early_stop_packed_matches_uniform(setup):
    """search_early_stop_packed == search_early_stop_uniform bit-exactly
    (sp, ep, rem, overflow), whole reads and seed subfields."""
    from bwtpu.config import EngineConfig
    from bwtpu.engine import device_prep_packed, device_prep_uniform
    from bwtpu.index import build_fm_index
    from bwtpu.kernels.searchk import (search_early_stop_packed,
                                       search_early_stop_uniform)
    from bwtpu.kernels.verify2 import pack_reads
    from bwtpu.simulate import random_genome, simulate_reads

    L, d = 64, 6
    cfg = EngineConfig(sa_rate=1, max_hits=4, read_len=L, kmer_d=d)
    genome = random_genome(30_000, seed=3)
    idx = build_fm_index(genome, cfg)
    from bwtpu.engine import upload_index
    import jax

    dev = upload_index([idx])
    sh = jax.tree.map(lambda x: x[0], dev.shard)
    reads, _ = simulate_reads(genome, 96, read_len=L, max_mismatches=2,
                              seed=4)
    codes = np.stack([np.frombuffer(bytes(r.seq, "ascii"), np.uint8)
                      for r in reads])
    from bwtpu import dna
    c2, m2 = dna.encode_with_mask("".join(r.seq for r in reads))
    codes = c2.reshape(96, L).astype(np.int32)
    amb = m2.reshape(96, L).astype(np.int32)
    rw, ab, _ = pack_reads(codes, amb, np.full(96, L, np.int32))
    rw, ab = jnp.asarray(rw), jnp.asarray(ab)

    codes2, amb2, *_ = device_prep_uniform(rw, ab, L, 0)
    rw2, ab2, *_ = device_prep_packed(rw, ab, L)
    step = cfg.occ_step
    for off, slen in ((0, L), (21, 22)):
        ref = search_early_stop_uniform(
            sh.lattice, sh.latk, sh.latk_inv, sh.C, sh.dollar_row,
            sh.kmer_tables[d], codes2[:, off : off + slen],
            amb2[:, off : off + slen], slen, d, step, cfg.max_hits)
        got = search_early_stop_packed(
            sh.lattice, sh.latk, sh.latk_inv, sh.C, sh.dollar_row,
            sh.kmer_tables[d], rw2, ab2, off, slen, d, step, cfg.max_hits)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_compact_counts_matches_generic():
    """compact_counts must be bit-identical to compact() on the prefix
    masks interval_rows produces (sel, count AND overflow), across empty
    lanes, straddling-capacity lanes, all-empty input and overflow."""
    from bwtpu.kernels.compact import compact, compact_counts

    rng = np.random.default_rng(7)
    for H, nlanes, cap in [(4, 64, 32), (8, 128, 1024), (3, 200, 100),
                           (16, 33, 64), (5, 50, 4)]:
        for trial in range(4):
            counts = rng.integers(-2, H + 3, size=nlanes).astype(np.int32)
            if trial == 2:
                counts[:] = 0  # all-empty
            if trial == 3:
                counts[: nlanes // 2] = 0  # long empty prefix
            valid = (np.arange(H)[None, :]
                     < np.clip(counts, 0, H)[:, None]).reshape(-1)
            sel_g, cnt_g, ov_g = compact(jnp.asarray(valid), cap)
            sel_s, cnt_s, ov_s, dr_s = compact_counts(jnp.asarray(counts), H, cap)
            np.testing.assert_array_equal(np.asarray(sel_s), np.asarray(sel_g))
            assert int(cnt_s) == int(cnt_g)
            assert int(ov_s) == int(ov_g)
            # dropped = lanes with live slots that did not all fit
            c = np.clip(counts, 0, H)
            cum = np.cumsum(c) - c
            exp_drop = (c > 0) & (cum + c > cap)
            np.testing.assert_array_equal(np.asarray(dr_s), exp_drop)
