"""Fused locate+verify row table (kernels/verify2.build_locv_rows):
one gather = SA position + verify window. Parity is pinned at three
levels: kernel vs kernel, pipeline locv-on vs locv-off, engine vs
golden on a sa_rate=1 index (the bench/e2e flagship config)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bwtpu.config import EngineConfig
from bwtpu.engine import (Engine, exact_pipeline_packed,
                          inexact_pipeline_packed, pack_reads_for_bench,
                          pick_kmer_depth, upload_index)
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index
from bwtpu.kernels.verify2 import (build_locv_rows, build_text_rows,
                                   locv_row_width, pack_reads,
                                   verify_packed, verify_packed_locv)
from bwtpu.simulate import random_genome, simulate_reads


def test_verify_locv_matches_verify_packed(rng):
    genome = random_genome(4000, seed=5)
    from bwtpu import dna

    text_codes = dna.encode(genome)
    from bwtpu.index import pack_2bit

    text_packed = pack_2bit(text_codes)
    L = 50
    n = len(genome) + 1
    # fake "SA": arbitrary positions 0..text_len (covers clip edges)
    ssa_full = rng.integers(0, len(genome) + 1, size=n).astype(np.int32)
    locv = build_locv_rows(text_packed, ssa_full, L)
    assert locv.shape == (n, locv_row_width(L))
    text_rows = build_text_rows(text_packed, L)

    B = 256
    reads, _ = simulate_reads(genome, B, read_len=L, max_mismatches=2, seed=6)
    codes = np.stack([dna.encode(r.seq) for r in reads]).astype(np.int32)
    amb = np.zeros_like(codes)
    rw, ab, lm = pack_reads(codes, amb, np.full(B, L, np.int32))
    rows = rng.integers(0, n, size=B).astype(np.int32)
    rem = rng.integers(0, L, size=B).astype(np.int32)
    rec = jnp.take(jnp.asarray(locv), jnp.asarray(rows), axis=0)
    spos = rec[:, 0]
    cand = spos - jnp.asarray(rem)
    cvalid = jnp.asarray(rng.random(B) < 0.9)
    lens = jnp.full(B, L, jnp.int32)
    nm_ref = verify_packed(
        jnp.asarray(text_rows), jnp.int32(len(genome)), cand,
        cvalid, jnp.asarray(rw), jnp.asarray(ab), jnp.asarray(lm), lens,
    )
    nm_locv = verify_packed_locv(
        rec, jnp.int32(len(genome)), cand, cvalid,
        jnp.asarray(rw), jnp.asarray(ab), jnp.asarray(lm), lens,
    )
    np.testing.assert_array_equal(np.asarray(nm_locv), np.asarray(nm_ref))


def test_pipeline_locv_on_off_identical():
    genome = random_genome(30_000, seed=7)
    L = 60
    cfg = EngineConfig(sa_rate=1, max_hits=4, max_cand=8, read_len=L)
    idx = build_fm_index(genome, cfg)
    dev_on = upload_index([idx], locv=True)
    dev_off = upload_index([idx], locv=False)
    assert dev_on.shard.locv.shape[-1] == locv_row_width(L)
    assert dev_off.shard.locv.shape[-1] == 1
    d = pick_kmer_depth(sorted(idx.kmer_tables), L)
    d_seed = pick_kmer_depth(sorted(idx.kmer_tables), L // 3)
    reads, _ = simulate_reads(genome, 512, read_len=L, max_mismatches=2,
                              seed=8)
    rw, ab = pack_reads_for_bench(reads)

    fx = functools.partial(
        exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
        sa_rate=1, loc_factor=1, compact_output=True)
    fi = functools.partial(
        inexact_pipeline_packed, L=L, k=2, d=d_seed, max_loc=cfg.max_cand,
        sa_rate=1, loc_factor=cfg.loc_factor, compact_output=True)
    for f in (fx, fi):
        a = jax.jit(f)(jax.tree.map(lambda x: x[0], dev_on.shard), rw, ab)
        b = jax.jit(f)(jax.tree.map(lambda x: x[0], dev_off.shard), rw, ab)
        cnt = int(a[3])
        assert cnt == int(b[3])
        for i in (0, 1, 2):  # cand, nm, sel (live prefix)
            np.testing.assert_array_equal(
                np.asarray(a[i])[:cnt], np.asarray(b[i])[:cnt]
            )


def test_engine_sa_rate_1_matches_golden():
    genome = random_genome(20_000, seed=9)
    cfg = EngineConfig(sa_rate=1, max_hits=8, max_cand=8, read_len=50)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    assert eng.dev.shard.locv.shape[-1] > 1  # auto-on at sa_rate=1
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 64, read_len=50, max_mismatches=2,
                              seed=10)
    for k in (0, 2):
        got = eng.align_batch(reads, k=k)
        exp = [golden.align_read(r.seq, k=k) for r in reads]
        assert [sorted(h) for h in got] == [sorted(h) for h in exp]
