"""Pallas fused kernels vs jnp twins: bit-identical outputs required
(SURVEY.md §4.2.5). Run in interpret mode on the CPU mesh; the same
kernels compile for real on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import Engine, upload_index
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index
from bwtpu.kernels.locate import locate_rows
from bwtpu.kernels.search2 import backward_search_ra
from bwtpu.kernels.verify2 import pack_reads, verify_packed
from bwtpu.simulate import random_genome, simulate_reads

CFG = EngineConfig(sa_rate=8, max_hits=16, max_cand=16, read_len=60)


@pytest.fixture(scope="module")
def world():
    genome = random_genome(3000, seed=91)
    idx = build_fm_index(genome, CFG)
    dev = upload_index([idx])
    shard = jax.tree.map(lambda x: x[0], dev.shard)
    return genome, idx, shard


def _batch(genome, n=48, L=60, seed=1):
    from bwtpu.engine import encode_batch
    from bwtpu.io import Read

    reads, _ = simulate_reads(genome, n, read_len=L, max_mismatches=2, seed=seed)
    reads[0] = Read("n", "N" * L)  # degenerate lane
    enc, _ = encode_batch(CFG, reads, k=2)
    return enc


@pytest.mark.parametrize("d", [0, 4, "max"])
def test_search_step_pallas_matches_jnp(world, d):
    genome, idx, shard = world
    if d == "max":
        d = max(shard.kmer_tables)
    enc = _batch(genome)
    kt = shard.kmer_tables[d] if d > 0 else jnp.zeros((1, 2), jnp.int32)
    args = (shard.lattice, shard.C, shard.dollar_row, shard.n, kt,
            jnp.asarray(enc.ra_codes), jnp.asarray(enc.ra_amb),
            jnp.asarray(enc.lens))
    sp_j, ep_j, _ = backward_search_ra(*args, d, backend="jnp")
    sp_p, ep_p, _ = backward_search_ra(*args, d, backend="pallas")
    np.testing.assert_array_equal(np.asarray(sp_j), np.asarray(sp_p))
    np.testing.assert_array_equal(np.asarray(ep_j), np.asarray(ep_p))


def test_locate_step_pallas_matches_jnp(world):
    genome, idx, shard = world
    rng = np.random.default_rng(7)
    rows = rng.integers(0, idx.n, size=500).astype(np.int32)
    valid = rng.random(500) < 0.9
    args = (shard.lattice, shard.ssa, shard.C,
            shard.dollar_row, jnp.asarray(rows), jnp.asarray(valid))
    pj = locate_rows(*args, CFG.sa_rate, backend="jnp")
    pp = locate_rows(*args, CFG.sa_rate, backend="pallas")
    np.testing.assert_array_equal(np.asarray(pj), np.asarray(pp))


def test_verify_pallas_matches_jnp(world):
    genome, idx, shard = world
    enc = _batch(genome)
    rng = np.random.default_rng(9)
    Cc = enc.read_words.shape[0]
    cand = rng.integers(-10, idx.text_len + 10, size=Cc).astype(np.int32)
    cvalid = rng.random(Cc) < 0.85
    args = (shard.text_rows, shard.text_len, jnp.asarray(cand),
            jnp.asarray(cvalid), jnp.asarray(enc.read_words),
            jnp.asarray(enc.amb_bits), jnp.asarray(enc.len_mask),
            jnp.asarray(enc.lens))
    nj = jax.jit(verify_packed, static_argnames="backend")(*args, backend="jnp")
    npp = jax.jit(verify_packed, static_argnames="backend")(*args, backend="pallas")
    np.testing.assert_array_equal(np.asarray(nj), np.asarray(npp))


@pytest.mark.parametrize("k", [0, 2])
def test_engine_pallas_backend_parity(world, k):
    genome, idx, shard = world
    golden = GoldenFMIndex(genome)
    eng = Engine([idx], backend="pallas")
    reads, _ = simulate_reads(genome, 20, read_len=40, max_mismatches=k, seed=13)
    got = eng.align_batch(reads, k=k)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=k), r.rid
