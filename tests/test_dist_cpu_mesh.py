"""Distributed ring-rotation tests on the 8-virtual-device CPU mesh
(BASELINE configs 4-5 semantics; SURVEY.md §4.2.4)."""

import jax
import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.dist import DistEngine, make_mesh
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_sharded_index
from bwtpu.io import Contig
from bwtpu.sam import pair_and_emit_sam
from bwtpu.simulate import random_genome, simulate_pairs, simulate_reads

CFG = EngineConfig(sa_rate=8, max_hits=16, max_cand=16, read_len=50)


@pytest.fixture(scope="module")
def world8():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    genome = random_genome(8000, seed=71)
    golden = GoldenFMIndex(genome)
    return genome, golden


def test_make_mesh_shapes():
    m = make_mesh(4, 2)
    assert m.shape == {"shard": 4, "data": 2}
    with pytest.raises(ValueError):
        make_mesh(4, 3)


@pytest.mark.parametrize("n_shard,n_data", [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_ring_exact_parity(world8, n_shard, n_data):
    genome, golden = world8
    shards, manifest = build_sharded_index(genome, n_shard, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=n_data)
    reads, _ = simulate_reads(genome, 24, read_len=40, seed=72)
    got = eng.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0), r.rid


def test_ring_inexact_parity(world8):
    genome, golden = world8
    shards, manifest = build_sharded_index(genome, 4, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=2)
    reads, _ = simulate_reads(genome, 20, read_len=40, max_mismatches=2, seed=73)
    got = eng.align_batch(reads, k=2)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=2), r.rid


def test_ring_handles_boundary_reads(world8):
    """Reads straddling shard boundaries must be found via overlaps."""
    genome, golden = world8
    shards, manifest = build_sharded_index(genome, 4, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=2)
    from bwtpu.io import Read

    # reads centered exactly on each internal shard boundary
    reads = []
    for s in manifest.starts[1:]:
        reads.append(Read(f"b{s}", genome[s - 20 : s + 20]))
    got = eng.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        expected = golden.align_read(r.seq, k=0)
        assert hits == expected, r.rid
        assert len(hits) >= 1


def test_paired_end_distributed(world8):
    """Config 5 semantics: paired-end alignment through the dist engine."""
    genome, golden = world8
    contigs = [Contig("chrD", 0, len(genome))]
    shards, manifest = build_sharded_index(
        genome, 4, config=CFG, contigs=contigs, overlap=64
    )
    manifest.contigs = contigs
    eng = DistEngine(shards, manifest, n_data=2)
    pairs, truth = simulate_pairs(genome, 12, read_len=40, insert_mean=200,
                                  insert_sd=10, max_mismatches=1, seed=74)
    h1 = eng.align_batch([p[0] for p in pairs], k=1)
    h2 = eng.align_batch([p[1] for p in pairs], k=1)
    import io as pyio

    buf = pyio.StringIO()
    pair_and_emit_sam(pairs, h1, h2, contigs, buf, min_insert=80, max_insert=400)
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(lines) == 24
    proper = sum(1 for l in lines if int(l.split("\t")[1]) & 0x2)
    assert proper == 24  # all pairs proper at this scale
    for i, t in enumerate(truth):
        ps = sorted([int(lines[2 * i].split("\t")[3]) - 1,
                     int(lines[2 * i + 1].split("\t")[3]) - 1])
        assert ps == sorted([t["pos1"], t["pos2"]])


def test_debug_checks_path(world8):
    """The psum shape-checksum debug mode must not change results."""
    genome, golden = world8
    shards, manifest = build_sharded_index(genome, 2, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=2, debug_checks=True)
    reads, _ = simulate_reads(genome, 8, read_len=40, seed=75)
    got = eng.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0)


def test_ring_ragged_lengths_parity(world8):
    """Mixed-length batches take the ragged (encode_batch) ring path;
    uniform batches take the packed ring — both must agree with golden."""
    from bwtpu.io import Read

    genome, golden = world8
    shards, manifest = build_sharded_index(genome, 4, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=2)
    rng = np.random.default_rng(76)
    reads = []
    for i, ln in enumerate(rng.integers(25, 50, 16)):
        s = int(rng.integers(0, len(genome) - int(ln)))
        reads.append(Read(f"v{i}", genome[s : s + int(ln)]))
    for k in (0, 2):
        got = eng.align_batch(reads, k=k)
        for r, hits in zip(reads, got):
            assert hits == golden.align_read(r.seq, k=k), (k, r.rid)


@pytest.mark.parametrize("n_shard", [2, 4, 8])
def test_compact_ring_is_dispatched(world8, n_shard):
    """The flagship compact ring must actually be the program that runs
    for uniform packed batches (VERDICT r2 next #2/#10: mode asserted,
    not just output parity), at S in {2, 4, 8}."""
    genome, golden = world8
    shards, manifest = build_sharded_index(
        genome, n_shard, config=CFG, overlap=64
    )
    eng = DistEngine(shards, manifest, n_data=8 // n_shard)
    reads, _ = simulate_reads(genome, 16, read_len=40, max_mismatches=2,
                              seed=77)
    for k in (0, 2):
        handle = eng.dispatch_batch(reads, k=k)
        assert handle[0] == "packed_compact", (n_shard, k)
        got = eng.finish_batch(handle)
        for r, hits in zip(reads, got):
            assert hits == golden.align_read(r.seq, k=k), (n_shard, k, r.rid)


def test_ragged_falls_back_to_dense_ring(world8):
    from bwtpu.io import Read

    genome, _ = world8
    shards, manifest = build_sharded_index(genome, 2, config=CFG, overlap=64)
    eng = DistEngine(shards, manifest, n_data=2)
    reads = [Read("a", genome[10:40]), Read("b", genome[50:90])]
    handle = eng.dispatch_batch(reads, k=0)
    assert handle[0] == "ragged"
    eng.finish_batch(handle)
