"""BASELINE.json configs 1-5 — explicit tier map (SURVEY.md §4.2.3).

Each driver benchmark config has a CPU-mesh functional twin here (the
perf side runs in bench.py on the real chip):

1. exact backward search, replicated index, 1 chip
2. inexact <= 2 mismatches on the same read set
3. locate + SAM emission, full output equality
4. sharded index, data-parallel streaming, hit merge
5. multi-host-shaped paired-end scaling run (ring over the CPU mesh)
"""

import io as pyio

import pytest

from bwtpu.config import EngineConfig
from bwtpu.dist import DistEngine
from bwtpu.engine import Engine
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index, build_sharded_index
from bwtpu.io import Contig
from bwtpu.sam import emit_sam, pair_and_emit_sam
from bwtpu.simulate import random_genome, simulate_pairs, simulate_reads

CFG = EngineConfig(sa_rate=8, max_hits=16, max_cand=16, read_len=100)


@pytest.fixture(scope="module")
def tier():
    genome = random_genome(60_000, seed=101)  # bacterial-scale stand-in
    golden = GoldenFMIndex(genome)
    engine = Engine([build_fm_index(genome, CFG)])
    reads, truth = simulate_reads(genome, 64, read_len=100, max_mismatches=2,
                                  seed=102)
    return genome, golden, engine, reads, truth


def test_config1_exact_replicated(tier):
    genome, golden, engine, reads, truth = tier
    got = engine.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0)


def test_config2_inexact_k2(tier):
    genome, golden, engine, reads, truth = tier
    got = engine.align_batch(reads, k=2)
    for r, hits, t in zip(reads, got, truth):
        assert hits == golden.align_read(r.seq, k=2)
        assert any(h.pos == t["pos"] and h.nm == t["nm"] for h in hits)


def test_config3_locate_sam_equality(tier):
    genome, golden, engine, reads, truth = tier
    contigs = [Contig("chr", 0, len(genome))]
    ghits = [golden.align_read(r.seq, k=2) for r in reads]
    ehits = engine.align_batch(reads, k=2)
    bg, be = pyio.StringIO(), pyio.StringIO()
    emit_sam(reads, ghits, contigs, bg)
    emit_sam(reads, ehits, contigs, be)
    assert bg.getvalue() == be.getvalue()


def test_config4_sharded_streaming(tier):
    genome, golden, engine, reads, truth = tier
    shards, manifest = build_sharded_index(genome, 4, config=CFG, overlap=128)
    eng = DistEngine(shards, manifest, n_data=2)
    got = eng.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0)


def test_config5_paired_end_scaling_shape(tier):
    genome, golden, engine, reads, truth = tier
    contigs = [Contig("chr", 0, len(genome))]
    shards, manifest = build_sharded_index(
        genome, 4, config=CFG, contigs=contigs, overlap=256
    )
    manifest.contigs = contigs
    eng = DistEngine(shards, manifest, n_data=2)
    pairs, ptruth = simulate_pairs(genome, 16, read_len=100, insert_mean=400,
                                   insert_sd=20, max_mismatches=1, seed=103)
    h1 = eng.align_batch([p[0] for p in pairs], k=1)
    h2 = eng.align_batch([p[1] for p in pairs], k=1)
    buf = pyio.StringIO()
    pair_and_emit_sam(pairs, h1, h2, contigs, buf, min_insert=200,
                      max_insert=600)
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(lines) == 32
    proper = sum(1 for l in lines if int(l.split("\t")[1]) & 0x2)
    assert proper == 32
    for i, t in enumerate(ptruth):
        ps = sorted([int(lines[2 * i].split("\t")[3]) - 1,
                     int(lines[2 * i + 1].split("\t")[3]) - 1])
        assert ps == sorted([t["pos1"], t["pos2"]])
