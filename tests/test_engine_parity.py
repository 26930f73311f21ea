"""Engine-vs-golden parity (BASELINE configs 1-3 semantics, SURVEY.md §4.2.3).

The engine's full deduped hit lists must equal the golden model's on
every read — exact (config 1), <=2 mismatches (config 2), and the
SAM-emission output equality (config 3).
"""

import io as pyio

import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index, build_sharded_index
from bwtpu.io import Contig
from bwtpu.sam import emit_sam
from bwtpu.simulate import random_genome, simulate_reads

CFG = EngineConfig(sa_rate=8, max_hits=32, max_cand=32, read_len=50)


@pytest.fixture(scope="module")
def world():
    genome = random_genome(5000, seed=31)
    golden = GoldenFMIndex(genome)
    engine = Engine([build_fm_index(genome, CFG)])
    return genome, golden, engine


def _check_parity(genome, golden, engine, k, n_reads=40, read_len=40, n_frac=0.0,
                  seed=5):
    reads, _ = simulate_reads(
        genome, n_reads, read_len=read_len, max_mismatches=k, n_frac=n_frac,
        seed=seed,
    )
    got = engine.align_batch(reads, k=k)
    for r, hits in zip(reads, got):
        expected = golden.align_read(r.seq, k=k)
        assert hits == expected, f"{r.rid}: {hits} != {expected}"


def test_exact_parity(world):
    _check_parity(*world, k=0)


def test_exact_parity_with_N(world):
    _check_parity(*world, k=0, n_frac=0.02, seed=6)


def test_inexact_k1_parity(world):
    _check_parity(*world, k=1, seed=7)


def test_inexact_k2_parity(world):
    _check_parity(*world, k=2, seed=8)


def test_inexact_k2_parity_with_N(world):
    _check_parity(*world, k=2, n_frac=0.02, seed=9)


def test_short_and_degenerate_reads(world):
    genome, golden, _ = world
    from bwtpu.io import Read

    # Degenerate reads hit thousands of positions; use a high-capacity
    # engine so the fixed-shape output arrays hold the full hit set.
    engine = Engine([build_fm_index(genome, CFG.replace(max_hits=4096, loc_factor=2048))])
    reads = [
        Read("tiny", genome[100:104]),  # 4 bp, many hits
        Read("one", genome[200:201]),  # single base: ~n/4 hits per strand
        Read("allN", "N" * 20),
    ]
    got = engine.align_batch(reads, k=0)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0), r.rid


def test_overflow_is_reported(world):
    genome, golden, engine = world
    from bwtpu.io import Read

    # max_hits=32 << true hit count for a 1-bp read: the self-healing
    # retries double the caps max_heals times (so MORE than the base
    # cap comes back), and the still-overflowing final level must be
    # reported (no silent caps).
    got = engine.align_batch([Read("one", "A")], k=0)
    assert engine.stats.heals >= 1
    assert engine.stats.overflow_reads >= 1
    healed_cap = engine.config.max_hits * 2 ** engine.config.max_heals
    assert 2 * engine.config.max_hits < len(got[0]) <= 2 * healed_cap


def test_repetitive_genome_multi_hits(world):
    # tandem repeats -> one read, many positions
    genome = ("ACGTGGTCA" * 40) + random_genome(500, seed=44)
    golden = GoldenFMIndex(genome)
    engine = Engine([build_fm_index(genome, CFG.replace(max_hits=64, max_cand=64, loc_factor=96))])
    from bwtpu.io import Read

    reads = [Read("rep", genome[0:27])]  # three repeat units
    for k in (0, 1):
        got = engine.align_batch(reads, k=k)
        assert got[0] == golden.align_read(reads[0].seq, k=k)
        assert len(got[0]) >= 30


def test_sharded_engine_equals_golden():
    genome = random_genome(6000, seed=51)
    golden = GoldenFMIndex(genome)
    shards, manifest = build_sharded_index(genome, n_shards=3, config=CFG, overlap=64)
    engine = Engine(shards, manifest)
    reads, _ = simulate_reads(genome, 30, read_len=40, max_mismatches=2, seed=10)
    for k in (0, 2):
        got = engine.align_batch(reads, k=k)
        for r, hits in zip(reads, got):
            assert hits == golden.align_read(r.seq, k=k), (k, r.rid)


def test_sam_output_equality():
    """Config 3: engine SAM output == golden SAM output, byte for byte."""
    genome = random_genome(4000, seed=61)
    contigs = [Contig("chr1", 0, 2500), Contig("chr2", 2500, 1500)]
    golden = GoldenFMIndex(genome)
    engine = Engine([build_fm_index(genome, CFG, contigs=contigs)])
    reads, _ = simulate_reads(genome, 30, read_len=40, max_mismatches=2, seed=11)
    ghits = [golden.align_read(r.seq, k=2) for r in reads]
    ehits = engine.align_batch(reads, k=2)
    bg, be = pyio.StringIO(), pyio.StringIO()
    emit_sam(reads, ghits, contigs, bg)
    emit_sam(reads, ehits, contigs, be)
    assert bg.getvalue() == be.getvalue()


def test_packed_and_host_paths_agree(world):
    """The uniform-length packed fast path and the general host-encoded
    path must produce identical hit lists (mixed-length batches force
    the host path)."""
    genome, golden, engine = world
    from bwtpu.io import Read

    reads, _ = simulate_reads(genome, 16, read_len=40, max_mismatches=2, seed=99)
    for k in (0, 2):
        uniform = engine.align_batch(reads, k=k)  # packed path (40 <= 50)
        mixed = engine.align_batch(reads + [Read("odd", genome[10:25])], k=k)
        assert uniform == mixed[:16], k
        assert mixed[16] == golden.align_read(genome[10:25], k=k)


def test_straggler_fixup_overflow_is_loud():
    """> cap lanes stuck on wide repeat intervals: results are forced
    empty (never garbage) and the overflow counter reports it."""
    from bwtpu.io import Read

    genome = "A" * 4000 + random_genome(4000, seed=7)
    engine = Engine([build_fm_index(genome, CFG.replace(max_hits=8))])
    # 2400 read-strand lanes, all poly-A: every lane straggles, fixup
    # cap is max(256, B2//8) = 300 -> overflow
    reads = [Read(f"a{i}", "A" * 30) for i in range(1200)]
    got = engine.align_batch(reads, k=0)
    assert engine.stats.compact_overflows > 0
    # lanes inside fixup capacity got exact results; none are garbage:
    # every reported hit must be a real poly-A position
    for hs in got:
        for h in hs:
            assert genome[h.pos : h.pos + 30] == "A" * 30
