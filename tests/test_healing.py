"""Self-healing overflow (VERDICT r3 item 3; SURVEY.md §7.4 "no silent
caps" strengthened to "no lost hits").

Deliberately tiny capacities on repeat-heavy adversarial genomes MUST
still produce golden-exact results: any interval / compaction / hit-
buffer overflow triggers a bounded re-dispatch with doubled caps
(engine.Engine._caps / dist.DistEngine._caps); only if the final level
still overflows are reads MARKED truncated (FlatHits.truncated ->
SAM xo:i:1 tag) instead of silently incomplete.

Covers single-chip align_batch, the block (FASTQ->SAM) path, SAM tag
emission, and the compact ring on a CPU mesh at capacities that
actually bind with thousands of reads (VERDICT r3 item 8: hov/hco
nonzero paths through the all_to_all decode).
"""

import logging

import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index, build_sharded_index
from bwtpu.io import Read
from bwtpu.simulate import adversarial_genome, random_genome, simulate_reads


def _repeat_genome(n_copies=30, seed=9):
    """A motif repeated exactly n_copies times inside random flanks:
    reads over the array carry ~n_copies true hits each."""
    rng = np.random.default_rng(seed)
    motif = "ACGTGGTCAAGT"  # 12 bp, no internal repeat
    left = random_genome(800, seed=seed)
    right = random_genome(800, seed=seed + 1)
    return left + motif * n_copies + right, len(left), len(motif) * n_copies


def test_heal_single_chip_matches_golden():
    genome, off, arr_len = _repeat_genome()
    golden = GoldenFMIndex(genome)
    # max_hits=4 <<< ~30 true hits: level-0 ALWAYS overflows; healing
    # must escalate (4 -> 8 -> 16 -> 32 -> 64) until nothing truncates.
    cfg = EngineConfig(sa_rate=4, max_hits=4, max_cand=4, loc_factor=1,
                       read_len=36, max_heals=4)
    eng = Engine([build_fm_index(genome, cfg)])
    reads = [
        Read("rep0", genome[off : off + 36]),
        Read("rep1", genome[off + 5 : off + 41]),
        Read("uniq", genome[100:136]),
    ]
    for k in (0, 2):  # k=1 adds compiles, not coverage
        got = eng.align_batch(reads, k=k)
        for r, hits in zip(reads, got):
            assert hits == golden.align_read(r.seq, k=k), (k, r.rid)
    assert eng.stats.heals >= 1
    assert eng.stats.overflow_reads == 0  # fully healed, nothing truncated


def test_heal_disabled_overflows_loudly(caplog):
    genome, off, _ = _repeat_genome()
    cfg = EngineConfig(sa_rate=4, max_hits=4, max_cand=4, loc_factor=1,
                       read_len=36, heal_overflow=False)
    eng = Engine([build_fm_index(genome, cfg)])
    reads = [Read("rep0", genome[off : off + 36])]
    with caplog.at_level(logging.WARNING):
        got = eng.align_batch(reads, k=0)
    assert eng.stats.overflow_reads >= 1
    assert len(got[0]) <= 2 * cfg.max_hits
    assert any("overflowed" in r.message for r in caplog.records)


def test_heal_block_path_and_truncation_marking():
    from bwtpu.readblock import ReadBlock
    from bwtpu.results import ContigTable, select_primary_flat
    from bwtpu.samfast import emit_single

    genome, off, _ = _repeat_genome()
    golden = GoldenFMIndex(genome)
    reads = [
        Read("rep0", genome[off : off + 36], "I" * 36),
        Read("uniq", genome[100:136], "I" * 36),
    ]
    blk = ReadBlock.from_reads(reads)

    # (a) healing converges -> golden parity, no truncation flags
    cfg = EngineConfig(sa_rate=4, max_hits=4, max_cand=4, loc_factor=1,
                       read_len=36, max_heals=4)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    flat = eng.finish_block(eng.dispatch_block(blk, 0))
    assert flat.truncated is None
    assert eng.stats.heals >= 1
    from bwtpu.results import hit_lists

    got = hit_lists(flat)
    for r, hits in zip(reads, got):
        assert hits == golden.align_read(r.seq, k=0), r.rid

    # (b) max_heals=0: the repeat read must be MARKED truncated and the
    # SAM record must carry the xo:i:1 tag; the unique read stays clean
    eng0 = Engine([build_fm_index(
        genome, cfg.replace(max_heals=0))])
    flat0 = eng0.finish_block(eng0.dispatch_block(blk, 0))
    assert flat0.truncated is not None
    assert flat0.truncated[0] and not flat0.truncated[1]
    assert eng0.stats.truncated_reads == 1
    ctable = ContigTable.build(idx.contigs)
    prim = select_primary_flat(flat0)
    for force_py in (False, True):
        sam = emit_single(blk, prim, ctable, force_python=force_py,
                          truncated=flat0.truncated)
        lines = sam.decode().strip().split("\n")
        assert "xo:i:1" in lines[0] and "xo:i:1" not in lines[1], force_py
    # and without truncation flags the tag never appears
    sam_clean = emit_single(blk, prim, ctable)
    assert b"xo:i:1" not in sam_clean


@pytest.mark.parametrize("n_shard,n_data", [
    (2, 2),
    pytest.param(4, 2, marks=pytest.mark.scale),  # wider mesh: scale tier
])
def test_heal_compact_ring_binding_caps(n_shard, n_data):
    """VERDICT r3 item 8: the compact ring at capacities that actually
    bind — thousands of reads over an adversarial tandem genome with a
    tiny compaction cap, so hov (per-row interval overflow) and hco
    (compaction drops) ride the all_to_all nonzero, and the healed
    re-dispatch recovers golden-exact results."""
    import jax

    from bwtpu.dist import DistEngine

    if len(jax.devices()) < n_shard * n_data:
        pytest.skip("needs CPU mesh devices")
    genome = adversarial_genome(6000, "tandem", seed=5)
    golden = GoldenFMIndex(genome)
    L = 32
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, loc_factor=0.05,
                       read_len=L, max_heals=6)
    shards, manifest = build_sharded_index(genome, n_shard, config=cfg,
                                           overlap=L)
    eng = DistEngine(shards, manifest, n_data=n_data)

    rng = np.random.default_rng(11)
    # 768 keeps the interval caps binding (the tandem arrays overflow
    # max_hits regardless of read count) at ~1/3 the ring decode cost
    # (VERDICT r4 item 8: default tier over budget)
    n_reads = 768
    starts = rng.integers(0, len(genome) - L + 1, size=n_reads)
    reads = [Read(f"r{i}", genome[s : s + L]) for i, s in enumerate(starts)]

    # pre-heal: the same batch with healing disabled must surface
    # nonzero overflow through the ring's all_to_all decode
    import dataclasses

    cfg_off = cfg.replace(heal_overflow=False)
    shards_off = [dataclasses.replace(s, config=cfg_off) for s in shards]
    eng_off = DistEngine(shards_off, manifest, n_data=n_data)
    h = eng_off.dispatch_batch(reads, k=0)
    assert h[0] == "packed_compact"
    _, n_over, co, trunc = eng_off._finish_packed_compact(h)
    assert n_over + co > 0, "caps were meant to bind (test misconfigured)"
    # the per-read truncation channel (ADVICE r4: dist path was
    # log-only) must flag the overflowed reads when healing is off
    assert trunc.shape == (n_reads,)
    if n_over:
        assert trunc.any()
    hits_off = eng_off.finish_batch(eng_off.dispatch_batch(reads, k=0))
    assert eng_off.last_truncated is not None
    assert eng_off.last_truncated.any()
    del hits_off

    # healed: golden-exact on a sample (full golden compare on 2048
    # repeat reads is minutes of pure Python; 64 sampled reads cover
    # repeat-array and unique lanes)
    got = eng.align_batch(reads, k=0)
    sample = rng.choice(n_reads, size=64, replace=False)
    for i in sample:
        assert got[i] == golden.align_read(reads[i].seq, k=0), i
