"""Wide-interval start handling (round 4, human-scale fix).

When the start-table depth leaves intervals wider than the multi-step
record's 256-row window (E[width] = n/4^d), every lane used to flag
straggler and fall into the tiny compacted finisher — at 2.5 Gbp this
lost 7/8 of a batch to fixup capacity. The wide phase
(searchk.search_early_stop_packed wide_steps) narrows with
always-correct two-gather 1-step trips first. Forced here with a
shallow kmer_d on a 200 kbp genome (width ~780 at d=4), asserting
golden-exact results and that the engine actually selects a nonzero
wide phase.
"""

import numpy as np

from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index
from bwtpu.simulate import random_genome, simulate_reads


def test_wide_start_intervals_match_golden():
    genome = random_genome(200_000, seed=81)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, read_len=50,
                       kmer_d=4, loc_factor=2, min_trips=1)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    assert eng._wide_steps(4) >= 2, eng._wide_steps(4)
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 24, read_len=50, max_mismatches=2,
                              seed=82)
    for k in (0, 2):
        got = eng.align_batch(reads, k=k)
        for r, hits in zip(reads, got):
            assert hits == golden.align_read(r.seq, k=k), (k, r.rid)
    # the wide phase must leave the straggler/fixup channel quiet on
    # this workload — no heals, no overflowed rows
    assert eng.stats.heals == 0
    assert eng.stats.overflow_reads == 0
