"""Row math at > 2^28 text length (VERDICT r1 item 4: "int32 row math
at realistic magnitudes").

Every device-side row/position quantity is int32; shards are capped at
2^31-1. Unit tests run at kbp scale where an int32 overflow in interval
arithmetic, lattice record indexing (row // R at 2 B/base records),
locate candidate math or compaction cumsums would never fire. This tier
builds ONE shard just past 2^28 bases (~268 Mbp — a quarter of int32
max, high bits exercised through row*4-ish intermediates) and checks
truth recovery of reads placed across the whole range, including the
final window.

Marked `scale` (measured 22 min / ~4 GB peak on this 2-core host —
VERDICT r2 weak #8 corrected the earlier "~3 min" claim): `make test`
deselects it for iteration speed; run `make test-all` (or
pytest -m scale) before release-grade changes to index/row math.
"""

import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.index import build_fm_index
from bwtpu.io import Read
from bwtpu.simulate import random_genome, simulate_reads

N = 2**28 + 4096


@pytest.mark.scale
def test_int32_row_math_past_2pow28():
    genome = random_genome(N, seed=77)
    cfg = EngineConfig(sa_rate=8, max_hits=4, max_cand=8, read_len=100)
    idx = build_fm_index(genome, cfg)
    assert idx.n == N + 1 and idx.n > 2**28
    eng = Engine([idx])

    reads, truth = simulate_reads(genome, 48, read_len=100,
                                  max_mismatches=2, seed=78)
    # pin reads at the extremes: the very first and very last windows
    reads.append(Read(rid="head", seq=genome[:100], qual="I" * 100))
    truth.append({"pos": 0, "strand": "+", "nm": 0})
    reads.append(Read(rid="tail", seq=genome[N - 100:], qual="I" * 100))
    truth.append({"pos": N - 100, "strand": "+", "nm": 0})

    for k in (0, 2):
        out = eng.align_batch(reads, k=k)
        for r, t, hits in zip(reads, truth, out):
            if t["nm"] > k:
                continue
            assert any(
                h.pos == t["pos"] and h.strand == t["strand"]
                and h.nm == t["nm"] for h in hits
            ), (k, r.rid, t, hits[:4])
    beyond = sum(1 for t in truth if t["pos"] > 2**27)
    assert beyond >= 8  # the high range was actually exercised
