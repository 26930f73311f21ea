"""Checked-in real data + structured adversarial genomes (C20; VERDICT
r1 item 8).

- data/phiX174.fa: fixed real-genome-structured fixture (provenance in
  data/README.md). Engine-vs-golden parity and a byte-equal golden SAM
  fixture run over it.
- bwtpu.simulate.adversarial_genome: tandem arrays, homopolymer runs
  longer than a read, palindromic blocks — the interval-never-narrows /
  straggler-fixup / both-strand regimes a seeded-random genome never
  produces. Parity contract there: hit-set equality wherever the engine
  flagged no capacity overflow, and the overflow flag raised (never
  silent) wherever golden found more hits than the caps admit.

Regenerate the SAM fixture after an intentional output change:
    python -m tests.test_data_fixtures --regen
"""

import functools
import os

import jax
import numpy as np
import pytest

from bwtpu.config import EngineConfig
from bwtpu.engine import (Engine, exact_pipeline_packed, pack_reads_for_bench,
                          pick_kmer_depth, upload_index)
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_fm_index
from bwtpu.io import read_fasta
from bwtpu.sam import emit_sam
from bwtpu.simulate import adversarial_genome, simulate_reads

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
PHIX = os.path.join(DATA, "phiX174.fa")
PHIX_SAM = os.path.join(DATA, "phiX174_golden.sam")

READ_LEN = 50
N_READS = 64


def _phix_reads(genome):
    return simulate_reads(genome, N_READS, read_len=READ_LEN,
                          max_mismatches=2, n_frac=0.01, seed=174)[0]


def test_phix_fixture_shape():
    seq, contigs = read_fasta(PHIX)
    assert len(seq) == 5386
    assert contigs[0].name == "phiX174"
    assert set(seq) <= set("ACGT")


@pytest.mark.parametrize("k", [0, 2])
def test_phix_engine_golden_parity(k):
    seq, _ = read_fasta(PHIX)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, read_len=READ_LEN)
    eng = Engine([build_fm_index(seq, cfg)])
    golden = GoldenFMIndex(seq)
    reads = _phix_reads(seq)
    handle = eng.dispatch_batch(reads, k=k)
    assert handle[-2] == "compact"
    for r, hits in zip(reads, eng.finish_batch(handle)):
        exp = {(h.pos, h.strand, h.nm) for h in golden.align_read(r.seq, k=k)}
        got = {(h.pos, h.strand, h.nm) for h in hits}
        assert got == exp, (r.rid, sorted(got), sorted(exp))


def _phix_sam_text():
    seq, contigs = read_fasta(PHIX)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, read_len=READ_LEN)
    eng = Engine([build_fm_index(seq, cfg)])
    reads = _phix_reads(seq)
    hits = eng.align_batch(reads, k=2)
    import io as _io

    buf = _io.StringIO()
    emit_sam(reads, hits, contigs, buf)
    return buf.getvalue()


def test_phix_golden_sam_fixture():
    """Engine SAM over phiX174 must be byte-identical to the checked-in
    fixture — full-output equality, BASELINE config 3 on real data."""
    assert os.path.exists(PHIX_SAM), "run: python -m tests.test_data_fixtures --regen"
    assert _phix_sam_text() == open(PHIX_SAM).read()


@pytest.mark.parametrize("kind", ["tandem", "homopolymer", "palindrome"])
@pytest.mark.parametrize("k", [0, 2])
def test_adversarial_parity(kind, k):
    # 12 kbp keeps dozens of tandem/homopolymer blocks (the adversarial
    # structure the test exists for) at ~half the golden-DFS cost
    # (VERDICT r4 item 8: default-tier budget)
    genome = adversarial_genome(12000, kind, seed=7)
    L = 40
    cfg = EngineConfig(sa_rate=4, max_hits=32, max_cand=32, read_len=L,
                       loc_factor=8)
    idx = build_fm_index(genome, cfg)
    dev = upload_index([idx])
    sh = jax.tree.map(lambda x: x[0], dev.shard)
    golden = GoldenFMIndex(genome)
    reads, _ = simulate_reads(genome, 12, read_len=L, max_mismatches=k,
                              seed=8)
    rw, ab = pack_reads_for_bench(reads)
    depths = sorted(idx.kmer_tables)
    B = len(reads)

    if k == 0:
        d = pick_kmer_depth(depths, L)
        fx = jax.jit(functools.partial(
            exact_pipeline_packed, L=L, d=d, max_hits=cfg.max_hits,
            sa_rate=cfg.sa_rate, loc_factor=cfg.loc_factor))
        pos, valid, over, comp_over = fx(sh, rw, ab)
        pos, valid = np.asarray(pos), np.asarray(valid)
        over = np.asarray(over)
        assert int(comp_over) == 0, "size caps for the test so compaction fits"
        for i, r in enumerate(reads):
            for row, strand in ((i, "+"), (B + i, "-")):
                exp = {h.pos for h in golden.align_read(r.seq, k=0)
                       if h.strand == strand}
                got = set(pos[row][valid[row]].tolist())
                if over[row]:
                    # capacity overflow must be FLAGGED exactly when the
                    # true hit set exceeds the cap, and what is returned
                    # must still be true hits
                    assert len(exp) > cfg.max_hits
                    assert got <= exp
                else:
                    assert got == exp, (kind, i, strand)
    else:
        # full Engine path: compare only reads whose true hit load fits
        # the caps; engine stats must flag the others
        eng = Engine([idx])
        out = eng.align_batch(reads, k=2)
        flagged = eng.stats.overflow_reads + eng.stats.compact_overflows
        mismatched = 0
        for r, hits in zip(reads, out):
            exp = {(h.pos, h.strand, h.nm) for h in golden.align_read(r.seq, k=2)}
            got = {(h.pos, h.strand, h.nm) for h in hits}
            if got != exp:
                assert got <= exp, (kind, r.rid, sorted(got - exp)[:5])
                mismatched += 1
        if mismatched:
            assert flagged > 0, (
                f"{mismatched} reads under-reported with no overflow flag")


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        text = _phix_sam_text()
        with open(PHIX_SAM, "w") as fh:
            fh.write(text)
        print(f"wrote {PHIX_SAM}: {len(text.splitlines())} lines")
