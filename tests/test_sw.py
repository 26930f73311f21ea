"""Banded Smith-Waterman (C19) tests: device batch vs Python oracle."""

import jax.numpy as jnp
import numpy as np

from bwtpu import dna
from bwtpu.sw import sw_score_batch, sw_score_reference


def _batch_case(cases, band=8):
    Lt = max(len(t) for t, r in cases)
    L = max(len(r) for t, r in cases)
    B = len(cases)
    text = np.zeros((B, Lt), np.int32)
    rd = np.zeros((B, L), np.int32)
    tl = np.zeros(B, np.int32)
    rl = np.zeros(B, np.int32)
    for b, (t, r) in enumerate(cases):
        text[b, : len(t)] = dna.encode(t)
        rd[b, : len(r)] = dna.encode(r)
        tl[b], rl[b] = len(t), len(r)
    return sw_score_batch(
        jnp.asarray(text), jnp.asarray(tl), jnp.asarray(rd), jnp.asarray(rl),
        band=band,
    )


def test_sw_matches_reference_random():
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(40):
        Lt = int(rng.integers(10, 60))
        L = int(rng.integers(5, 40))
        t = dna.decode(rng.integers(0, 4, Lt).astype(np.uint8))
        r = dna.decode(rng.integers(0, 4, L).astype(np.uint8))
        cases.append((t, r))
    got = np.asarray(_batch_case(cases))
    for (t, r), g in zip(cases, got):
        assert int(g) == sw_score_reference(t, r), (t, r)


def test_rescore_candidates_vectorized_vs_oracle():
    """rescore_candidates (vectorized over hits, per-shard window
    decode) must agree with a per-hit oracle computation, across shard
    boundaries, both strands, and variable read lengths."""
    from bwtpu.config import EngineConfig
    from bwtpu.engine import Engine
    from bwtpu.index import build_sharded_index
    from bwtpu.io import Read
    from bwtpu.simulate import random_genome, simulate_reads
    from bwtpu.sw import rescore_candidates

    genome = random_genome(6000, seed=61)
    cfg = EngineConfig(sa_rate=8, max_hits=8, max_cand=8, read_len=40)
    shards, manifest = build_sharded_index(genome, 3, config=cfg, overlap=64)
    eng = Engine(shards, manifest)
    reads, _ = simulate_reads(genome, 24, read_len=40, max_mismatches=2,
                              seed=62)
    # add a shorter read so lane padding paths run
    reads.append(Read(rid="short", seq=genome[100:130], qual="I" * 30))
    hits = eng.align_batch(reads, k=2)
    scores = rescore_candidates(eng, reads, hits, band=4, flank=6)
    n_checked = 0
    for ri, (r, hlist) in enumerate(zip(reads, hits)):
        for hi, h in enumerate(hlist):
            for sh in shards:
                off = sh.shard_offset
                if off <= h.pos < off + sh.text_len:
                    lo = max(0, h.pos - off - 6)
                    hi_ = min(sh.text_len, h.pos - off + len(r.seq) + 6)
                    window = genome[off + lo : off + hi_]
                    seq = r.seq if h.strand == "+" else dna.revcomp_str(r.seq)
                    exp = sw_score_reference(window, seq, band=4)
                    assert scores[(ri, hi)] == exp, (ri, hi, h)
                    n_checked += 1
                    break
    assert n_checked >= 24 and any(h.strand == "-" for hs in hits for h in hs)


def test_sw_exact_and_indel():
    t = "ACGTACGTACGTACGTACGT"
    # perfect match scores 2 * len
    got = np.asarray(_batch_case([(t, t[4:14])]))[0]
    assert int(got) == 2 * 10
    # one deletion in the read: SW absorbs it with one gap
    read = t[4:9] + t[10:15]  # 10 bases, 1 deleted
    got2 = np.asarray(_batch_case([(t, read)]))[0]
    assert int(got2) == 2 * 10 - 4  # 10 matches + one gap open
    assert int(got2) == sw_score_reference(t, read)
