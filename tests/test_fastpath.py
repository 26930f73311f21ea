"""Columnar fast-path parity: readblock / results / samfast vs the
Read-list oracle path (VERDICT r2 item 1).

Every production fast-path stage must be equal to its interpreted twin:
  - readblock parse (native C and NumPy) == io.read_fastq
  - pack_block == kernels.verify2.pack_reads
  - Engine block path (FlatHits) == Engine.align_batch Hit lists
  - select_primary_flat == golden.select_primary per read
  - emit_single (C and Python formatters) == sam.emit_sam, byte-equal
  - cli align fast path == cli align legacy path, byte-equal
"""

from __future__ import annotations

import gzip
import io as _io

import numpy as np
import pytest

from bwtpu import dna
from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.golden import select_primary
from bwtpu.index import build_fm_index, build_sharded_index
from bwtpu.io import Contig, Read, read_fastq, write_fastq
from bwtpu.kernels.verify2 import pack_reads
from bwtpu.readblock import ReadBlock, pack_block, read_fastq_block
from bwtpu.results import (ContigTable, flat_from_hit_lists, flatten_hits,
                           hit_lists, select_primary_flat)
from bwtpu.sam import emit_sam
from bwtpu.samfast import emit_single
from bwtpu.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(20000, seed=11)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=16, read_len=50,
                       loc_factor=4)
    idx = build_fm_index(genome, cfg)
    eng = Engine([idx])
    reads, _ = simulate_reads(
        genome, 400, read_len=50, max_mismatches=2, n_frac=0.03, seed=5
    )
    # exercise QNAME whitespace-cut + lowercase normalization
    reads[0] = Read(rid=reads[0].rid, seq=reads[0].seq.lower(),
                    qual=reads[0].qual)
    return genome, cfg, eng, reads


def test_readblock_parse_matches_read_fastq(setup, tmp_path):
    _, _, _, reads = setup
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            extra = " extra stuff" if i % 3 == 0 else ""
            f.write(f"@{r.rid}{extra}\n{r.seq}\n+\n{r.qual}\n")
    blk = read_fastq_block(str(fq))
    assert blk is not None and blk.n == len(reads)
    ref = read_fastq(str(fq))
    for a, b in zip(ref, blk.to_reads()):
        assert (a.rid, a.seq, a.qual) == (b.rid, b.seq, b.qual)

    # gz round trip
    gz = tmp_path / "r.fq.gz"
    with open(fq, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    blk2 = read_fastq_block(str(gz))
    assert blk2 is not None
    assert np.array_equal(blk.seq, blk2.seq)


def test_readblock_fallback_shapes(tmp_path):
    ragged = tmp_path / "ragged.fq"
    with open(ragged, "w") as f:
        f.write("@a\nACGT\n+\nIIII\n@b\nACGTA\n+\nIIIII\n")
    assert read_fastq_block(str(ragged)) is None
    empty = tmp_path / "empty.fq"
    empty.write_text("")
    assert read_fastq_block(str(empty)) is None


def test_read_fastq_stream_matches_block(setup, tmp_path):
    """Chunked prefetching stream == whole-file parse, chunk by chunk,
    including threaded range parses and a partial last chunk."""
    import numpy as np

    from bwtpu.readblock import read_fastq_stream

    genome, cfg, eng, reads = setup
    fq = tmp_path / "s.fq"
    write_fastq(str(fq), reads)
    blk = read_fastq_block(str(fq))
    chunk = max(1, blk.n // 3)  # 3 full-ish chunks + partial tail
    res = read_fastq_stream(str(fq), chunk)
    assert res is not None
    n_s, L_s, stream = res
    assert n_s == blk.n and L_s == blk.L
    # resume: start=2 skips the first two chunks without parsing them
    _, _, resumed = read_fastq_stream(str(fq), chunk, start=2)
    got2 = next(resumed)
    ref2 = blk.slice(2 * chunk, 3 * chunk)
    np.testing.assert_array_equal(got2.seq, ref2.seq)
    np.testing.assert_array_equal(got2.id_blob, ref2.id_blob)
    lo = 0
    n_chunks = 0
    for got in stream:
        ref = blk.slice(lo, lo + chunk)
        assert got.n == ref.n and got.L == ref.L
        np.testing.assert_array_equal(got.seq, ref.seq)
        np.testing.assert_array_equal(got.qual, ref.qual)
        np.testing.assert_array_equal(got.id_off, ref.id_off)
        np.testing.assert_array_equal(got.id_blob, ref.id_blob)
        rw_g, ab_g = pack_block(got)
        rw_r, ab_r = pack_block(ref)
        np.testing.assert_array_equal(rw_g, rw_r)
        np.testing.assert_array_equal(ab_g, ab_r)
        lo += chunk
        n_chunks += 1
    assert lo >= blk.n and n_chunks == -(-blk.n // chunk)


def test_pack_block_matches_pack_reads(setup):
    _, _, _, reads = setup
    blk = ReadBlock.from_reads(reads)
    blk.words = blk.amb = None  # force the NumPy pack
    rw1, ab1 = pack_block(blk)
    codes = np.stack([dna.encode(r.seq.upper()) for r in reads]).astype(np.int32)
    amb = np.stack(
        [dna.encode_with_mask(r.seq)[1] for r in reads]
    ).astype(np.int32)
    rw0, ab0, _ = pack_reads(codes, amb, np.full(len(reads), 50, np.int32))
    assert np.array_equal(rw0, rw1)
    assert np.array_equal(ab0, ab1)


def test_native_parse_packs_like_numpy(setup, tmp_path):
    _, _, _, reads = setup
    fq = tmp_path / "p.fq"
    write_fastq(str(fq), reads)
    blk = read_fastq_block(str(fq))
    if blk.words is None:
        pytest.skip("native parser unavailable")
    w_native, a_native = blk.words.copy(), blk.amb.copy()
    blk.words = blk.amb = None
    w_np, a_np = pack_block(blk)
    assert np.array_equal(w_native, w_np)
    assert np.array_equal(a_native, a_np)


@pytest.mark.parametrize("k", [0, 1, 2])
def test_block_path_matches_hit_lists(setup, k):
    _, _, eng, reads = setup
    blk = ReadBlock.from_reads(reads)
    flat = eng.finish_block(eng.dispatch_block(blk, k=k, pad_to=512))
    ref = flat_from_hit_lists(eng.align_batch(reads, k=k))
    assert np.array_equal(flat.read_idx, ref.read_idx)
    assert np.array_equal(flat.pos, ref.pos)
    assert np.array_equal(flat.strand_rev, ref.strand_rev)
    assert np.array_equal(flat.nm, ref.nm)
    # hit_lists round trip
    hl = hit_lists(flat)
    assert hl == eng.align_batch(reads, k=k)


@pytest.mark.parametrize("k", [0, 2])
def test_primary_and_sam_byte_equality(setup, k):
    _, _, eng, reads = setup
    blk = ReadBlock.from_reads(reads)
    flat = eng.finish_block(eng.dispatch_block(blk, k=k))
    hits = eng.align_batch(reads, k=k)
    prim = select_primary_flat(flat)
    for i, hs in enumerate(hits):
        p, mq = select_primary(hs)
        assert prim.mapped[i] == (p is not None)
        if p is not None:
            assert (prim.pos[i], prim.strand_rev[i], prim.nm[i],
                    prim.mapq[i]) == (p.pos, p.strand == "-", p.nm, mq)

    contigs = [Contig("chrA", 0, 12000), Contig("chrB", 12000, 8000)]
    ctable = ContigTable.build(contigs)
    buf = _io.StringIO()
    emit_sam(reads, hits, contigs, buf, header=False)
    ref_bytes = buf.getvalue().encode()
    assert emit_single(blk, prim, ctable, force_python=True) == ref_bytes
    assert emit_single(blk, prim, ctable) == ref_bytes


def test_emit_paired_byte_equal():
    """Vectorized pairing + interleaved C emission == the per-pair
    Python loop (sam.pair_and_emit_sam), byte for byte — proper pairs,
    orphan mates, unmapped mates, contig-boundary hits, tie-breaks."""
    import io as _io

    from bwtpu.golden import GoldenFMIndex
    from bwtpu.readblock import ReadBlock
    from bwtpu.results import (ContigTable, flat_from_hit_lists,
                               select_pairs, select_primary_flat)
    from bwtpu.sam import pair_and_emit_sam
    from bwtpu.samfast import emit_paired
    from bwtpu.io import Contig
    from bwtpu.simulate import simulate_pairs

    genome = random_genome(8000, seed=61)
    contigs = [Contig("cA", 0, 3000), Contig("cB", 3000, 5000)]
    golden = GoldenFMIndex(genome)
    pairs, _ = simulate_pairs(genome, 60, read_len=36, insert_mean=150,
                              insert_sd=30, max_mismatches=2, seed=62)
    r1 = [p[0] for p in pairs]
    r2 = [p[1] for p in pairs]
    # corrupt some mates so fallback/unmapped branches run
    r2[3] = Read(rid=r2[3].rid, seq="N" * 36, qual=r2[3].qual)
    r1[7] = Read(rid=r1[7].rid, seq="ACGT" * 9, qual=r1[7].qual)
    pairs = list(zip(r1, r2))
    h1 = [golden.align_read(r.seq, k=2) for r in r1]
    h2 = [golden.align_read(r.seq, k=2) for r in r2]

    for mi, ma in ((0, 400), (120, 200), (0, 10)):
        buf = _io.StringIO()
        pair_and_emit_sam(pairs, h1, h2, contigs, buf, min_insert=mi,
                          max_insert=ma, header=False)
        ref = buf.getvalue().encode()

        f1 = flat_from_hit_lists(h1)
        f2 = flat_from_hit_lists(h2)
        choice = select_pairs(f1, f2, 36, 36, mi, ma)
        ct = ContigTable.build(contigs)
        b1 = ReadBlock.from_reads(r1)
        b2 = ReadBlock.from_reads(r2)
        got = emit_paired(b1, b2, f1, f2, choice,
                          select_primary_flat(f1), select_primary_flat(f2),
                          ct)
        assert got == ref, (mi, ma)
        got_py = emit_paired(b1, b2, f1, f2, choice,
                             select_primary_flat(f1),
                             select_primary_flat(f2), ct,
                             force_python=True)
        assert got_py == ref


def test_flatten_dedupes_min_nm():
    # same (read, pos, strand) from two seed slots, different nm: keep min
    flat = flatten_hits(
        n_reads=2, read_lens=10, B=2,
        s_idx=np.zeros(3, np.int64),
        row_idx=np.array([0, 0, 1]),
        p=np.array([5, 5, 7], np.int64),
        m=np.array([2, 1, 0]),
        text_lens=[100], offsets=[0],
    )
    assert flat.read_idx.tolist() == [0, 1]
    assert flat.nm.tolist() == [1, 0]


def test_cli_fastpath_byte_equal(tmp_path, monkeypatch):
    import cli
    from bwtpu import readblock

    genome = random_genome(30000, seed=3)
    cfg = EngineConfig(sa_rate=4, read_len=60)
    shards, manifest = build_sharded_index(genome, 1, config=cfg)
    from bwtpu.index import save_index

    idx_dir = tmp_path / "idx"
    save_index(str(idx_dir), shards, manifest)
    reads, _ = simulate_reads(genome, 300, read_len=60, max_mismatches=2,
                              n_frac=0.02, seed=7)
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), reads)

    fast = tmp_path / "fast.sam"
    cli.main(["align", str(idx_dir), str(fq), "-o", str(fast), "-k", "1",
              "--batch-size", "128"])
    legacy = tmp_path / "legacy.sam"
    monkeypatch.setattr(readblock, "read_fastq_stream",
                        lambda p, c, start=0: None)
    cli.main(["align", str(idx_dir), str(fq), "-o", str(legacy), "-k", "1",
              "--batch-size", "128"])
    assert fast.read_bytes() == legacy.read_bytes()


def test_cli_paired_fastpath_byte_equal(tmp_path, monkeypatch):
    """cli align --paired: columnar stacked-dispatch fast path == the
    per-pair Read-list path, byte for byte."""
    import cli
    from bwtpu import readblock
    from bwtpu.simulate import simulate_pairs

    genome = random_genome(30000, seed=13)
    cfg = EngineConfig(sa_rate=4, read_len=60)
    shards, manifest = build_sharded_index(genome, 2, config=cfg, overlap=64)
    from bwtpu.index import save_index

    idx_dir = tmp_path / "idx"
    save_index(str(idx_dir), shards, manifest)
    pairs, _ = simulate_pairs(genome, 150, read_len=60, insert_mean=200,
                              insert_sd=20, max_mismatches=2, seed=14)
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    write_fastq(str(p1), [p[0] for p in pairs])
    write_fastq(str(p2), [p[1] for p in pairs])

    fast = tmp_path / "fast.sam"
    cli.main(["align", str(idx_dir), str(p1), "--paired", str(p2),
              "-o", str(fast), "-k", "1", "--batch-size", "64",
              "--max-insert", "400"])
    legacy = tmp_path / "legacy.sam"
    monkeypatch.setattr(readblock, "read_fastq_stream",
                        lambda p, c, start=0: None)
    cli.main(["align", str(idx_dir), str(p1), "--paired", str(p2),
              "-o", str(legacy), "-k", "1", "--batch-size", "64",
              "--max-insert", "400"])
    assert fast.read_bytes() == legacy.read_bytes()


@pytest.mark.parametrize("k", [0, 2])
def test_block_path_multi_shard_vmapped(k):
    """S>1: all shards dispatched in ONE vmapped jit + ONE stacked
    fetch (VERDICT r2 next #5); parity with the Read-list path."""
    genome = random_genome(24000, seed=21)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=16, read_len=50,
                       loc_factor=4)
    shards, manifest = build_sharded_index(genome, 4, config=cfg, overlap=128)
    eng = Engine(shards, manifest)
    reads, _ = simulate_reads(genome, 200, read_len=50, max_mismatches=2,
                              seed=22)
    blk = ReadBlock.from_reads(reads)
    handle = eng.dispatch_block(blk, k=k, pad_to=256)
    assert handle[6] == "hits" and handle[4][0] == "stacked", (
        handle[6], type(handle[4]))
    flat = eng.finish_block(handle)
    ref = flat_from_hit_lists(eng.align_batch(reads, k=k))
    assert np.array_equal(flat.read_idx, ref.read_idx)
    assert np.array_equal(flat.pos, ref.pos)
    assert np.array_equal(flat.strand_rev, ref.strand_rev)
    assert np.array_equal(flat.nm, ref.nm)
