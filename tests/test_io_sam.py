"""I/O layer tests: FASTA/FASTQ round trips, contig resolution, SAM."""

import io as pyio

from bwtpu import dna
from bwtpu.golden import GoldenFMIndex, Hit
from bwtpu.io import (Contig, Read, read_fasta, read_fastq, resolve_position,
                      write_fasta, write_fastq)
from bwtpu.sam import emit_sam, pair_and_emit_sam
from bwtpu.simulate import random_genome, simulate_pairs, simulate_reads


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "g.fa"
    write_fasta(p, [("chr1", "ACGTACGTAC"), ("chr2", "GGGGCCCCNN")])
    seq, contigs = read_fasta(str(p))
    assert seq == "ACGTACGTAC" + "GGGGCCCCAA"  # N sanitized to A
    assert contigs == [
        Contig("chr1", 0, 10),
        Contig("chr2", 10, 10),
    ]


def test_fastq_roundtrip(tmp_path):
    p = tmp_path / "r.fq"
    reads = [Read("r1", "ACGTN", "IIIII"), Read("r2", "TTTT", "####")]
    write_fastq(p, reads)
    got = read_fastq(str(p))
    assert [(r.rid, r.seq, r.qual) for r in got] == [
        ("r1", "ACGTN", "IIIII"),
        ("r2", "TTTT", "####"),
    ]


def test_resolve_position_boundaries():
    contigs = [Contig("a", 0, 10), Contig("b", 10, 5)]
    assert resolve_position(contigs, 0, 5) == ("a", 0)
    assert resolve_position(contigs, 9, 1) == ("a", 9)
    assert resolve_position(contigs, 8, 5) is None  # spans a|b boundary
    assert resolve_position(contigs, 10, 5) == ("b", 0)
    assert resolve_position(contigs, 20, 1) is None  # out of range


def test_emit_sam_exact():
    genome = random_genome(400, seed=3)
    contigs = [Contig("chrT", 0, len(genome))]
    idx = GoldenFMIndex(genome)
    reads, truth = simulate_reads(genome, 20, read_len=30, seed=4)
    hits = [idx.align_read(r.seq, k=0) for r in reads]
    buf = pyio.StringIO()
    emit_sam(reads, hits, contigs, buf)
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(lines) == 20
    for line, read, t in zip(lines, reads, truth):
        f = line.split("\t")
        assert f[0] == read.rid
        flag = int(f[1])
        assert (flag & 0x4) == 0  # mapped
        assert f[2] == "chrT"
        # primary hit must include the true origin when it's the unique best
        assert int(f[3]) >= 1
        if (flag & 0x10) != 0:
            assert f[9] == dna.revcomp_str(read.seq)
        else:
            assert f[9] == read.seq
    # truth position check: at least one read maps exactly to truth
    mapped = {r.rid: int(l.split("\t")[3]) - 1 for r, l in zip(reads, lines)}
    exact = sum(1 for r, t in zip(reads, truth) if mapped[r.rid] == t["pos"])
    assert exact >= 15  # most reads are unique at this genome size


def test_unmapped_read_emitted():
    genome = "ACGT" * 100
    contigs = [Contig("c", 0, len(genome))]
    idx = GoldenFMIndex(genome)
    reads = [Read("weird", "N" * 20, "I" * 20)]
    hits = [idx.align_read(reads[0].seq, k=0)]
    buf = pyio.StringIO()
    emit_sam(reads, hits, contigs, buf)
    line = [l for l in buf.getvalue().splitlines() if not l.startswith("@")][0]
    f = line.split("\t")
    assert int(f[1]) & 0x4
    assert f[2] == "*"


def test_paired_emission():
    genome = random_genome(2000, seed=5)
    contigs = [Contig("chrP", 0, len(genome))]
    idx = GoldenFMIndex(genome)
    pairs, truth = simulate_pairs(genome, 10, read_len=50, insert_mean=300, seed=6)
    h1 = [idx.align_read(r1.seq, k=0) for r1, _ in pairs]
    h2 = [idx.align_read(r2.seq, k=0) for _, r2 in pairs]
    buf = pyio.StringIO()
    pair_and_emit_sam(pairs, h1, h2, contigs, buf, min_insert=100, max_insert=600)
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(lines) == 20
    for i, t in enumerate(truth):
        f1 = lines[2 * i].split("\t")
        f2 = lines[2 * i + 1].split("\t")
        assert int(f1[1]) & 0x1 and int(f2[1]) & 0x1  # paired
        assert int(f1[1]) & 0x2 and int(f2[1]) & 0x2  # proper
        ps = sorted([int(f1[3]) - 1, int(f2[3]) - 1])
        assert ps == sorted([t["pos1"], t["pos2"]])
        assert abs(int(f1[8])) == t["insert"]
