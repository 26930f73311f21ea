"""multihost launcher, single-process: batching with a filler-padded
final batch, packed/ragged decision, SAM output (SURVEY.md §3.5).
The multi-process path differs only in jax.distributed bring-up and
the allgather of (batch count, min/max read length)."""

import os

from bwtpu import multihost
from bwtpu.config import EngineConfig
from bwtpu.golden import GoldenFMIndex
from bwtpu.index import build_sharded_index, save_index
from bwtpu.io import read_fastq, write_fasta, write_fastq
from bwtpu.sam import emit_sam, sam_header
from bwtpu.simulate import random_genome, simulate_reads


def test_multihost_single_process_end_to_end(tmp_path):
    genome = random_genome(6000, seed=21)
    cfg = EngineConfig(sa_rate=8, max_hits=8, max_cand=8, read_len=40)
    shards, manifest = build_sharded_index(genome, 4, config=cfg, overlap=64)
    idx_dir = str(tmp_path / "idx")
    save_index(idx_dir, shards, manifest)

    # 21 reads with batch size 8 -> final batch padded with fillers
    reads, _ = simulate_reads(genome, 21, read_len=40, max_mismatches=1,
                              seed=22)
    reads_path = str(tmp_path / "reads.fq")
    write_fastq(reads_path, reads)
    out_path = str(tmp_path / "out.sam")

    multihost.main([
        "--index", idx_dir, "--reads", reads_path, "--out", out_path,
        "-k", "1", "--batch-size", "8",
    ])

    golden = GoldenFMIndex(genome)
    exp_path = str(tmp_path / "exp.sam")
    with open(exp_path, "w") as f:
        f.write(sam_header(manifest.contigs))
        emit_sam(reads, [golden.align_read(r.seq, k=1) for r in reads],
                 manifest.contigs, f, header=False)
    assert open(out_path).read() == open(exp_path).read()
    # no filler reads leaked into the output
    assert "__filler__" not in open(out_path).read()


def test_multihost_mixed_lengths_stay_packed(tmp_path):
    """A mixed-length stream buckets into per-length packed rounds —
    no round ever demotes to the ragged ring, and the SAM comes out in
    INPUT order via the reorder buffer (VERDICT r2 next #8: the round-2
    design demoted the whole run on one odd-length read)."""
    genome = random_genome(6000, seed=41)
    cfg = EngineConfig(sa_rate=8, max_hits=8, max_cand=8, read_len=40)
    shards, manifest = build_sharded_index(genome, 4, config=cfg, overlap=64)
    idx_dir = str(tmp_path / "idx")
    save_index(idx_dir, shards, manifest)

    # 18x 40bp with 5x 24bp interleaved: schedule = 1 round @24 + 3 @40
    r40, _ = simulate_reads(genome, 18, read_len=40, max_mismatches=1, seed=42)
    r24, _ = simulate_reads(genome, 5, read_len=24, max_mismatches=1, seed=43)
    reads = []
    for i in range(18):
        reads.append(r40[i])
        if i % 4 == 0 and i // 4 < 5:
            reads.append(r24[i // 4])
    reads_path = str(tmp_path / "mixed.fq")
    write_fastq(reads_path, reads)
    out_path = str(tmp_path / "out.sam")

    summary = multihost.main([
        "--index", idx_dir, "--reads", reads_path, "--out", out_path,
        "-k", "1", "--batch-size", "8",
    ])
    assert summary["rounds"] == 1 + 3
    assert summary["packed_rounds"] == summary["rounds"]
    assert summary["dispatches"] == summary["rounds"]

    golden = GoldenFMIndex(genome)
    exp_path = str(tmp_path / "exp.sam")
    with open(exp_path, "w") as f:
        f.write(sam_header(manifest.contigs))
        emit_sam(reads, [golden.align_read(r.seq, k=1) for r in reads],
                 manifest.contigs, f, header=False)
    assert open(out_path).read() == open(exp_path).read()


def test_multihost_paired_end_to_end(tmp_path):
    """Paired-end launcher (config 5): filler-padded final batch, SAM
    equality vs golden pairing (VERDICT r1 item 6)."""
    from bwtpu.sam import pair_and_emit_sam
    from bwtpu.simulate import simulate_pairs

    genome = random_genome(6000, seed=31)
    cfg = EngineConfig(sa_rate=8, max_hits=8, max_cand=8, read_len=40)
    shards, manifest = build_sharded_index(genome, 4, config=cfg, overlap=64)
    idx_dir = str(tmp_path / "idx")
    save_index(idx_dir, shards, manifest)

    # 13 pairs, batch size 8 -> final batch padded with fillers
    pairs, _ = simulate_pairs(genome, 13, read_len=40, insert_mean=200,
                              insert_sd=20, max_mismatches=1, seed=32)
    r1 = [p[0] for p in pairs]
    r2 = [p[1] for p in pairs]
    p1 = str(tmp_path / "r1.fq")
    p2 = str(tmp_path / "r2.fq")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    out_path = str(tmp_path / "out.sam")

    summary = multihost.main([
        "--index", idx_dir, "--reads", p1, "--paired", p2, "--out", out_path,
        "-k", "1", "--batch-size", "8", "--max-insert", "400",
    ])
    # equal-length mates stack into ONE ring program per round
    # (VERDICT r2 next #6: the round-2 launcher dispatched two)
    assert summary["dispatches"] == summary["rounds"]

    golden = GoldenFMIndex(genome)
    exp_path = str(tmp_path / "exp.sam")
    with open(exp_path, "w") as f:
        f.write(sam_header(manifest.contigs))
        pair_and_emit_sam(
            pairs,
            [golden.align_read(r.seq, k=1) for r in r1],
            [golden.align_read(r.seq, k=1) for r in r2],
            manifest.contigs, f, max_insert=400, header=False,
        )
    assert open(out_path).read() == open(exp_path).read()
    assert "__filler__" not in open(out_path).read()
