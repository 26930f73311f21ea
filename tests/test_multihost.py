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
