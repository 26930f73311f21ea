"""Mixed-length (ragged) FASTQ stays on the columnar packed path
(VERDICT r3 item 7): length-bucketed blocks + input-order record
reorder, byte-equal to the object-per-read path.
"""

import numpy as np
import pytest

import cli
from bwtpu.config import EngineConfig
from bwtpu.engine import Engine
from bwtpu.index import build_sharded_index, save_index
from bwtpu.io import Read, read_reads
from bwtpu.sam import emit_sam, sam_header
from bwtpu.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ragged")
    genome = random_genome(20_000, seed=71)
    cfg = EngineConfig(sa_rate=4, max_hits=8, max_cand=8, read_len=60, k=1)
    shards, manifest = build_sharded_index(genome, 1, config=cfg)
    idx = shards[0]
    idx_dir = tmp / "idx"
    save_index(str(idx_dir), shards, manifest)
    # mixed lengths, interleaved, some reverse-strand and mismatched
    reads = []
    for L, seed in [(40, 1), (60, 2)]:
        rs, _ = simulate_reads(genome, 16, read_len=L, max_mismatches=1,
                               revcomp_frac=0.5, seed=seed)
        reads.extend(rs)
    order = np.random.default_rng(4).permutation(len(reads))
    reads = [Read(f"x{i}", reads[j].seq, "I" * len(reads[j].seq))
             for i, j in enumerate(order)]
    fq = tmp / "mixed.fq"
    with open(fq, "w") as f:
        for r in reads:
            f.write(f"@{r.rid}\n{r.seq}\n+\n{r.qual}\n")
    return tmp, str(idx_dir), str(fq), reads, idx


@pytest.mark.xdist_group("ragged")
def test_ragged_cli_byte_equal_to_object_path(world, monkeypatch, capsys):
    tmp, idx_dir, fq, reads, idx = world
    used = {"ragged": 0}
    orig = cli._align_ragged_block_stream

    def spy(*a, **kw):
        used["ragged"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(cli, "_align_ragged_block_stream", spy)
    out_path = str(tmp / "ragged.sam")
    cli.main(["align", idx_dir, fq, "-o", out_path, "-k", "1",
              "--batch-size", "16"])
    assert used["ragged"] == 1, "ragged fast path was not taken"
    got = open(out_path, "rb").read()

    # expected: the object-per-read path (engine.align_batch + emit_sam,
    # byte-pinned formatter) over the same stream in the same batch size
    eng = Engine([idx])
    import io as _io

    buf = _io.StringIO()
    buf.write(sam_header(idx.contigs))
    rr = read_reads(fq)
    for lo in range(0, len(rr), 16):
        chunk = rr[lo : lo + 16]
        hits = eng.align_batch(chunk, k=1)
        emit_sam(chunk, hits, idx.contigs, buf, header=False)
    assert got.decode() == buf.getvalue()


@pytest.mark.xdist_group("ragged")
def test_ragged_cursor_written(world):
    """The byte-equal test above already ran cli once; its cursor must
    record every chunk (resume semantics shared with the uniform path,
    exercised end-to-end there)."""
    import json

    tmp, idx_dir, fq, reads, idx = world
    cur = tmp / "ragged.sam.cursor"
    assert cur.exists()
    assert json.load(open(cur))["next_batch"] == -(-len(reads) // 16)
