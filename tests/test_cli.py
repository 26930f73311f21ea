"""CLI end-to-end tests (in-process main() calls on the CPU mesh)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cli  # noqa: E402


def test_cli_full_flow(tmp_path, capsys):
    sim = tmp_path / "sim"
    cli.main(["simulate", "--scale", "20000", "-o", str(sim), "--n-reads", "50",
              "--read-len", "60", "--mismatches", "2", "--pairs", "10",
              "--seed", "3"])
    idx = tmp_path / "idx"
    cli.main(["build-index", str(sim / "ref.fa"), str(idx), "--shards", "2",
              "--sa-rate", "8"])
    out = tmp_path / "out.sam"
    cli.main(["align", str(idx), str(sim / "reads.fq"), "-o", str(out), "-k", "2",
              "--batch-size", "32"])
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 50
    truth = json.load(open(sim / "truth.json"))
    mapped = 0
    for line, t in zip(lines, truth):
        f = line.split("\t")
        if int(f[1]) & 0x4:
            continue
        mapped += 1
        if int(f[4]) > 0:  # unique best hit must be the truth position
            assert int(f[3]) - 1 == t["pos"], line
    assert mapped >= 48

    # paired-end
    out2 = tmp_path / "out_paired.sam"
    cli.main(["align", str(idx), str(sim / "reads_1.fq"), "--paired",
              str(sim / "reads_2.fq"), "-o", str(out2), "-k", "1",
              "--batch-size", "8", "--min-insert", "100", "--max-insert", "600"])
    plines = [l for l in out2.read_text().splitlines() if not l.startswith("@")]
    assert len(plines) == 20
    assert all(int(l.split("\t")[1]) & 0x1 for l in plines)


def test_cli_resume(tmp_path, capsys):
    sim = tmp_path / "sim"
    cli.main(["simulate", "--scale", "5000", "-o", str(sim), "--n-reads", "40",
              "--read-len", "40", "--seed", "4"])
    idx = tmp_path / "idx"
    cli.main(["build-index", str(sim / "ref.fa"), str(idx), "--sa-rate", "8"])
    out = tmp_path / "out.sam"
    # full run to get the reference output
    cli.main(["align", str(idx), str(sim / "reads.fq"), "-o", str(out),
              "-k", "0", "--batch-size", "10"])
    full = out.read_text()
    cursor = json.load(open(str(out) + ".cursor"))
    assert cursor["next_batch"] == 4

    # simulate an interrupted run: first 2 batches written, cursor at 2
    partial_lines = full.splitlines(keepends=True)
    header = [l for l in partial_lines if l.startswith("@")]
    body = [l for l in partial_lines if not l.startswith("@")]
    with open(out, "w") as f:
        f.writelines(header + body[:20])
    with open(str(out) + ".cursor", "w") as f:
        json.dump({"next_batch": 2}, f)
    cli.main(["align", str(idx), str(sim / "reads.fq"), "-o", str(out),
              "-k", "0", "--batch-size", "10", "--resume"])
    assert out.read_text() == full


def test_cli_tiered_matches_full(tmp_path):
    """--tiered primary SAM must be BYTE-IDENTICAL to full enumeration:
    the nm == 0 stratum is complete and escalated reads carry their
    full <= k set, so primary choice and MAPQ (best-nm multiplicity —
    results.select_primary_flat) cannot differ."""
    sim = tmp_path / "sim"
    cli.main(["simulate", "--scale", "20000", "-o", str(sim),
              "--n-reads", "60", "--read-len", "60", "--mismatches", "2",
              "--seed", "7"])
    idx = tmp_path / "idx"
    cli.main(["build-index", str(sim / "ref.fa"), str(idx),
              "--sa-rate", "4"])
    out_f = tmp_path / "full.sam"
    out_t = tmp_path / "tiered.sam"
    cli.main(["align", str(idx), str(sim / "reads.fq"), "-o", str(out_f),
              "-k", "2", "--batch-size", "32"])
    cli.main(["align", str(idx), str(sim / "reads.fq"), "-o", str(out_t),
              "-k", "2", "--batch-size", "32", "--tiered"])
    assert out_t.read_bytes() == out_f.read_bytes()
