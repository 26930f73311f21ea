"""Multi-host launch scaffolding (SURVEY.md §3.5, §5.8 — config 5 scale).

Each host of a v5e/v5p pod slice runs the SAME program:

    python -m bwtpu.multihost --coordinator host0:8476 \
        --num-processes H --process-id h --index idx/ --reads reads_h.fq

jax.distributed.initialize() brings up the process group over DCN;
jax.devices() then spans the whole slice and the ('shard', 'data') mesh
in bwtpu.dist lays shards within hosts so ring hops ride ICI while the
'data' axis spans hosts (each host ingests its own read stream — the
reference's per-worker read fan-out, C16/C17, re-expressed as
data-parallel ingestion).

Per-host output: each host writes SAM records for ITS OWN reads
(out.h<process_id>.sam); a rank-0 merge is a plain concatenation since
read batches are disjoint. Deterministic batch order + the cursor file
(cli.py) give restartability (SURVEY.md §5.3).

Paired-end (config 5): --paired <mate.fq> dispatches both mates' ring
programs per round (pipelined) and emits proper-pair SAM via the pinned
FR pairing rule (bwtpu.sam.pair_and_emit_sam). Paired-ness and the
packed decision (covering BOTH mates' lengths) are agreed pod-wide up
front — they select which collective program runs.

Collective-deadlock safety (SURVEY.md §5.2): every host must call
align_batch the same number of times with the same shapes; the driver
below pads each host's final partial batch to the common batch size and
runs max_batches = max over hosts (hosts with fewer reads contribute
empty batches), exchanged up front with a cheap process-group
all-gather of batch counts.

This module is exercised single-process in tests (the mesh logic is
identical — SURVEY.md §4.2.4); a real pod slice is required to run it
multi-process, which this environment does not provide.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def initialize(coordinator: str | None, num_processes: int, process_id: int,
               platform: str | None = None, host_devices: int = 0):
    """Bring up the process group. platform/host_devices support
    multi-process runs on CPU hosts (SURVEY.md §4.2.4: the same
    collective program, no pod slice needed): host_devices virtual CPU
    devices per process, collectives over the coordinator."""
    import os

    if host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.devices()


def run(args):
    import jax
    import numpy as np

    from bwtpu.hosttune import tune_malloc

    tune_malloc()  # page-fault wall: docs/DESIGN.md, bwtpu/hosttune.py

    from bwtpu.dist import DistEngine
    from bwtpu.index import load_index
    from bwtpu.io import Read, read_reads
    from bwtpu.sam import emit_sam, pair_and_emit_sam, sam_header

    initialize(args.coordinator, args.num_processes, args.process_id,
               platform=args.platform, host_devices=args.host_devices)
    shards, manifest = load_index(args.index)
    n_dev = len(jax.devices())
    S = len(shards)
    if n_dev % S != 0:
        raise SystemExit(f"{n_dev} devices not divisible by {S} shards")
    eng = DistEngine(shards, manifest, n_data=n_dev // S)

    reads = read_reads(args.reads)
    reads2 = read_reads(args.paired) if args.paired else None
    if reads2 is not None and len(reads2) != len(reads):
        raise SystemExit("paired files differ in read count")
    bs = args.batch_size
    n_batches = -(-len(reads) // bs)
    # Cross-host agreement (SURVEY.md §5.2 — every host must execute
    # the SAME collective program the SAME number of times):
    #   - common batch count (hosts with fewer reads run filler batches)
    #   - common packed/ragged path: the packed ring is a different
    #     compiled program, so it is only used if EVERY host's whole
    #     stream — BOTH mates in a paired run — is one uniform length
    #   - common paired-ness: a paired host dispatches two ring programs
    #     per round, so paired/single must agree pod-wide
    # An empty host contributes a neutral sentinel (lmin=+inf, lmax=0)
    # so it can't force the whole pod onto the ragged path; an all-empty
    # pod resolves to lmin>lmax => ragged (nothing to align anyway).
    lens = [len(r.seq) for r in reads]
    if reads2 is not None:
        lens += [len(r.seq) for r in reads2]
    lmin = min(lens) if lens else np.iinfo(np.int64).max
    lmax = max(lens) if lens else 0
    paired = int(reads2 is not None)
    if args.num_processes > 1:
        from jax.experimental import multihost_utils

        agg = multihost_utils.process_allgather(
            np.array([n_batches, lmin, lmax, paired])
        ).reshape(args.num_processes, 4)
        n_batches = int(agg[:, 0].max())
        lmin, lmax = int(agg[:, 1].min()), int(agg[:, 2].max())
        if int(agg[:, 3].min()) != int(agg[:, 3].max()):
            raise SystemExit(
                "hosts disagree on paired-ness: every host must pass "
                "--paired or none (the collective program differs)"
            )
    packed = 0 < lmin == lmax <= eng.config.read_len
    if args.num_processes > 1 and not packed:
        raise SystemExit(
            "multi-process runs require one uniform read length <= the "
            f"index read_len ({eng.config.read_len}); got lengths "
            f"[{lmin}, {lmax}] pod-wide"
        )

    out_path = (
        args.out
        if args.num_processes == 1
        else f"{args.out}.h{args.process_id}"
    )
    t0 = time.time()
    total = 0
    with open(out_path, "w") as out:
        if args.process_id == 0 or args.num_processes > 1:
            out.write(sam_header(manifest.contigs))
        filler = reads[0] if reads else Read(
            rid="__filler__", seq="A" * max(lmax, 1)
        )

        # pipelined dispatch (VERDICT r1 weak #4): keep a few batches in
        # flight so host-side encode/assembly overlaps the ring hops.
        # Dispatch order is identical on every host, so pipelining can't
        # reorder collectives.
        inflight: list = []

        def drain_one():
            nonlocal total
            rec = inflight.pop(0)
            if reads2 is None:
                chunk, handle = rec
                hits = eng.finish_batch(handle)
                if chunk:
                    emit_sam(chunk, hits[: len(chunk)], manifest.contigs,
                             out, header=False)
                    total += len(chunk)
            else:
                c1, c2, h1, h2 = rec
                hits1 = eng.finish_batch(h1)
                hits2 = eng.finish_batch(h2)
                if c1:
                    pair_and_emit_sam(
                        list(zip(c1, c2)), hits1[: len(c1)], hits2[: len(c2)],
                        manifest.contigs, out, min_insert=args.min_insert,
                        max_insert=args.max_insert, header=False,
                    )
                    total += 2 * len(c1)

        for bi in range(n_batches):
            lo, hi = bi * bs, (bi + 1) * bs
            chunk = reads[lo:hi]
            # every host aligns EXACTLY bs reads per round (fillers are
            # dropped from the output) so batch shapes — and therefore
            # the compiled collective program — match across hosts
            padded = chunk + [filler] * (bs - len(chunk))
            if reads2 is None:
                inflight.append(
                    (chunk, eng.dispatch_batch(padded, k=args.k, packed=packed))
                )
            else:
                c2 = reads2[lo:hi]
                padded2 = c2 + [filler] * (bs - len(c2))
                h1 = eng.dispatch_batch(padded, k=args.k, packed=packed)
                h2 = eng.dispatch_batch(padded2, k=args.k, packed=packed)
                inflight.append((chunk, c2, h1, h2))
            if len(inflight) > args.pipeline_depth:
                drain_one()
        while inflight:
            drain_one()
    dt = time.time() - t0
    print(
        json.dumps({
            "event": "host_summary", "process": args.process_id,
            "reads": total, "reads_per_s": round(total / max(dt, 1e-9), 1),
            "wall_s": round(dt, 2), "devices": n_dev,
            "paired": bool(reads2 is not None),
        }),
        file=sys.stderr,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--index", required=True)
    p.add_argument("--reads", required=True, help="this host's read stream")
    p.add_argument("--paired", default=None,
                   help="mate FASTQ for paired-end (config 5); every host "
                        "must pass it or none")
    p.add_argument("--out", default="out.sam")
    p.add_argument("-k", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--pipeline-depth", type=int, default=3)
    p.add_argument("--min-insert", type=int, default=0)
    p.add_argument("--max-insert", type=int, default=1000)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu for multi-process "
                        "runs without a pod slice)")
    p.add_argument("--host-devices", type=int, default=0,
                   help="virtual CPU devices per process (cpu platform)")
    run(p.parse_args(argv))


if __name__ == "__main__":
    main()
