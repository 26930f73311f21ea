"""A/B: Pallas manual-DMA row gather vs XLA take, at the tables the
exact pipeline actually gathers from (VERDICT r3 item 6 — replaces the
stale round-1 "Pallas scalar fori >= 157 ns/row" evidence with a
measurement of the scalar-prefetch + K-outstanding-DMA formulation).

The data-dependent row gather is THE binding resource of the FM-index
pipelines (docs/DESIGN.md), and its measured cost grows with table
residency (7 ns/row at 9 MB -> ~35 ns at 295 MB). This experiment asks
whether a hand-built Pallas gather — indices scalar-prefetched to SMEM,
K row-DMAs kept in flight, accumulate in VMEM — beats XLA's gather at
bench shapes.

Also prints the one-hot MXU-rank arithmetic (VERDICT's option (b)): at
N rows the matmul formulation costs B*N*W MACs; even for the SMALLEST
table in the pipeline (9 MB latk, N=18K x 128 words) that is ~2.3
MFLOP/row -> ~11.5 ns/row at v5e peak bf16 — already slower than the
measured 7 ns/row XLA gather, and it scales linearly with N. Recorded
as analysis; not worth building.

Run (TPU): python scripts/pallas_gather_ab.py
CPU wiring check: JAX_PLATFORMS=cpu python scripts/pallas_gather_ab.py --interpret --sizes-mb 1
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dma_gather(N, Wr, n_idx, G=1024, K=8, interpret=False):
    """Gather rows idx of table int32[N, Wr] and column-sum per grid
    block: out int32[n_blocks, Wr]. Indices ride scalar prefetch (SMEM);
    K row DMAs stay outstanding."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = n_idx // G

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        step = pl.program_id(0)
        base = step * G

        def dma(j, slot):
            # 2-D (1, Wr) slice copies: some Mosaic toolchains reject
            # 1-D row refs from ANY-space operands
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[base + j], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        # prologue: fill the pipeline with K outstanding row DMAs
        for j0 in range(K):
            dma(j0, j0).start()

        @pl.when(step == 0)
        def _():
            out_ref[...] = jnp.zeros((8, Wr), jnp.int32)

        def body(j, _):
            slot = jax.lax.rem(j, K)
            dma(j, slot).wait()
            out_ref[0:1, :] += scratch[pl.ds(slot, 1), :]

            @pl.when(j + K < G)
            def _():
                dma(j + K, slot).start()

            return 0

        jax.lax.fori_loop(0, G, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
        # constant index map: one (8, Wr) accumulator block stays
        # resident across all grid steps
        out_specs=pl.BlockSpec((8, Wr), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((K, Wr), jnp.int32),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, Wr), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-mb", type=float, nargs="*",
                    default=[9, 36, 147, 295])
    ap.add_argument("--width", type=int, default=128,
                    help="row width in int32 words (128 = the 512 B "
                         "multi-step lattice record)")
    ap.add_argument("--n-idx", type=int, default=1 << 20)
    ap.add_argument("--outstanding", type=int, nargs="*", default=[4, 8, 16])
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    Wr = args.width
    n_idx = args.n_idx
    results = []
    for mb in args.sizes_mb:
        N = max(int(mb * 1e6 / (Wr * 4)), 64)
        table = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 1000, size=(N, Wr), dtype=np.int32)
        )

        # ---- XLA take baseline (consumer sums ALL columns so the
        # gather cannot be narrowed — DESIGN.md measurement pitfall;
        # table passed as an ARGUMENT, not captured — a captured array
        # rides the remote-compile payload and blows the relay's
        # request limit at 295 MB) ----
        @jax.jit
        def xla_probe(seed, table):
            N_ = table.shape[0]
            idx = (
                jnp.arange(n_idx, dtype=jnp.uint32)
                * (jnp.uint32(2654435761) + jnp.uint32(2) * seed)
            ) % jnp.uint32(N_)
            return jnp.take(table, idx.astype(jnp.int32), axis=0).sum(axis=0)

        np.asarray(xla_probe(jnp.uint32(0), table))
        t0 = time.time()
        outs = [xla_probe(jnp.uint32(s + 1), table) for s in range(3)]
        for o in outs:
            np.asarray(o)
        xla_ns = (time.time() - t0) / (3 * n_idx) * 1e9

        # ---- Pallas manual-DMA gather ----
        best_pl = None
        for K in args.outstanding:
            fn = build_dma_gather(N, Wr, n_idx, G=1024, K=K,
                                  interpret=args.interpret)
            idx0 = np.random.default_rng(1).integers(
                0, N, size=n_idx, dtype=np.int32)
            try:
                ref = np.asarray(fn(jnp.asarray(idx0), table))  # compile
            except Exception as e:
                print(f"# size={mb}MB K={K}: pallas failed: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            # correctness vs numpy on the first run (out = one (8, Wr)
            # accumulator; row 0 carries the total)
            host = np.asarray(table)[idx0].sum(axis=0).astype(np.int32)
            if not np.array_equal(ref[0], host):
                print(f"# size={mb}MB K={K}: WRONG RESULT — skipping",
                      flush=True)
                continue
            t0 = time.time()
            outs = []
            for s in range(3):
                idx = np.random.default_rng(2 + s).integers(
                    0, N, size=n_idx, dtype=np.int32)
                outs.append(fn(jnp.asarray(idx), table))
            for o in outs:
                np.asarray(o)
            ns = (time.time() - t0) / (3 * n_idx) * 1e9
            print(f"size={mb}MB K={K}: pallas {ns:.1f} ns/row", flush=True)
            if best_pl is None or ns < best_pl[0]:
                best_pl = (ns, K)
        results.append((mb, xla_ns, best_pl))
        print(f"size={mb}MB: XLA take {xla_ns:.1f} ns/row | pallas best "
              f"{best_pl}", flush=True)

    print("\n# summary (ns/row)")
    for mb, xla_ns, best_pl in results:
        pl_s = f"{best_pl[0]:.1f} (K={best_pl[1]})" if best_pl else "n/a"
        print(f"{mb:>6} MB: xla={xla_ns:.1f}  pallas={pl_s}")
    # one-hot MXU analysis (option b)
    flops_per_row = 18000 * 128 * 2
    print(f"\n# one-hot MXU rank (analysis): {flops_per_row/1e6:.1f} "
          "MFLOP/row at the 9 MB table -> ~"
          f"{flops_per_row / 200e12 * 1e9:.1f} ns/row at v5e peak bf16; "
          "grows linearly with table rows — dominated by the gather at "
          "every size.")


if __name__ == "__main__":
    main()
