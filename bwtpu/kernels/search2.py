"""Exact backward search v2: right-aligned reads + k-mer start table.

Row-budget optimizations (docs/DESIGN.md): the search cost is the
number of gathered lattice rows, so
- reads are RIGHT-ALIGNED on the host (read occupies [L-len, L)), which
  makes "the last d bases" a uniform static slice for every lane, and
  makes the per-step read position uniform across lanes (no per-lane
  element gathers from the read array);
- the first d chained steps are replaced by ONE lookup in the k-mer
  start table: kmer_table[c] = the SA interval [sp, ep) of the d-mer c
  (built exactly from the suffix array at index-build time,
  bwtpu/index.py). Lanes whose read/seed is shorter than d get d=
  effective handling on the host (the caller passes d <= min len).

Ambiguous bases anywhere in the pattern still force an empty interval.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bwtpu.kernels import common


@partial(jax.jit, static_argnames=("d", "backend"))
def backward_search_ra(
    lattice: jnp.ndarray,  # int32[n_blocks+1, 16]
    C: jnp.ndarray,  # int32[8]
    dollar_row: jnp.ndarray,  # int32
    n: jnp.ndarray,  # int32
    kmer_table: jnp.ndarray,  # int32[4^d, 2] (ignored when d == 0)
    ra_codes: jnp.ndarray,  # int32[B, L] RIGHT-aligned base codes
    ra_amb: jnp.ndarray,  # int32[B, L]
    lens: jnp.ndarray,  # int32[B]; caller guarantees lens >= d or len==0
    d: int,
    backend: str = "jnp",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns per-read half-open (sp, ep), int32[B] each."""
    B, L = ra_codes.shape
    if d > 0:
        # key of the last d bases (static slice thanks to right alignment)
        tail = ra_codes[:, L - d :]
        weights = (4 ** np.arange(d - 1, -1, -1, dtype=np.int64)).astype(np.int32)
        key = jnp.sum(tail * weights[None, :], axis=1)
        start = jnp.take(kmer_table, key, axis=0)  # (B, 2) one row gather
        sp0, ep0 = start[:, 0], start[:, 1]
        # ambiguous base inside the key -> no match
        amb_tail = jnp.sum(ra_amb[:, L - d :], axis=1) > 0
        sp0 = jnp.where(amb_tail, 0, sp0)
        ep0 = jnp.where(amb_tail, 0, ep0)
        # empty lanes (len == 0) keep an empty interval
        sp0 = jnp.where(lens == 0, 0, sp0)
        ep0 = jnp.where(lens == 0, 0, ep0)
    else:
        sp0 = jnp.zeros(B, dtype=jnp.int32)
        ep0 = jnp.where(lens == 0, 0, jnp.full(B, 1, jnp.int32) * n.astype(jnp.int32))

    def step(t, state):
        sp, ep = state
        pos = L - 1 - d - t  # uniform position; lane active while in-read
        c = ra_codes[:, pos]
        a = ra_amb[:, pos]
        active = pos >= (L - lens)
        if backend == "pallas":
            from bwtpu.kernels.pallas_step import search_step_pallas

            rec_sp = jnp.take(lattice, sp >> 7, axis=0)
            rec_ep = jnp.take(lattice, ep >> 7, axis=0)
            return search_step_pallas(
                rec_sp, rec_ep, c, a, active, sp, ep, C, dollar_row
            )
        both = jnp.concatenate([sp, ep])
        o = common.occ(lattice, dollar_row, jnp.concatenate([c, c]), both)
        cbase = jnp.take(C, c + 1)
        sp_new = jnp.where(a == 1, 0, cbase + o[:B])
        ep_new = jnp.where(a == 1, 0, cbase + o[B:])
        sp = jnp.where(active, sp_new, sp)
        ep = jnp.where(active, ep_new, ep)
        return sp, ep

    sp, ep = jax.lax.fori_loop(0, L - d, step, (sp0, ep0))
    return sp, ep


def right_align(codes: np.ndarray, amb: np.ndarray, lens: np.ndarray):
    """Host-side: shift each row right so it ends at column L-1 (NumPy)."""
    B, L = codes.shape
    idx = np.arange(L)[None, :] - (L - lens)[:, None]
    safe = np.clip(idx, 0, L - 1)
    ra_c = np.take_along_axis(codes, safe, axis=1)
    ra_a = np.take_along_axis(amb, safe, axis=1)
    pad = idx < 0
    ra_c[pad] = 0
    ra_a[pad] = 0
    return ra_c, ra_a
