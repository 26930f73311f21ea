"""Exact backward search v4: 3-step Occ lattice, uniform-length batches.

One 512 B record gather advances the search by THREE bases for both
interval bounds (docs/DESIGN.md "multi-step Occ lattice"; layout in
bwtpu/index.py at BLOCK3). The generalized backward step over the
triple alphabet (SURVEY.md §3.2 recurrence, applied to 3-char blocks):

    sp' = K3[t] + Occ3(t, sp)
    ep' = K3[t] + Occ3(t, ep)

where t is the next three pattern bases (right-to-left) and Occ3(t, i)
counts rows r < i whose suffix is preceded by exactly the text triple
t. K3 is folded into the stored checkpoints, so a step is: one record
gather, one in-record checkpoint select, and two 256-lane prefix
counts on the VPU.

Chain structure for a uniform pattern length L with a depth-d k-mer
start: p = (L - d) % 3 single steps (1-step lattice, one gather each —
the 1-step lattice stays resident for locate anyway) followed by
(L - d - p) / 3 triple steps. Lanes whose ep spills past the gathered
record's 256-row window (interval wider than 256, or a boundary
straddle) are flagged stragglers and re-run on the always-correct
two-gather 1-step path, compacted (same fixup as search2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bwtpu.kernels import common
from bwtpu.kernels.search2 import _fixup_stragglers

BLOCK3 = 256
LOG2_BLOCK3 = 8
OCC3_CODE0 = 64


def occ3_pair_from_record(rec, t, sp, ep):
    """fold + Occ3-prefix counts at sp and ep from the record of
    block sp >> 8.

    rec: (B, 128) int32 gathered records; t: (B,) triple codes 0..63;
    sp, ep: (B,) int32 rows. Returns (sp', ep', strag) where strag
    flags lanes whose ep lies past the record's 256-row window (their
    ep' is garbage; caller re-runs them on the 1-step path).
    """
    fold = common.select_lane(rec[:, :OCC3_CODE0], t, OCC3_CODE0)
    # unpack 256 row codes (one byte each, LSB-first) and match against t
    rep = jnp.repeat(rec[:, OCC3_CODE0:], 4, axis=1)  # (B, 256)
    shifts = (8 * (np.arange(BLOCK3) % 4)).astype(np.int32)
    codes = (rep >> shifts) & 0xFF
    match = codes == t[:, None]
    idx = np.arange(BLOCK3, dtype=np.int32)
    msp = sp & (BLOCK3 - 1)
    mep = ep - ((sp >> LOG2_BLOCK3) << LOG2_BLOCK3)
    cnt_sp = jnp.sum(match & (idx[None, :] < msp[:, None]), axis=1)
    cnt_ep = jnp.sum(match & (idx[None, :] < mep[:, None]), axis=1)
    strag = mep > BLOCK3
    return (
        (fold + cnt_sp).astype(jnp.int32),
        (fold + cnt_ep).astype(jnp.int32),
        strag,
    )


@partial(jax.jit, static_argnames=("L", "d"))
def backward_search3_uniform(
    lattice: jnp.ndarray,  # int32[n_blocks+1, 32]   1-step records
    lattice3: jnp.ndarray,  # int32[n_blocks3+1, 128] 3-step records
    C: jnp.ndarray,  # int32[8]
    dollar_row: jnp.ndarray,  # int32
    kmer_table: jnp.ndarray,  # int32[4^d, 2]
    codes: jnp.ndarray,  # int32[B, L] base codes (full width = length L)
    amb: jnp.ndarray,  # int32[B, L] ambiguity mask
    L: int,
    d: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact backward search of B patterns, all exactly length L (static).

    Requires d >= 1 (a k-mer start table); returns (sp, ep, overflow)
    with the same contract as search2.backward_search_ra.
    """
    assert d >= 1 and L >= d, (L, d)
    B = codes.shape[0]

    # k-mer start over the last d bases (one row gather).
    weights = (4 ** np.arange(d - 1, -1, -1, dtype=np.int64)).astype(np.int32)
    key = jnp.sum(codes[:, L - d :] * weights[None, :], axis=1)
    start = jnp.take(kmer_table, key, axis=0)
    amb_tail = jnp.sum(amb[:, L - d :], axis=1) > 0
    sp0 = jnp.where(amb_tail, 0, start[:, 0])
    ep0 = jnp.where(amb_tail, 0, start[:, 1])

    chain = L - d
    p = chain % 3
    strag = jnp.zeros(B, dtype=bool)

    # p phase singles at static positions L-d-1 .. L-d-p (1-step records)
    sp, ep = sp0, ep0
    for s in range(p):
        pos = L - d - 1 - s
        c = codes[:, pos]
        a = amb[:, pos]
        rec = jnp.take(lattice, sp >> 7, axis=0)
        o_sp, o_ep, s1 = common.occ_pair_from_record(rec, dollar_row, c, sp, ep)
        cbase = common.select_scalar_table(C, c + 1, 8)
        sp = jnp.where(a == 1, 0, cbase + o_sp)
        ep = jnp.where(a == 1, 0, cbase + o_ep)
        strag = strag | s1

    # triple codes for the remaining chain, leftmost group first:
    # group g covers pattern positions [3g, 3g+3); triple step t uses
    # group T3-1-t (right-to-left).
    T3 = (chain - p) // 3
    if T3 > 0:
        region = codes[:, : 3 * T3].reshape(B, T3, 3)
        w3 = np.array([16, 4, 1], dtype=np.int32)
        t_all = jnp.sum(region * w3[None, None, :], axis=2)  # (B, T3)
        a_all = (
            jnp.sum(amb[:, : 3 * T3].reshape(B, T3, 3), axis=2) > 0
        )  # (B, T3)

        def step(t, state):
            sp, ep, strag = state
            g = T3 - 1 - t
            t3 = jax.lax.dynamic_slice_in_dim(t_all, g, 1, axis=1)[:, 0]
            a3 = jax.lax.dynamic_slice_in_dim(a_all, g, 1, axis=1)[:, 0]
            rec = jnp.take(lattice3, sp >> LOG2_BLOCK3, axis=0)
            sp_new, ep_new, s3 = occ3_pair_from_record(rec, t3, sp, ep)
            sp_new = jnp.where(a3, 0, sp_new)
            ep_new = jnp.where(a3, 0, ep_new)
            return sp_new, ep_new, strag | s3

        sp, ep, strag = jax.lax.fori_loop(0, T3, step, (sp, ep, strag))

    lens = jnp.full(B, L, jnp.int32)
    return _fixup_stragglers(
        lattice, C, dollar_row, kmer_table, codes, amb, lens,
        sp0, ep0, sp, ep, strag, d,
    )
