"""Pallas/Mosaic fused kernels for the FM-index hot loops.

Division of labor (docs/DESIGN.md): the data-dependent 64 B record
gathers are fastest through XLA's native gather — measured ~30 ns/row
vs >=157 ns/row for any in-kernel Pallas formulation — so the gathers
stay in XLA, and Pallas fuses everything AROUND them on-chip:

- search_step: both bounds' checkpoint select + SWAR in-block rank +
  C[] add + ambiguity/active masking, one VPU pass per gathered record
  pair (SURVEY.md §7.3: "rank ... fused on-chip");
- locate_step: SA-sample mark test + mark rank + LF-mapping, fused;
- verify_nm: bit-phase alignment + XOR + popcount mismatch counting.

Each kernel is the bit-exact twin of the jnp formulation in
common/search2/locate/verify2 (asserted in tests); the engine selects
the backend per call. Kernels run in interpret mode off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 1024  # rows per grid step; 1-D int32 operands are XLA-tiled
# T(1024), so 1-D block shapes must be 1024-aligned (Mosaic verifies
# operand layouts against XLA's).
# NOTE: no module-level jnp/np array constants — a Pallas kernel may not
# capture array constants from its closure; index vectors are built with
# broadcasted_iota inside the kernel.


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _pad_rows(x, mult):
    r = x.shape[0]
    pad = (-r) % mult
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def _popcount(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _swar_rank(words_u32, c, m):
    """Count of base c among first m bases; words (R, 8), c/m (R,)."""
    pattern = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[:, None]
    y = words_u32 ^ pattern
    match = ~(y | (y >> 1)) & jnp.uint32(0x55555555)
    k16 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) * 16
    nb = jnp.clip(m[:, None] - k16, 0, 16).astype(jnp.uint32)
    mask = jnp.where(nb >= 16, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << (2 * nb)) - 1)
    return jnp.sum(_popcount(match & mask), axis=-1).astype(jnp.int32)


def _select4(rec, idx):
    """rec[:, idx] for idx in 0..3 without a gather (4-way select)."""
    out = rec[:, 0]
    for v in (1, 2, 3):
        out = jnp.where(idx == v, rec[:, v], out)
    return out


def _occ_from_record(rec, c, i, dollar_row):
    """Occ(c, i) given the gathered record of block i>>7 (R rows)."""
    m = i & 127
    ck = _select4(rec, c)
    words = rec[:, 4:12].astype(jnp.uint32)
    inblk = _swar_rank(words, c, m)
    corr = ((c == 0) & ((dollar_row >> 7) == (i >> 7)) & (dollar_row < i)).astype(
        jnp.int32
    )
    return ck + inblk - corr


# ---------------------------------------------------------------------------
# search step
# ---------------------------------------------------------------------------


def _search_step_kernel(scalars_ref, rec_sp_ref, rec_ep_ref, c_ref, amb_ref,
                        act_ref, sp_ref, ep_ref, sp_out, ep_out):
    dollar = scalars_ref[0]
    sp, ep = sp_ref[:], ep_ref[:]
    c = c_ref[:]
    cbase = jnp.where(
        c == 0, scalars_ref[1],
        jnp.where(c == 1, scalars_ref[2],
                  jnp.where(c == 2, scalars_ref[3], scalars_ref[4])),
    )
    o_sp = _occ_from_record(rec_sp_ref[:], c, sp, dollar)
    o_ep = _occ_from_record(rec_ep_ref[:], c, ep, dollar)
    amb = amb_ref[:]
    sp_new = jnp.where(amb == 1, 0, cbase + o_sp)
    ep_new = jnp.where(amb == 1, 0, cbase + o_ep)
    act = act_ref[:]
    sp_out[:] = jnp.where(act == 1, sp_new, sp)
    ep_out[:] = jnp.where(act == 1, ep_new, ep)


def search_step_pallas(rec_sp, rec_ep, c, amb, active, sp, ep, C8, dollar_row):
    """Fused backward-search interval update for R pre-gathered records."""
    R = sp.shape[0]
    args = [rec_sp, rec_ep, c, amb, active.astype(jnp.int32), sp, ep]
    args = [_pad_rows(a, LANE) for a in args]
    Rp = args[0].shape[0]
    scalars = jnp.concatenate(
        [dollar_row.reshape(1), C8[1:5].astype(jnp.int32)]
    )
    grid = (Rp // LANE,)
    rec_spec = pl.BlockSpec((LANE, 32), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((LANE,), lambda i, s: (i,), memory_space=pltpu.VMEM)
    sp2, ep2 = pl.pallas_call(
        _search_step_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[rec_spec, rec_spec] + [vec_spec] * 5,
            out_specs=[vec_spec, vec_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Rp,), jnp.int32),
            jax.ShapeDtypeStruct((Rp,), jnp.int32),
        ],
        interpret=_interpret(),
    )(scalars, *args)
    return sp2[:R], ep2[:R]


def _search_step1_kernel(scalars_ref, rec_ref, c_ref, amb_ref, act_ref,
                         sp_ref, ep_ref, sp_out, ep_out, strag_out):
    dollar = scalars_ref[0]
    sp, ep = sp_ref[:], ep_ref[:]
    c = c_ref[:]
    rec = rec_ref[:]
    cbase = jnp.where(
        c == 0, scalars_ref[1],
        jnp.where(c == 1, scalars_ref[2],
                  jnp.where(c == 2, scalars_ref[3], scalars_ref[4])),
    )
    j = sp >> 7
    jep = ep >> 7
    ck_j = _select4(rec, c)
    bwt_j = rec[:, 4:12].astype(jnp.uint32)
    o_sp = ck_j + _swar_rank(bwt_j, c, sp & 127)
    o_sp -= ((c == 0) & ((dollar >> 7) == j) & (dollar < sp)).astype(jnp.int32)
    mep = ep & 127
    o_ep_j = ck_j + _swar_rank(bwt_j, c, mep)
    ck_n = rec[:, 17]
    for v in (1, 2, 3):
        ck_n = jnp.where(c == v, rec[:, 17 + v], ck_n)
    o_ep_n = ck_n + _swar_rank(rec[:, 21:29].astype(jnp.uint32), c, mep)
    o_ep = jnp.where(jep == j, o_ep_j, o_ep_n)
    o_ep -= ((c == 0) & ((dollar >> 7) == jep) & (dollar < ep)).astype(jnp.int32)

    amb = amb_ref[:]
    sp_new = jnp.where(amb == 1, 0, cbase + o_sp)
    ep_new = jnp.where(amb == 1, 0, cbase + o_ep)
    act = act_ref[:]
    sp_out[:] = jnp.where(act == 1, sp_new, sp)
    ep_out[:] = jnp.where(act == 1, ep_new, ep)
    strag_out[:] = ((act == 1) & (jep > j + 1)).astype(jnp.int32)


def search_step1_pallas(rec, c, amb, active, sp, ep, C8, dollar_row):
    """Fused single-record search step; returns (sp2, ep2, strag int32)."""
    R = sp.shape[0]
    args = [rec, c, amb, active.astype(jnp.int32), sp, ep]
    args = [_pad_rows(a, LANE) for a in args]
    Rp = args[1].shape[0]
    scalars = jnp.concatenate([dollar_row.reshape(1), C8[1:5].astype(jnp.int32)])
    rec_spec = pl.BlockSpec((LANE, 32), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((LANE,), lambda i, s: (i,), memory_space=pltpu.VMEM)
    sp2, ep2, strag = pl.pallas_call(
        _search_step1_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Rp // LANE,),
            in_specs=[rec_spec] + [vec_spec] * 5,
            out_specs=[vec_spec] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((Rp,), jnp.int32)] * 3,
        interpret=_interpret(),
    )(scalars, *args)
    return sp2[:R], ep2[:R], strag[:R]


# ---------------------------------------------------------------------------
# locate step
# ---------------------------------------------------------------------------


def _locate_step_kernel(scalars_ref, rec_ref, r_ref, done_ref,
                        rank_out_ref, steps_out_ref,
                        r_out, done_out, rank_out2, steps_out2):
    dollar = scalars_ref[0]
    t = scalars_ref[5]
    rec = rec_ref[:]
    r = r_ref[:]
    m = r & 127
    done = done_ref[:]

    # mark bit + in-block mark rank (words 12..15)
    words = rec[:, 12:16].astype(jnp.uint32)
    wsel = m >> 5
    bit_word = words[:, 0]
    for v in (1, 2, 3):
        bit_word = jnp.where(wsel == v, words[:, v], bit_word)
    bit = (bit_word >> (m & 31).astype(jnp.uint32)) & 1
    k32 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1) * 32
    nbits = jnp.clip(m[:, None] - k32, 0, 32).astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    masks = jnp.where(nbits >= 32, full, (jnp.uint32(1) << nbits) - 1)
    inrank = jnp.sum(_popcount(words & masks), axis=1)

    found = (bit == 1) & (done == 0)
    rank = rec[:, 16] + inrank
    rank_out2[:] = jnp.where(found, rank, rank_out_ref[:])
    steps_out2[:] = jnp.where(found, t, steps_out_ref[:])
    done_new = jnp.where(found, 1, done)
    done_out[:] = done_new

    # LF step from the same record
    bw = rec[:, 4:12].astype(jnp.uint32)
    widx = m >> 4
    word = bw[:, 0]
    for v in range(1, 8):
        word = jnp.where(widx == v, bw[:, v], word)
    c = ((word >> (2 * (m & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)
    ck = _select4(rec, c)
    inblk = _swar_rank(bw, c, m)
    corr = ((c == 0) & ((dollar >> 7) == (r >> 7)) & (dollar < r)).astype(jnp.int32)
    cbase = jnp.where(
        c == 0, scalars_ref[1],
        jnp.where(c == 1, scalars_ref[2],
                  jnp.where(c == 2, scalars_ref[3], scalars_ref[4])),
    )
    lf = cbase + ck + inblk - corr
    r_out[:] = jnp.where(done_new == 1, r, lf)


def locate_step_pallas(rec, r, done, rank_out, steps_out, t, C8,
                       dollar_row):
    R = r.shape[0]
    args = [rec, r, done.astype(jnp.int32), rank_out, steps_out]
    args = [_pad_rows(a, LANE) for a in args]
    Rp = args[1].shape[0]
    scalars = jnp.concatenate(
        [dollar_row.reshape(1), C8[1:5].astype(jnp.int32),
         jnp.asarray(t, jnp.int32).reshape(1)]
    )
    rec_spec = pl.BlockSpec((LANE, 32), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((LANE,), lambda i, s: (i,), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _locate_step_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Rp // LANE,),
            in_specs=[rec_spec] + [vec_spec] * 4,
            out_specs=[vec_spec] * 4,
        ),
        out_shape=[jax.ShapeDtypeStruct((Rp,), jnp.int32)] * 4,
        interpret=_interpret(),
    )(scalars, *args)
    r2, done2, rank2, steps2 = outs
    return r2[:R], done2[:R] == 1, rank2[:R], steps2[:R]


# ---------------------------------------------------------------------------
# verify
# ---------------------------------------------------------------------------


def _verify_kernel(rows_ref, rw_ref, ab_ref, lm_ref, ob_ref, inr_ref, nm_ref):
    W = rw_ref.shape[1]
    rows = rows_ref[:]
    ob = ob_ref[:].astype(jnp.uint32)[:, None]
    lo = rows[:, :W].astype(jnp.uint32)
    hi = rows[:, 1 : W + 1].astype(jnp.uint32)
    window = (lo >> ob) | jnp.where(ob == 0, jnp.uint32(0), hi << (32 - ob))
    x = window ^ rw_ref[:].astype(jnp.uint32)
    pair = (x | (x >> 1)) & jnp.uint32(0x55555555)
    pair = (pair | ab_ref[:].astype(jnp.uint32)) & lm_ref[:].astype(jnp.uint32)
    nm = jnp.sum(_popcount(pair), axis=1).astype(jnp.int32)
    nm_ref[:] = jnp.where(inr_ref[:] == 1, nm, 255)


def verify_nm_pallas(rows, read_words, amb_bits, len_mask, ob, in_range):
    """Fused mismatch count for pre-gathered text window rows."""
    R = rows.shape[0]
    Wr = rows.shape[1]
    W = read_words.shape[1]
    args = [rows, read_words, amb_bits, len_mask, ob, in_range.astype(jnp.int32)]
    args = [_pad_rows(a, LANE) for a in args]
    Rp = args[0].shape[0]
    nm = pl.pallas_call(
        _verify_kernel,
        grid=(Rp // LANE,),
        in_specs=[
            pl.BlockSpec((LANE, Wr), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANE,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp,), jnp.int32),
        interpret=_interpret(),
    )(*args)
    return nm[:R]
