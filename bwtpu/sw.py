"""Banded Smith–Waterman rescoring (component C19, SURVEY.md §2.1).

The reference's optional local-alignment extension scoring. Not needed
for parity (reported output is mismatch count, BASELINE.json), but
provided for capability completeness: given candidate windows from
seed-and-extend, compute a local alignment score tolerant of small
indels that pure Hamming verification would reject.

TPU-native formulation: the DP runs as a lax.fori over read positions
with the (2*band+1)-wide anti-band kept in registers, vectorized over
the candidate batch (thousands of lanes per step); the within-row gap
dependency is an unrolled prefix-max over the small band width. All
int32, no gathers in the loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10**6)


@partial(jax.jit, static_argnames=("band", "match", "mismatch", "gap"))
def sw_score_batch(
    text: jnp.ndarray,  # int32[B, Lt] text window codes
    text_lens: jnp.ndarray,  # int32[B]
    reads: jnp.ndarray,  # int32[B, L] read codes (left-aligned)
    read_lens: jnp.ndarray,  # int32[B]
    band: int = 8,
    match: int = 2,
    mismatch: int = -3,
    gap: int = -4,
) -> jnp.ndarray:
    """Best local-alignment score per lane, banded around the diagonal.

    Band coordinate w in [0, 2*band] maps text position j = i + w - band
    for read position i (both 1-based in DP terms).
    """
    B, L = reads.shape
    Lt = text.shape[1]
    W = 2 * band + 1

    def step(i, carry):
        prev, best = carry  # prev: H[i-1][.] in band coords of row i-1
        # read char at row i (1-based) per lane
        rc = jnp.take_along_axis(reads, jnp.full((B, 1), i - 1), axis=1)[:, 0]
        in_read = i <= read_lens
        # text index for each band cell: j = i + w - band (1-based)
        w_idx = np.arange(W, dtype=np.int32)[None, :]
        j = i + w_idx - band  # (B broadcast, W)
        j_ok = (j >= 1) & (j <= text_lens[:, None])
        tc = jnp.take_along_axis(
            text, jnp.broadcast_to(jnp.clip(j - 1, 0, Lt - 1), (B, W)), axis=1
        )
        s = jnp.where(tc == rc[:, None], match, mismatch)
        # Convention: any neighbor cell outside the band/text grid
        # contributes 0 (the local-alignment identity) — mirrored
        # exactly by sw_score_reference.
        # H[i-1][j-1] is prev at the SAME band slot w (the band moves
        # with the row, so the diagonal stays slot-aligned);
        # H[i-1][j] is prev at slot w+1.
        diag = prev
        up = jnp.concatenate([prev[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        cur = jnp.maximum(0, jnp.maximum(diag + s, up + gap))
        cur = jnp.where(j_ok & in_read[:, None], cur, 0)
        # left dependency within the row: unrolled prefix pass (W small)
        for w in range(1, W):
            cand = jnp.maximum(cur[:, w - 1] + gap, 0)
            cur = cur.at[:, w].set(jnp.maximum(cur[:, w], cand))
        cur = jnp.where(j_ok & in_read[:, None], cur, 0)
        best = jnp.maximum(best, jnp.max(cur, axis=1))
        return cur, best

    prev0 = jnp.zeros((B, W), jnp.int32)
    best0 = jnp.zeros(B, jnp.int32)
    _, best = jax.lax.fori_loop(1, L + 1, step, (prev0, best0))
    return best


def sw_score_reference(text: str, read: str, band: int = 8, match: int = 2,
                       mismatch: int = -3, gap: int = -4) -> int:
    """Plain-Python banded SW (test oracle; same out-of-band = 0
    convention as sw_score_batch)."""
    Lt, L = len(text), len(read)
    H = {}

    def get(i, j):  # uncomputed/out-of-grid cells contribute 0
        return H.get((i, j), 0)

    best = 0
    for i in range(1, L + 1):
        for w in range(2 * band + 1):
            j = i + w - band
            if j < 1 or j > Lt:
                continue
            s = match if read[i - 1] == text[j - 1] else mismatch
            H[(i, j)] = max(
                0, get(i - 1, j - 1) + s, get(i - 1, j) + gap, get(i, j - 1) + gap
            )
            best = max(best, H[(i, j)])
    return best


def rescore_candidates(engine, reads, hits, band: int = 8, flank: int = 8):
    """Rescore each hit's window with banded SW; returns scores per hit.

    Host-side wrapper: gathers text windows (with `flank` extra bases
    each side so indel-shifted alignments fit in the band) from the
    engine's shards and runs one batched device call. Fully vectorized
    over hits — host loops run per READ (encoding) and per SHARD
    (window decode), never per hit, so production hit volumes stay
    NumPy-bound (VERDICT r1 weak #8).
    """
    from bwtpu import dna

    shards = engine.shards
    starts = np.array([sh.shard_offset for sh in shards], dtype=np.int64)
    ends = starts + np.array([sh.text_len for sh in shards], dtype=np.int64)

    owners, pos_l, rev_l, ri_l = [], [], [], []
    for ri, hlist in enumerate(hits):
        for hi, h in enumerate(hlist):
            owners.append((ri, hi))
            pos_l.append(h.pos)
            rev_l.append(h.strand == "-")
            ri_l.append(ri)
    if not owners:
        return {}
    pos = np.array(pos_l, dtype=np.int64)
    rev = np.array(rev_l, dtype=bool)
    ri_a = np.array(ri_l, dtype=np.int32)

    L = max(len(r.seq) for r in reads)
    rd_f = np.zeros((len(reads), L), np.int32)
    rd_r = np.zeros((len(reads), L), np.int32)
    rlen = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes, _ = dna.encode_with_mask(r.seq)
        rc, _ = dna.revcomp_codes(codes)
        rd_f[i, : len(codes)] = codes
        rd_r[i, : len(rc)] = rc
        rlen[i] = len(codes)

    # first shard containing each position: shard ends are increasing,
    # so it's the first end strictly beyond pos (overlap regions belong
    # to the earlier shard, matching the engine's emission)
    sid = np.searchsorted(ends, pos, side="right")
    lanes_rlen = rlen[ri_a]
    lo = np.maximum(0, pos - starts[sid] - flank)
    hi_ = np.minimum(ends[sid] - starts[sid], pos - starts[sid] + lanes_rlen + flank)
    tlen = (hi_ - lo).astype(np.int32)
    B, Lt = len(owners), int(tlen.max())
    text = np.zeros((B, Lt), np.int32)
    col = np.arange(Lt, dtype=np.int64)[None, :]
    for s, sh in enumerate(shards):
        m = sid == s
        if not m.any():
            continue
        words = sh.text_packed.view(np.uint32)
        idx = np.clip(lo[m][:, None] + col, 0, sh.text_len - 1)
        vals = ((words[idx >> 4] >> (2 * (idx & 15))) & 3).astype(np.int32)
        text[m] = np.where(col < tlen[m][:, None], vals, 0)

    rd = np.where(rev[:, None], rd_r[ri_a], rd_f[ri_a])
    scores = np.asarray(
        sw_score_batch(
            jnp.asarray(text), jnp.asarray(tlen),
            jnp.asarray(rd), jnp.asarray(lanes_rlen), band=band,
        )
    )
    return {owner: int(s) for owner, s in zip(owners, scores)}
