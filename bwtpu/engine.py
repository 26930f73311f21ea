"""Alignment engine — the jit'd batch pipeline (layer L5, component C15).

The reference drives one interpreted loop per read (SURVEY.md §3.2); the
engine is its TPU-native re-design: a pure function
  align : (index lattices, read batch int32[B, L]) -> hits int32[...]
compiled once with jax.jit (SURVEY.md §7.0), processing both strands of
thousands of reads per call. Host code does only encoding, batching and
hit assembly.

Single-process multi-shard here (stacked shard axis + vmap); the
multi-host/multi-device path wraps the same per-shard function in
shard_map (bwtpu.dist).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bwtpu import dna
from bwtpu.config import EngineConfig
from bwtpu.golden import Hit, sort_hits
from bwtpu.index import FMIndex, ShardManifest
from bwtpu.io import Read
from bwtpu.kernels import common
from bwtpu.kernels.locate import locate_rows
from bwtpu.kernels.search import backward_search, interval_rows
from bwtpu.kernels.verify import (NM_INVALID, dedupe_sorted, seed_layout,
                                  verify_candidates)

log = logging.getLogger(__name__)


def default_backend() -> str:
    """Pallas on real TPU, jnp twin elsewhere (CPU tests, interpret)."""
    try:
        plat = jax.devices()[0].platform
    except RuntimeError:
        plat = "cpu"
    return "pallas" if plat == "tpu" else "jnp"


@dataclasses.dataclass
class DeviceIndexSet:
    """All shards' lattices stacked on a leading shard axis (padded to a
    common shape so one compiled function serves every shard)."""

    lattice: jnp.ndarray  # int32[S, n_blocks_max+1, 16]
    mark_rank_ck: jnp.ndarray  # int32[S, n_blocks_max+1]
    ssa: jnp.ndarray  # int32[S, ssa_max]
    C: jnp.ndarray  # int32[S, 8]
    dollar_row: jnp.ndarray  # int32[S]
    n: jnp.ndarray  # int32[S]
    text_len: jnp.ndarray  # int32[S]
    text_packed: jnp.ndarray  # int32[S, words_max]
    shard_offsets: np.ndarray  # int64[S] host-side (global resolve)

    @property
    def n_shards(self) -> int:
        return self.lattice.shape[0]


def upload_index(shards: list[FMIndex], device=None) -> DeviceIndexSet:
    def pad_stack(arrs, pad_to=None):
        if pad_to is None:
            pad_to = max(a.shape[0] for a in arrs)
        out = np.zeros((len(arrs), pad_to) + arrs[0].shape[1:], dtype=arrs[0].dtype)
        for i, a in enumerate(arrs):
            out[i, : a.shape[0]] = a
        return out

    put = partial(jax.device_put, device=device)
    return DeviceIndexSet(
        lattice=put(pad_stack([s.search_lattice for s in shards])),
        mark_rank_ck=put(pad_stack([s.mark_rank_ck for s in shards])),
        ssa=put(pad_stack([s.ssa for s in shards])),
        C=put(np.stack([s.C for s in shards])),
        dollar_row=put(np.array([s.dollar_row for s in shards], dtype=np.int32)),
        n=put(np.array([s.n for s in shards], dtype=np.int32)),
        text_len=put(np.array([s.text_len for s in shards], dtype=np.int32)),
        text_packed=put(pad_stack([s.text_packed for s in shards])),
        shard_offsets=np.array([s.shard_offset for s in shards], dtype=np.int64),
    )


# ---------------------------------------------------------------------------
# Device-side pipelines (pure functions of one shard's lattices + batch)
# ---------------------------------------------------------------------------


def exact_pipeline(
    lattice, mark_rank_ck, ssa, C, dollar_row, n, codes, amb, lens,
    *, max_hits: int, sa_rate: int, backend: str,
):
    """Exact path (BASELINE config 1+3): search -> expand -> locate.

    codes/amb: int32[B2, L] (both strands already stacked); returns
    (pos int32[B2, max_hits], valid bool[B2, max_hits], overflow[B2]).
    """
    sp, ep = backward_search(
        lattice, C, dollar_row, n, codes, amb, lens, backend=backend
    )
    rows, valid, overflow = interval_rows(sp, ep, max_hits)
    B2, H = rows.shape
    pos = locate_rows(
        lattice, mark_rank_ck, ssa, C, dollar_row,
        rows.reshape(-1), valid.reshape(-1), sa_rate, backend=backend,
    ).reshape(B2, H)
    return pos, valid, overflow


def inexact_pipeline(
    lattice, mark_rank_ck, ssa, C, dollar_row, n, text_len, text_packed,
    codes, amb, lens,
    *, k: int, max_loc: int, sa_rate: int, backend: str,
):
    """Inexact path (config 2): pigeonhole seed-and-extend (SURVEY.md §7.4).

    Returns (cand int32[B2, Ct], nm int32[B2, Ct], valid bool[B2, Ct],
    overflow int32[B2]) where Ct = (k+1) * max_loc and valid marks
    candidates with nm <= k.
    """
    B2, L = codes.shape
    n_seeds = k + 1
    seed_cap = -(-L // n_seeds)  # max seed length over any split

    # Per-read dynamic seed layout (near-equal split of each read's len).
    q, r = lens // n_seeds, lens % n_seeds
    s_idx = np.arange(n_seeds, dtype=np.int32)[None, :]  # (1, S)
    seed_off = s_idx * q[:, None] + jnp.minimum(s_idx, r[:, None])  # (B2, S)
    seed_len = q[:, None] + (s_idx < r[:, None])  # (B2, S)

    # Extract seeds, left-aligned into (B2 * S, seed_cap).
    i_idx = np.arange(seed_cap, dtype=np.int32)[None, None, :]
    src = seed_off[:, :, None] + i_idx  # (B2, S, cap)
    src_safe = jnp.clip(src, 0, L - 1)
    seed_codes = jnp.take_along_axis(
        codes[:, None, :].repeat(n_seeds, axis=1), src_safe, axis=2
    )
    seed_amb = jnp.take_along_axis(
        amb[:, None, :].repeat(n_seeds, axis=1), src_safe, axis=2
    )
    seed_codes = seed_codes.reshape(B2 * n_seeds, seed_cap)
    seed_amb = seed_amb.reshape(B2 * n_seeds, seed_cap)
    seed_lens = seed_len.reshape(B2 * n_seeds)

    sp, ep = backward_search(
        lattice, C, dollar_row, n, seed_codes, seed_amb, seed_lens,
        backend=backend,
    )
    # Degenerate empty seeds (read shorter than n_seeds) match nothing.
    empty = seed_lens == 0
    sp = jnp.where(empty, 0, sp)
    ep = jnp.where(empty, 0, ep)

    rows, rvalid, overflow_s = interval_rows(sp, ep, max_loc)
    spos = locate_rows(
        lattice, mark_rank_ck, ssa, C, dollar_row,
        rows.reshape(-1), rvalid.reshape(-1), sa_rate, backend=backend,
    ).reshape(B2 * n_seeds, max_loc)

    # Candidate read-start = seed position - seed offset.
    cand = spos - seed_off.reshape(B2 * n_seeds)[:, None]
    cand = cand.reshape(B2, n_seeds * max_loc)
    cvalid = rvalid.reshape(B2, n_seeds * max_loc)
    overflow = overflow_s.reshape(B2, n_seeds).sum(axis=1)

    cand, cvalid = dedupe_sorted(cand, cvalid)
    nm = verify_candidates(
        text_packed, text_len, cand, cvalid, codes, amb, lens, backend=backend
    )
    hit_valid = nm <= k
    return cand, nm, hit_valid, overflow


# ---------------------------------------------------------------------------
# Engine (host orchestration)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BatchStats:
    reads: int = 0
    hits: int = 0
    overflow_reads: int = 0
    device_s: float = 0.0
    host_s: float = 0.0


class Engine:
    """Single-process alignment engine over one or more index shards."""

    def __init__(
        self,
        shards: list[FMIndex],
        manifest: ShardManifest | None = None,
        backend: str | None = None,
        device=None,
    ):
        self.shards = shards
        self.manifest = manifest
        self.config = shards[0].config
        self.backend = backend or default_backend()
        self.dev = upload_index(shards, device=device)
        self.stats = BatchStats()
        self._compiled: dict = {}  # (kind, params) -> jitted fn

    # -- compiled entry points (vmapped over the stacked shard axis) --

    def _build_exact(self, max_hits: int):
        sa_rate = self.config.sa_rate
        backend = self.backend

        def per_shard(lattice, mark_ck, ssa, C, dollar, n, codes, amb, lens):
            return exact_pipeline(
                lattice, mark_ck, ssa, C, dollar, n, codes, amb, lens,
                max_hits=max_hits, sa_rate=sa_rate, backend=backend,
            )

        vm = jax.vmap(per_shard, in_axes=(0, 0, 0, 0, 0, 0, None, None, None))
        return jax.jit(vm)

    def _build_inexact(self, k: int, max_loc: int):
        sa_rate = self.config.sa_rate
        backend = self.backend

        def per_shard(
            lattice, mark_ck, ssa, C, dollar, n, tlen, tpacked, codes, amb, lens
        ):
            return inexact_pipeline(
                lattice, mark_ck, ssa, C, dollar, n, tlen, tpacked,
                codes, amb, lens,
                k=k, max_loc=max_loc, sa_rate=sa_rate, backend=backend,
            )

        vm = jax.vmap(
            per_shard, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None)
        )
        return jax.jit(vm)

    # -- host-side batch prep --

    def encode_batch(
        self, reads: list[Read], pad_to: int | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
        """Encode + pad reads; returns (codes[B2,L], amb[B2,L], lens[B2], B)
        with both strands stacked: rows [0,B) forward, [B,2B) revcomp."""
        B = len(reads)
        Bp = pad_to or B
        L = max(self.config.read_len, max((len(r.seq) for r in reads), default=1))
        codes = np.zeros((Bp, L), dtype=np.int32)
        amb = np.zeros((Bp, L), dtype=np.int32)
        lens = np.zeros(Bp, dtype=np.int32)
        if reads and all(len(r.seq) == L for r in reads):
            # uniform-length fast path: one bulk decode
            c, m = dna.encode_with_mask("".join(r.seq for r in reads))
            codes[:B] = c.reshape(B, L)
            amb[:B] = m.reshape(B, L)
            lens[:B] = L
        else:
            for i, r in enumerate(reads):
                c, m = dna.encode_with_mask(r.seq)
                codes[i, : len(c)] = c
                amb[i, : len(c)] = m
                lens[i] = len(c)
        codes = jnp.asarray(codes)
        amb = jnp.asarray(amb)
        lens = jnp.asarray(lens)
        rc, ra = common.reverse_complement_reads(codes, amb, lens)
        codes2 = jnp.concatenate([codes, rc])
        amb2 = jnp.concatenate([amb, ra])
        lens2 = jnp.concatenate([lens, lens])
        return codes2, amb2, lens2, Bp

    # -- public API --

    def align_batch(self, reads: list[Read], k: int | None = None) -> list[list[Hit]]:
        """Align a batch; returns the full deduped sorted hit list per
        read, in global (concatenated-genome) coordinates."""
        if not reads:
            return []
        k = self.config.k if k is None else k
        t0 = time.perf_counter()
        codes2, amb2, lens2, B = self.encode_batch(reads)
        d = self.dev

        if k == 0:
            key = ("exact", self.config.max_hits)
            if key not in self._compiled:
                self._compiled[key] = self._build_exact(self.config.max_hits)
            pos, valid, overflow = self._compiled[key](
                d.lattice, d.mark_rank_ck, d.ssa, d.C, d.dollar_row, d.n,
                codes2, amb2, lens2,
            )
            pos, valid, overflow = jax.block_until_ready((pos, valid, overflow))
            t1 = time.perf_counter()
            nm = None
        else:
            key = ("inexact", k, self.config.max_cand)
            if key not in self._compiled:
                self._compiled[key] = self._build_inexact(k, self.config.max_cand)
            pos, nm, valid, overflow = self._compiled[key](
                d.lattice, d.mark_rank_ck, d.ssa, d.C, d.dollar_row, d.n,
                d.text_len, d.text_packed, codes2, amb2, lens2,
            )
            pos, nm, valid, overflow = jax.block_until_ready(
                (pos, nm, valid, overflow)
            )
            nm = np.asarray(nm)
            t1 = time.perf_counter()

        pos = np.asarray(pos)  # (S, 2B, H)
        valid = np.asarray(valid)
        overflow = np.asarray(overflow)
        S = pos.shape[0]
        text_lens = np.asarray(jax.device_get(d.text_len))

        hits: list[list[Hit]] = [[] for _ in range(len(reads))]
        n_over = 0
        for s in range(S):
            off = int(d.shard_offsets[s])
            tl = int(text_lens[s])
            for row in range(2 * B):
                b = row % B
                if b >= len(reads):
                    continue
                strand = "+" if row < B else "-"
                vv = valid[s, row]
                if not vv.any():
                    continue
                ps = pos[s, row][vv]
                nms = nm[s, row][vv] if nm is not None else np.zeros(len(ps), int)
                rl = len(reads[b].seq)
                for p, m in zip(ps, nms):
                    p = int(p)
                    if p < 0 or p + rl > tl:
                        continue  # locate of a padded/edge row
                    hits[b].append(Hit(nm=int(m), strand=strand, pos=off + p))
        n_over = int((overflow.sum(axis=0) > 0).sum())
        if n_over:
            log.warning(
                "align_batch: %d/%d read-strand rows overflowed hit/candidate "
                "capacity (max_hits=%d, max_cand=%d); results for those reads "
                "may be incomplete — raise the caps",
                n_over, 2 * B, self.config.max_hits, self.config.max_cand,
            )

        # Cross-shard dedupe (overlap regions) keeping min nm, then the
        # pinned report order.
        out = []
        for b in range(len(reads)):
            best: dict[tuple[int, str], int] = {}
            for h in hits[b]:
                key = (h.pos, h.strand)
                if key not in best or h.nm < best[key]:
                    best[key] = h.nm
            out.append(
                sort_hits(Hit(nm=m, strand=st, pos=p) for (p, st), m in best.items())
            )
        t2 = time.perf_counter()
        self.stats.reads += len(reads)
        self.stats.hits += sum(len(h) for h in out)
        self.stats.overflow_reads += n_over
        self.stats.device_s += t1 - t0
        self.stats.host_s += t2 - t1
        return out

    def align_all(
        self, reads: list[Read], k: int | None = None, batch_size: int | None = None
    ) -> list[list[Hit]]:
        bs = batch_size or self.config.batch_size
        out: list[list[Hit]] = []
        for i in range(0, len(reads), bs):
            out.extend(self.align_batch(reads[i : i + bs], k=k))
        return out
