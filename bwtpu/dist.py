"""Distributed alignment: ('shard', 'data') mesh + ring rotation.

TPU-native re-design of the reference's master/worker distribution
(components C16-C18, SURVEY.md §2.3-2.4, §3.5, §7.5):

- The FM-index is interval-sharded: device (s, d) holds shard s's
  lattices (replicated along 'data'). Bacterial-scale genomes use
  n_shard == 1 (pure replication).
- Read batches are sharded over BOTH mesh axes — every device starts
  with its own slice — and ride a `lax.ppermute` ring around the
  'shard' axis, carrying their accumulating hit buffers with them
  (the ring-attention schedule applied to index shards instead of KV
  blocks, SURVEY.md §5.7). After S hops every read has met every
  shard and its hits have come home with it: nearest-neighbor ICI
  traffic only, no all-to-all, no gather at a master.
- Hits are tagged by the hit-buffer slot == shard id; the host resolves
  global int64 positions as shard_offset[slot] + local_pos (device
  arithmetic stays int32, SURVEY.md §7.2).

Multi-host: each host runs this same program under
`jax.distributed.initialize()`; 'data' spans hosts (each host ingests
its own read stream over DCN), 'shard' is laid out within hosts so ring
hops ride ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bwtpu.engine import (DeviceIndexSet, exact_pipeline, inexact_pipeline,
                          upload_index)
from bwtpu.golden import Hit, sort_hits
from bwtpu.index import FMIndex, ShardManifest


def make_mesh(n_shard: int, n_data: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_shard * n_data
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev_array = np.array(devices[:need]).reshape(n_shard, n_data)
    return Mesh(dev_array, ("shard", "data"))


def _ring_step_perm(S: int):
    return [(i, (i + 1) % S) for i in range(S)]


def build_ring_align(
    mesh: Mesh,
    *,
    k: int,
    max_hits: int,
    max_cand: int,
    sa_rate: int,
    backend: str = "jnp",
):
    """Compile the ring-rotation align step over the mesh.

    Returns fn(index_arrays..., codes, amb, lens) ->
      exact:   (pos [B, S, H], valid [B, S, H], overflow [B, S])
      inexact: (cand [B, S, Ct], nm [B, S, Ct], valid [B, S, Ct],
                overflow [B, S])
    where B is the global batch (both strands already stacked), S the
    shard count, and slot s of axis 1 holds hits against shard s.
    """
    S = mesh.shape["shard"]
    perm = _ring_step_perm(S)

    def fn(lattice, mark_ck, ssa, C, dollar, n, tlen, tpacked, codes, amb, lens):
        # locals: lattice (1, ...) — this device's shard; codes (b, L).
        lattice, mark_ck, ssa = lattice[0], mark_ck[0], ssa[0]
        C, dollar, n = C[0], dollar[0], n[0]
        tlen, tpacked = tlen[0], tpacked[0]
        my_shard = jax.lax.axis_index("shard")
        b = codes.shape[0]

        if k == 0:
            hits_pos = jnp.zeros((b, S, max_hits), jnp.int32)
            hits_valid = jnp.zeros((b, S, max_hits), jnp.bool_)
            over = jnp.zeros((b, S), jnp.int32)
            carry = (codes, amb, lens, hits_pos, hits_valid, over)

            def body(_, carry):
                codes, amb, lens, hp, hv, ov = carry
                pos, valid, overflow = exact_pipeline(
                    lattice, mark_ck, ssa, C, dollar, n, codes, amb, lens,
                    max_hits=max_hits, sa_rate=sa_rate, backend=backend,
                )
                hp = jax.lax.dynamic_update_index_in_dim(hp, pos, my_shard, 1)
                hv = jax.lax.dynamic_update_index_in_dim(hv, valid, my_shard, 1)
                ov = jax.lax.dynamic_update_index_in_dim(ov, overflow, my_shard, 1)
                return tuple(
                    jax.lax.ppermute(x, "shard", perm)
                    for x in (codes, amb, lens, hp, hv, ov)
                )

            codes, amb, lens, hp, hv, ov = jax.lax.fori_loop(0, S, body, carry)
            return hp, hv, ov
        else:
            Ct = (k + 1) * max_cand
            hc = jnp.zeros((b, S, Ct), jnp.int32)
            hn = jnp.full((b, S, Ct), 255, jnp.int32)
            hv0 = jnp.zeros((b, S, Ct), jnp.bool_)
            over = jnp.zeros((b, S), jnp.int32)
            carry = (codes, amb, lens, hc, hn, hv0, over)

            def body(_, carry):
                codes, amb, lens, hc, hn, hv, ov = carry
                cand, nm, valid, overflow = inexact_pipeline(
                    lattice, mark_ck, ssa, C, dollar, n, tlen, tpacked,
                    codes, amb, lens,
                    k=k, max_loc=max_cand, sa_rate=sa_rate, backend=backend,
                )
                hc = jax.lax.dynamic_update_index_in_dim(hc, cand, my_shard, 1)
                hn = jax.lax.dynamic_update_index_in_dim(hn, nm, my_shard, 1)
                hv = jax.lax.dynamic_update_index_in_dim(hv, valid, my_shard, 1)
                ov = jax.lax.dynamic_update_index_in_dim(ov, overflow, my_shard, 1)
                return tuple(
                    jax.lax.ppermute(x, "shard", perm)
                    for x in (codes, amb, lens, hc, hn, hv, ov)
                )

            codes, amb, lens, hc, hn, hv, ov = jax.lax.fori_loop(0, S, body, carry)
            return hc, hn, hv, ov

    idx_specs = (P("shard"),) * 8
    in_specs = idx_specs + (
        P(("data", "shard"), None),  # codes
        P(("data", "shard"), None),  # amb
        P(("data", "shard")),  # lens
    )
    # hit buffers: batch rows on axis 0, shard slots on axis 1; overflow 2-D.
    n_bufs = 2 if k == 0 else 3
    out_specs = tuple(P(("data", "shard"), None, None) for _ in range(n_bufs)) + (
        P(("data", "shard"), None),
    )

    mapped = jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
    return jax.jit(mapped)


class DistEngine:
    """Alignment engine over a ('shard', 'data') device mesh."""

    def __init__(
        self,
        shards: list[FMIndex],
        manifest: ShardManifest,
        n_data: int = 1,
        backend: str = "jnp",
        devices=None,
    ):
        self.shards = shards
        self.manifest = manifest
        self.config = shards[0].config
        self.backend = backend
        S = len(shards)
        self.mesh = make_mesh(S, n_data, devices)
        host = upload_index(shards)
        # re-place stacked index arrays: shard axis -> 'shard', replicated
        # over 'data'
        def put(x, extra_dims):
            spec = P("shard", *([None] * extra_dims))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        self.dev = DeviceIndexSet(
            lattice=put(host.lattice, 2),
            mark_rank_ck=put(host.mark_rank_ck, 1),
            ssa=put(host.ssa, 1),
            C=put(host.C, 1),
            dollar_row=put(host.dollar_row, 0),
            n=put(host.n, 0),
            text_len=put(host.text_len, 0),
            text_packed=put(host.text_packed, 1),
            shard_offsets=host.shard_offsets,
        )
        self._compiled = {}

    @property
    def n_lanes(self) -> int:
        """Global batch rows must be a multiple of this."""
        return self.mesh.shape["shard"] * self.mesh.shape["data"]

    def _get_fn(self, k: int):
        if k not in self._compiled:
            self._compiled[k] = build_ring_align(
                self.mesh,
                k=k,
                max_hits=self.config.max_hits,
                max_cand=self.config.max_cand,
                sa_rate=self.config.sa_rate,
                backend=self.backend,
            )
        return self._compiled[k]

    def align_batch(self, reads, k: int | None = None) -> list[list[Hit]]:
        k = self.config.k if k is None else k
        lanes = self.n_lanes
        # pad so the stacked-strand batch (2B rows) splits evenly over devices
        Bp = max(lanes, -(-len(reads) // lanes) * lanes)
        codes2, amb2, lens2, B = _encode(self.config, reads, Bp)
        fn = self._get_fn(k)
        d = self.dev
        spec = NamedSharding(self.mesh, P(("data", "shard"), None))
        lspec = NamedSharding(self.mesh, P(("data", "shard")))
        codes2 = jax.device_put(codes2, spec)
        amb2 = jax.device_put(amb2, spec)
        lens2 = jax.device_put(lens2, lspec)
        out = fn(
            d.lattice, d.mark_rank_ck, d.ssa, d.C, d.dollar_row, d.n,
            d.text_len, d.text_packed, codes2, amb2, lens2,
        )
        out = jax.block_until_ready(out)
        if k == 0:
            pos, valid, overflow = (np.asarray(x) for x in out)
            nm = None
        else:
            pos, nm, valid, overflow = (np.asarray(x) for x in out)
        return _assemble_hits(
            self.shards, self.manifest, reads, B, pos, nm, valid,
        )


def _encode(config, reads, Bp):
    """Encode reads to stacked-strand arrays (standalone helper)."""
    shim = type("S", (), {"config": config})()
    from bwtpu.engine import Engine

    return Engine.encode_batch(shim, reads, pad_to=Bp)


def _assemble_hits(shards, manifest, reads, B, pos, nm, valid):
    """pos/valid: (2B, S, H) in global batch order; slot s = shard s."""
    n_reads = len(reads)
    S = pos.shape[1]
    out: list[list[Hit]] = []
    text_lens = [sh.text_len for sh in shards]
    offsets = [sh.shard_offset for sh in shards]
    for b in range(n_reads):
        best: dict[tuple[int, str], int] = {}
        rl = len(reads[b].seq)
        for row, strand in ((b, "+"), (b + B, "-")):
            for s in range(S):
                vv = valid[row, s]
                if not vv.any():
                    continue
                ps = pos[row, s][vv]
                nms = nm[row, s][vv] if nm is not None else np.zeros(len(ps), int)
                for p, m in zip(ps, nms):
                    p = int(p)
                    if p < 0 or p + rl > text_lens[s]:
                        continue
                    key = (offsets[s] + p, strand)
                    if key not in best or int(m) < best[key]:
                        best[key] = int(m)
        out.append(
            sort_hits(Hit(nm=m, strand=st, pos=p) for (p, st), m in best.items())
        )
    return out
