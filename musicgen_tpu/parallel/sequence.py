"""Sequence-parallel SSD scan over the device mesh (ICI).

SURVEY.md §5.7 stretch capability: the reference handles long sequences by
TRUNCATION (crop to block_len); recurrent models here stream with O(1)
state, and this module additionally shards the TIME axis of the Mamba-2 SSD
scan across devices so a single long sequence can be processed in parallel.

The trick: the SSD state transform over any time span is AFFINE in the
incoming state,

    state_out = decay_total * state_in + contrib,
    decay_total = exp(sum dA),   contrib = local scan from zero state,

and affine maps compose associatively. So each shard:
  1. runs the local chunked scan from a ZERO initial state,
  2. all-gathers every shard's (decay_total, contrib) over ICI,
  3. composes the prefix maps locally (S is tiny) to get its true incoming
     state, and
  4. adds the linear correction  y_t += exp(cum_dA_t) * C_t . state_in
     — no second scan needed.

One all_gather of (B, H) scalars + (B, H, P, N) states per layer; everything
else stays shard-local.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ssm import ssd_chunked


def _ssd_shard(x, dt, A, Bmat, C, chunk: int, axis: str, n_shards: int):
    """Runs inside shard_map; x/dt/B/C carry the LOCAL time slice."""
    b, t_loc, h, p = x.shape
    g, n = Bmat.shape[2], Bmat.shape[3]

    y_local, contrib = ssd_chunked(x, dt, A, Bmat, C, chunk=chunk)

    f32 = jnp.float32
    da = dt.astype(f32) * A.astype(f32)[None, None, :]  # (B, T_loc, H)
    decay_total = jnp.exp(jnp.sum(da, axis=1))  # (B, H)

    idx = jax.lax.axis_index(axis)
    decays = jax.lax.all_gather(decay_total, axis)  # (S, B, H)
    contribs = jax.lax.all_gather(contrib, axis)  # (S, B, H, P, N)

    # Prefix-compose the affine maps of shards < idx (S is small and static;
    # an unrolled masked loop keeps everything jit-static). full_state
    # composes ALL shards, giving the replicated sequence-final state.
    state_in = jnp.zeros_like(contrib)
    full_state = jnp.zeros_like(contrib)
    for j in range(n_shards):
        updated = decays[j][..., None, None] * state_in + contribs[j]
        state_in = jnp.where(j < idx, updated, state_in)
        full_state = decays[j][..., None, None] * full_state + contribs[j]

    # Linear correction for the incoming state.
    rep = h // g
    Ch = jnp.repeat(C.astype(f32), rep, axis=2)  # (B, T_loc, H, N)
    in_decay = jnp.exp(jnp.cumsum(da, axis=1))  # (B, T_loc, H)
    y_corr = jnp.einsum("bthn,bhpn,bth->bthp", Ch, state_in, in_decay)
    y = y_local + y_corr.astype(y_local.dtype)

    return y, full_state


def ssd_sequence_parallel(
    x: jax.Array,  # (B, T, H, P) — T sharded over `axis`
    dt: jax.Array,  # (B, T, H)
    A: jax.Array,  # (H,)
    Bmat: jax.Array,  # (B, T, G, N)
    C: jax.Array,  # (B, T, G, N)
    mesh: Mesh,
    axis: str = "data",
    chunk: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Time-sharded SSD scan. Returns (y (B,T,H,P) sharded like x,
    final_state (B,H,P,N) replicated)."""
    tspec = P(None, axis)
    rspec = P()
    fn = functools.partial(
        _ssd_shard, chunk=chunk, axis=axis, n_shards=mesh.shape[axis]
    )
    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(tspec, tspec, rspec, tspec, tspec),
        out_specs=(tspec, rspec),
        check_vma=False,
    )
    return shard_fn(x, dt, A, Bmat, C)
