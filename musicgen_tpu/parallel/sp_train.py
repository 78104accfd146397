"""Sequence-parallel Mamba training: the full train step with the TIME axis
sharded over the mesh (long-context mode; VERDICT r2 item 9's "make it
real" branch).

The reference handles long sequences by truncation to block_len
(processing/dataset.py:173-184); round-2 landed the time-sharded SSD scan
op (parallel/sequence.py — forward + gradient parity). This module turns
that op into a *trainable end-to-end path*: one `shard_map` region runs the
whole Mamba stack + head + grammar-filtered CE on a 1/S time slice per
device, so activation memory per chip scales as T/S and a block length
that OOMs one chip trains across the mesh.

Per-layer cross-shard communication (all over ICI):
  * causal conv1d: a (K-1)-step halo `ppermute` from the left neighbor
    (shard 0 keeps the zero left-pad — identical to the global conv).
  * SSD scan: the affine state composition of parallel/sequence._ssd_shard
    (one all_gather of (decay_total, contrib) per layer).
  * loss: two scalar `psum`s (masked sum + count) for the global mean.

Everything else (in_proj, gated norm, out_proj, final LayerNorm, lm_head,
grammar filter) is position-local. Embedding lookup happens OUTSIDE the
shard_map so the gather's gradient flows to the replicated tables; the
metadata prefix rides the stream (positions 0..5 on shard 0) and a
position mask keeps the first NUM_META logits out of the loss — exactly
the [:, 6:] slice of the standard forward (models/mamba.py:239).

Numerics match the single-device step to float tolerance (the SSD chunk
boundaries and reduction groupings differ); tests/test_sp_train.py asserts
loss and grad parity and a short training-descent run.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import NUM_META, VOCAB, MambaConfig, VocabLayout
from ..ops.grammar import filtered_logits
from ..ops.ssm import causal_conv1d
from .sequence import _ssd_shard


def _layernorm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def _rms_norm_gated(y, z, weight, eps=1e-5):
    y = y * jax.nn.silu(z)
    var = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=-1, keepdims=True)
    return (y.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(y.dtype) * weight


def _mixer_local(lp, u, cfg: MambaConfig, axis: str, n_shards: int, chunk: int):
    """One Mamba2Mixer on a local time slice (inside shard_map).

    Mirrors models/mamba.Mamba2Mixer.__call__ with two collective seams:
    the conv halo and the SSD affine state composition."""
    c = cfg
    b, t_loc, _ = u.shape
    zxbcdt = u @ lp["in_proj"]["kernel"].astype(u.dtype)
    z, x, Bm, Cm, dt = jnp.split(
        zxbcdt,
        [
            c.d_inner,
            2 * c.d_inner,
            2 * c.d_inner + c.ngroups * c.d_state,
            2 * c.d_inner + 2 * c.ngroups * c.d_state,
        ],
        axis=-1,
    )

    xbc = jnp.concatenate([x, Bm, Cm], axis=-1)
    k = c.d_conv
    # Halo: each shard sends its last K-1 raw conv inputs right; shard 0's
    # missing halo stays zero — the global conv's left zero-pad.
    halo = jax.lax.ppermute(
        xbc[:, -(k - 1):, :], axis,
        [(i, i + 1) for i in range(n_shards - 1)],
    )
    ext = jnp.concatenate([halo, xbc], axis=1)
    conv = causal_conv1d(ext, lp["conv_w"], lp["conv_b"])[:, k - 1:, :]
    xbc = jax.nn.silu(conv)
    x, Bm, Cm = jnp.split(
        xbc, [c.d_inner, c.d_inner + c.ngroups * c.d_state], axis=-1
    )

    dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["dt_bias"])
    A = -jnp.exp(lp["A_log"])

    xh = x.reshape(b, t_loc, c.nheads, c.headdim)
    dth = dt.reshape(b, t_loc, c.nheads)
    Bh = Bm.reshape(b, t_loc, c.ngroups, c.d_state)
    Ch = Cm.reshape(b, t_loc, c.ngroups, c.d_state)

    y, _ = _ssd_shard(xh, dth, A, Bh, Ch, chunk=chunk, axis=axis,
                      n_shards=n_shards)
    y = y + xh.astype(y.dtype) * lp["D"][None, None, :, None]
    y = y.reshape(b, t_loc, c.d_inner).astype(u.dtype)
    y = _rms_norm_gated(y, z, lp["norm_weight"])
    return y @ lp["out_proj"]["kernel"].astype(u.dtype)


def sp_loss(
    params: Any,
    src: jax.Array,  # (B, T) int32 input tokens
    trg: jax.Array,  # (B, T) int32 targets
    meta: jax.Array,  # (B, NUM_META) int32
    cfg: MambaConfig,
    mesh: Mesh,
    axis: str = "sp",
    chunk: int = 64,
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    """Grammar-filtered CE of the Mamba LM with time sharded over `axis`.

    Requires (T + NUM_META) divisible by the axis size and by `chunk` per
    shard. Differentiable; equals train.loss.filtered_cross_entropy of the
    standard forward to float tolerance."""
    n_shards = mesh.shape[axis]
    b, t = src.shape
    stream = t + NUM_META
    if stream % n_shards:
        raise ValueError(
            f"stream length {stream} (= T + {NUM_META}) must divide the "
            f"'{axis}' axis size {n_shards}"
        )
    t_loc = stream // n_shards
    if t_loc % chunk:
        # ssd chunking inside the shard needs chunk | t_loc; shrink chunk.
        chunk = max(g for g in range(1, min(chunk, t_loc) + 1) if t_loc % g == 0)

    p = params["params"]
    emb = jnp.concatenate(
        [
            jnp.take(p["metadata_embedding"]["embedding"], meta, axis=0),
            jnp.take(p["token_embedding"]["embedding"], src, axis=0),
        ],
        axis=1,
    )  # (B, stream, D)
    # Align the token streams with the (meta-prefixed) logit stream.
    src_ext = jnp.pad(src, ((0, 0), (NUM_META, 0)))
    trg_ext = jnp.pad(trg, ((0, 0), (NUM_META, 0)))

    layer_params = tuple(p[f"layer_{i}"] for i in range(cfg.n_layers))
    head_k = p["lm_head"]["kernel"]
    head_b = p["lm_head"]["bias"]
    norm = p["norm"]

    tspec = P(None, axis)
    espec = P(None, axis, None)

    def local(lps, nrm, hk, hb, x, prev, tg):
        for lp in lps:
            y = _mixer_local(lp, x, cfg, axis, n_shards, chunk)
            x = x + y if cfg.residual else y
        x = _layernorm(x, nrm["scale"], nrm["bias"])
        logits = (x.astype(jnp.float32) @ hk + hb)[..., : cfg.vocab_size]
        filt = filtered_logits(prev, logits, layout)
        lp_ = jax.nn.log_softmax(filt, axis=-1)
        nll = -jnp.take_along_axis(lp_, tg[..., None], axis=-1)[..., 0]
        pos = jax.lax.axis_index(axis) * t_loc + jnp.arange(t_loc)
        mask = (pos >= NUM_META).astype(jnp.float32)[None, :]
        s = jax.lax.psum(jnp.sum(nll * mask), axis)
        n = jax.lax.psum(jnp.sum(mask) * nll.shape[0], axis)
        return s / n

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), espec, tspec, tspec),
        out_specs=P(),
        check_vma=False,
    )
    return fn(layer_params, norm, head_k, head_b, emb, src_ext, trg_ext)


def make_sp_train_step(
    model, optimizer, mesh: Mesh, axis: str = "sp", chunk: int = 64
):
    """Jitted sequence-parallel train step:
    (params, opt_state, src, trg, meta) -> (params, opt_state, loss)."""
    cfg = model.cfg

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, src, trg, meta):
        loss, grads = jax.value_and_grad(
            lambda q: sp_loss(q, src, trg, meta, cfg, mesh, axis, chunk)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
