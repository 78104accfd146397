"""Pipeline-parallel Mamba training: the LAYER stack sharded over a 'pipe'
mesh axis with a GPipe microbatch schedule.

The reference scales only by replicating the whole model per GPU
(train_parallel.py:143-235 — DDP); a model too large for one device's HBM
has no story there. This module adds the TPU-native missing axis: each
pipeline stage holds n_layers/S contiguous Mamba blocks (their parameters
are *sharded*, not replicated — per-device parameter memory scales as 1/S),
and microbatches stream through the stages over ICI.

Design (one `shard_map` region over the 'pipe' axis, optionally crossed
with a 'data' axis for DP x PP):

  * Per-layer parameters are stacked along a leading (n_layers,) axis and
    sharded over 'pipe' — device s materializes only its own L/S layers.
  * The batch is split into M microbatches; a `lax.scan` over M + S - 1
    ticks runs the classic GPipe schedule: every tick each stage applies
    its layers to the activation it holds, then `ppermute`s the result to
    its right neighbor. Stage 0 injects microbatch k at tick k; the last
    stage finishes microbatch k-(S-1) at tick k.
  * The final norm + lm_head + grammar-filtered CE run under a `lax.cond`
    gated on (is-last-stage AND a microbatch actually completed), so the
    vocab-size matmul — the single largest FLOP block — executes only
    where and when it is needed, not on every stage every tick.
  * The loss is two scalar `psum`s; gradients flow by plain `jax.grad`
    through the scan — the transpose of `ppermute` is the reverse
    `ppermute`, so the backward pass IS the reverse pipeline schedule,
    derived by AD instead of hand-scheduled.

Bubble fraction is the textbook (S-1)/(M+S-1); pick M >= 4S for >~80%
utilization. Numerics match the single-device step to float tolerance
(identical chunking; only reduction order differs) — tests/test_pp_train.py
pins loss parity, gradient parity, a descent run, and the DP x PP mesh.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import NUM_META, VOCAB, MambaConfig, VocabLayout
from ..ops.grammar import filtered_logits
from ..ops.ssm import causal_conv1d, ssd_chunked
from .sp_train import _layernorm, _rms_norm_gated


def _mixer_full(lp, u: jax.Array, cfg: MambaConfig) -> jax.Array:
    """One Mamba2Mixer forward on a FULL-length stream from raw params.

    Mirrors models/mamba.Mamba2Mixer.__call__ exactly (same chunk choice,
    same padding), so a pipeline stage's math is bit-comparable to the
    flax module's."""
    c = cfg
    b, t, _ = u.shape
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
    xbc = jax.nn.silu(causal_conv1d(xbc, lp["conv_w"], lp["conv_b"]))
    x, Bm, Cm = jnp.split(
        xbc, [c.d_inner, c.d_inner + c.ngroups * c.d_state], axis=-1
    )

    dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["dt_bias"])
    A = -jnp.exp(lp["A_log"])

    chunk = min(c.chunk_size, max(16, t))
    pad = (-t) % chunk
    if pad:
        x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        dt_p = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_p = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
        C_p = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
    else:
        x_p, dt_p, B_p, C_p = x, dt, Bm, Cm

    xh = x_p.reshape(b, t + pad, c.nheads, c.headdim)
    dth = dt_p.reshape(b, t + pad, c.nheads)
    Bh = B_p.reshape(b, t + pad, c.ngroups, c.d_state)
    Ch = C_p.reshape(b, t + pad, c.ngroups, c.d_state)

    y, _ = ssd_chunked(xh, dth, A, Bh, Ch, chunk=chunk)
    y = y[:, :t]
    y = y + x.reshape(b, t, c.nheads, c.headdim) * lp["D"][None, None, :, None]
    y = y.reshape(b, t, c.d_inner).astype(u.dtype)
    y = _rms_norm_gated(y, z, lp["norm_weight"])
    return y @ lp["out_proj"]["kernel"].astype(u.dtype)


def pp_loss(
    params: Any,
    src: jax.Array,  # (B, T) int32 input tokens
    trg: jax.Array,  # (B, T) int32 targets
    meta: jax.Array,  # (B, NUM_META) int32
    cfg: MambaConfig,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    """Grammar-filtered CE of the Mamba LM with LAYERS sharded over `axis`.

    Differentiable; equals train.loss.filtered_cross_entropy of the
    standard forward to float tolerance. `microbatches` defaults to the
    stage count; B must divide by it (and the microbatch by the 'data'
    axis size when `data_axis` crosses in DP)."""
    n_stages = mesh.shape[axis]
    if cfg.n_layers % n_stages:
        raise ValueError(
            f"n_layers {cfg.n_layers} must divide over the '{axis}' axis "
            f"size {n_stages}"
        )
    l_per_stage = cfg.n_layers // n_stages
    b, t = src.shape
    m = microbatches if microbatches is not None else n_stages
    if b % m:
        raise ValueError(f"batch {b} must divide into {m} microbatches")
    mb = b // m
    if data_axis is not None and mb % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch {mb} must divide the '{data_axis}' axis size "
            f"{mesh.shape[data_axis]}"
        )
    stream = t + NUM_META

    p = params["params"]
    emb = jnp.concatenate(
        [
            jnp.take(p["metadata_embedding"]["embedding"], meta, axis=0),
            jnp.take(p["token_embedding"]["embedding"], src, axis=0),
        ],
        axis=1,
    )  # (B, stream, D)
    d_model = emb.shape[-1]
    emb_mb = emb.reshape(m, mb, stream, d_model)
    src_mb = jnp.pad(src, ((0, 0), (NUM_META, 0))).reshape(m, mb, stream)
    trg_mb = jnp.pad(trg, ((0, 0), (NUM_META, 0))).reshape(m, mb, stream)

    # Per-layer params stacked on a leading (n_layers,) axis -> sharded so
    # each stage holds only its own slice.
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[p[f"layer_{i}"] for i in range(cfg.n_layers)],
    )
    head_k = p["lm_head"]["kernel"]
    head_b = p["lm_head"]["bias"]
    norm = p["norm"]

    psum_axes = (axis,) if data_axis is None else (axis, data_axis)
    denom = float(b * t)
    bspec = P(None, data_axis)  # (M, mb[, ...]) with mb over 'data'
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def local(stk, nrm, hk, hb, e_mb, s_mb, t_mb):
        mb_loc = e_mb.shape[1]
        s_idx = jax.lax.axis_index(axis)
        is_last = s_idx == n_stages - 1
        pos_mask = (jnp.arange(stream) >= NUM_META).astype(jnp.float32)[None, :]

        def stage_fwd(x):
            for j in range(l_per_stage):
                lp = jax.tree.map(lambda a: a[j], stk)
                y = _mixer_full(lp, x, cfg)
                x = x + y if cfg.residual else y
            return x

        def head_loss(operands):
            out, prev, tg = operands
            h = _layernorm(out, nrm["scale"], nrm["bias"])
            logits = (h.astype(jnp.float32) @ hk + hb)[..., : cfg.vocab_size]
            filt = filtered_logits(prev, logits, layout)
            lp_ = jax.nn.log_softmax(filt, axis=-1)
            nll = -jnp.take_along_axis(lp_, tg[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * pos_mask)

        def tick(carry, k):
            incoming, acc = carry
            x_in = jnp.where(
                s_idx == 0, jnp.take(e_mb, jnp.clip(k, 0, m - 1), axis=0),
                incoming,
            )
            out = stage_fwd(x_in)
            j = k - (n_stages - 1)
            jc = jnp.clip(j, 0, m - 1)
            # Final norm + head + CE only fire on the last stage, and only
            # on ticks where a microbatch actually completes.
            contrib = jax.lax.cond(
                is_last & (j >= 0),
                head_loss,
                lambda _: jnp.float32(0.0),
                (out, jnp.take(s_mb, jc, axis=0), jnp.take(t_mb, jc, axis=0)),
            )
            if perm:
                nxt = jax.lax.ppermute(out, axis, perm)
            else:
                nxt = out
            return (nxt, acc + contrib), None

        init = (
            jnp.zeros((mb_loc, stream, d_model), e_mb.dtype),
            jnp.float32(0.0),
        )
        (_, acc), _ = jax.lax.scan(tick, init, jnp.arange(m + n_stages - 1))
        total = acc
        for ax in psum_axes:
            total = jax.lax.psum(total, ax)
        return total / denom

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), bspec, bspec, bspec),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked, norm, head_k, head_b, emb_mb, src_mb, trg_mb)


def make_pp_train_step(
    model,
    optimizer,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
):
    """Jitted pipeline-parallel train step:
    (params, opt_state, src, trg, meta) -> (params, opt_state, loss)."""
    cfg = model.cfg

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, src, trg, meta):
        loss, grads = jax.value_and_grad(
            lambda q: pp_loss(
                q, src, trg, meta, cfg, mesh, axis,
                microbatches=microbatches, data_axis=data_axis,
            )
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
