"""Pipeline-parallel training (Mamba + Transformer): the LAYER stack
sharded over a 'pipe' mesh axis with a GPipe microbatch schedule.

Family support: MambaConfig (stage = contiguous Mamba2 mixers,
`_mixer_full`) and TransformerConfig (stage = contiguous pre-LN rel-pos
blocks, `_tblock_full` — flash custom-VJP attention off-CPU). Both share
the embed/schedule/head machinery below; xLSTM would need a raw-param
full-sequence forward for its mLSTM/sLSTM mix and is not yet ported
(cli/train.py gates it with a clear error).

The reference scales only by replicating the whole model per GPU
(train_parallel.py:143-235 — DDP); a model too large for one device's HBM
has no story there. This module adds the TPU-native missing axis: each
pipeline stage holds n_layers/S contiguous Mamba blocks, and microbatches
stream through the stages over ICI.

Memory model (what actually scales as 1/S):

  * Canonical training format is `pp_format(params)`: per-layer params
    stacked on a leading (n_layers,) axis and device_put with
    `pp_shardings` — layers sharded P('pipe'), the two vocab-sized
    matrices (token embedding rows, lm_head columns — the largest single
    params at ~70 MB fp32 each) sharded over 'pipe' as well. Gradients
    and optimizer moments carry the same shardings (`pp_init` +
    with_sharding_constraint in the step), so persistent per-device
    state — params + grads + Adam mu/nu — is 1/S of the model.
  * The embedding/head are *gathered transiently* each step where used
    (XLA inserts the all-gathers at the shard_map boundary); that is a
    per-step ICI temp, not resident HBM.
  * Activations: token ids (int32) are the only per-microbatch tensors
    delivered into the shard_map region; the (mb, stream, d_model)
    embedding is built inside the tick on stage 0. With `cfg.remat` the
    stage forward is wrapped in jax.checkpoint so the backward holds one
    activation per tick instead of every mixer internal.

Design (one `shard_map` region over the 'pipe' axis, optionally crossed
with a 'data' axis for DP x PP):

  * A `lax.scan` over M + S - 1 ticks runs the classic GPipe schedule:
    every tick each stage applies its layers to the activation it holds,
    then `ppermute`s the result to its right neighbor. Stage 0 embeds and
    injects microbatch k at tick k; the last stage finishes microbatch
    k-(S-1) at tick k.
  * The final norm + lm_head + grammar-filtered CE run under a `lax.cond`
    gated on (is-last-stage AND a microbatch actually completed), so the
    vocab-size matmul — the single largest FLOP block — executes only
    where and when it is needed, not on every stage every tick.
  * The loss is two scalar `psum`s; gradients flow by plain `jax.grad`
    through the scan — the transpose of `ppermute` is the reverse
    `ppermute`, so the backward pass IS the reverse pipeline schedule,
    derived by AD instead of hand-scheduled.

Bubble fraction is the textbook (S-1)/(M+S-1); `default_microbatches`
picks the largest batch divisor <= 4*S (>= ~80% utilization when the
batch allows it). Numerics match the single-device step to float
tolerance (identical chunking; only reduction order differs) —
tests/test_pp_train.py pins loss parity, gradient parity, a descent run,
the DP x PP mesh, and that the canonical format actually shards.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import (
    NUM_META,
    VOCAB,
    MambaConfig,
    TransformerConfig,
    VocabLayout,
)
from ..ops.grammar import filtered_logits
from ..ops.ssm import causal_conv1d, ssd_chunked
from .sp_train import _layernorm, _rms_norm_gated


def _n_layers(cfg) -> int:
    return cfg.n_layer if isinstance(cfg, TransformerConfig) else cfg.n_layers


def _layer_key(cfg) -> str:
    # flax module names: MambaLM stacks `layer_{i}`, TransformerLM `block_{i}`.
    return "block_" if isinstance(cfg, TransformerConfig) else "layer_"


def _norm_key(cfg) -> str:
    return "ln_f" if isinstance(cfg, TransformerConfig) else "norm"


def default_microbatches(batch: int, n_stages: int) -> int:
    """Largest divisor of `batch` <= 4*n_stages.

    M = S (the naive choice) idles (S-1)/(2S-1) ~ 50% of stage-ticks;
    M = 4S brings the bubble under ~20%. Capped by what the batch can
    supply — a batch smaller than 4S simply becomes per-example
    microbatches."""
    best = 1
    for m in range(1, min(batch, 4 * n_stages) + 1):
        if batch % m == 0:
            best = m
    return best


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


def _tblock_full(lp, x: jax.Array, cfg: TransformerConfig) -> jax.Array:
    """One Transformer Block forward on a FULL-length stream from raw params.

    Mirrors models/transformer.Block.__call__ exactly (pre-LN, rel-pos
    attention with the reference's n_embd**-0.5 scale, ReLU FFN, residuals),
    so a pipeline stage's math is comparable to the flax module's to float
    tolerance. Attention impl follows the model's 'auto' policy: the flash
    custom-VJP kernel off-CPU (the training hot path), the XLA oracle on
    the CPU dryrun mesh."""
    c = cfg
    b, t, _ = x.shape
    hd = c.n_embd // c.n_heads

    def split(h):
        return h.reshape(b, t, c.n_heads, hd).transpose(0, 2, 1, 3)

    h = _layernorm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
    a = lp["attn"]
    q = split(h @ a["q"]["kernel"])
    k = split(h @ a["k"]["kernel"])
    v = split(h @ a["v"]["kernel"])
    scale = float(c.n_embd) ** -0.5
    impl = c.attention_impl
    if impl == "auto":
        impl = "flash" if jax.default_backend() != "cpu" else "xla"
    if impl == "flash":
        from ..ops.pallas_attention import flash_relpos_attention_train

        out = flash_relpos_attention_train(q, k, v, a["rel_pos_emb"], scale)
    else:
        from ..ops.attention import relpos_attention

        out = relpos_attention(q, k, v, a["rel_pos_emb"], scale)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, c.n_embd)
    x = x + (out @ a["proj"]["kernel"] + a["proj"]["bias"])
    h = _layernorm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
    m = lp["mlp"]
    h = jax.nn.relu(h @ m["fc"]["kernel"] + m["fc"]["bias"])
    return x + (h @ m["out"]["kernel"] + m["out"]["bias"])


# ---------------------------------------------------------------------------
# Canonical pipeline parameter format + shardings
# ---------------------------------------------------------------------------

def pp_format(params: Any, cfg) -> dict:
    """Model-format flax params -> the pipeline training format.

    Layers stacked on a leading (n_layers,) axis; embedding tables, final
    norm and head pulled to the top level so they can carry their own
    shardings."""
    p = params["params"]
    key = _layer_key(cfg)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[p[f"{key}{i}"] for i in range(_n_layers(cfg))],
    )
    return {
        "layers": stacked,
        "meta_emb": p["metadata_embedding"]["embedding"],
        "tok_emb": p["token_embedding"]["embedding"],
        "norm": p[_norm_key(cfg)],
        "head_kernel": p["lm_head"]["kernel"],
        "head_bias": p["lm_head"]["bias"],
    }


def pp_unformat(ppp: dict, cfg) -> Any:
    """Inverse of pp_format (for checkpoint save / interop)."""
    p = {}
    key = _layer_key(cfg)
    for i in range(_n_layers(cfg)):
        p[f"{key}{i}"] = jax.tree.map(lambda a, i=i: a[i], ppp["layers"])
    p["metadata_embedding"] = {"embedding": ppp["meta_emb"]}
    p["token_embedding"] = {"embedding": ppp["tok_emb"]}
    p[_norm_key(cfg)] = ppp["norm"]
    p["lm_head"] = {"kernel": ppp["head_kernel"], "bias": ppp["head_bias"]}
    return {"params": p}


def pp_shardings(mesh: Mesh, ppp: dict, axis: str = "pipe") -> dict:
    """NamedShardings for the pp_format tree: layers + both vocab-sized
    matrices sharded over `axis`; small norm/meta params replicated."""
    def ns(spec):
        return NamedSharding(mesh, spec)

    return {
        "layers": jax.tree.map(lambda a: ns(P(axis)), ppp["layers"]),
        "meta_emb": ns(P()),
        "tok_emb": ns(P(axis)),                 # vocab rows over stages
        "norm": jax.tree.map(lambda a: ns(P()), ppp["norm"]),
        "head_kernel": ns(P(None, axis)),       # vocab cols over stages
        "head_bias": ns(P(axis)),
    }


def _shardings_like(tree: Any, ppp: dict, shard: dict, mesh: Mesh) -> Any:
    """Shardings for an arbitrary params-derived tree (e.g. Adam moments):
    any leaf whose shape matches a pp_format param leaf inherits that
    param's sharding; everything else (step counts, scalars) replicates.

    Optax moment trees copy the params tree leaf-for-leaf, so the shape
    match is exact for them; the fallback only ever sees bookkeeping
    scalars."""
    by_shape = {}
    for pl, sl in zip(jax.tree.leaves(ppp), jax.tree.leaves(shard)):
        by_shape.setdefault((pl.shape, pl.dtype), sl)
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda leaf: by_shape.get((leaf.shape, leaf.dtype), rep), tree
    )


def pp_init(
    params: Any,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    cfg: MambaConfig,
    axis: str = "pipe",
):
    """Format + shard params and optimizer state for pipeline training.

    Returns (ppp, opt_state, shardings, opt_shardings) with every array
    committed to its stage — per-device persistent memory (params + Adam
    moments) is ~1/S of the model from here on."""
    ppp = pp_format(params, cfg)
    shard = pp_shardings(mesh, ppp, axis)
    ppp = jax.device_put(ppp, shard)
    opt_state = optimizer.init(ppp)
    opt_shard = _shardings_like(opt_state, ppp, shard, mesh)
    opt_state = jax.device_put(opt_state, opt_shard)
    return ppp, opt_state, shard, opt_shard


# ---------------------------------------------------------------------------
# Loss + train step
# ---------------------------------------------------------------------------

def _pp_loss_fmt(
    ppp: dict,
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
    n_stages = mesh.shape[axis]
    if _n_layers(cfg) % n_stages:
        raise ValueError(
            f"n_layers {_n_layers(cfg)} must divide over the '{axis}' axis "
            f"size {n_stages}"
        )
    l_per_stage = _n_layers(cfg) // n_stages
    b, t = src.shape
    m = microbatches if microbatches is not None else default_microbatches(
        b, n_stages
    )
    if b % m:
        raise ValueError(f"batch {b} must divide into {m} microbatches")
    mb = b // m
    if data_axis is not None and mb % mesh.shape[data_axis]:
        raise ValueError(
            f"microbatch {mb} must divide the '{data_axis}' axis size "
            f"{mesh.shape[data_axis]}"
        )
    stream = t + NUM_META
    d_model = ppp["tok_emb"].shape[-1]
    emb_dtype = ppp["tok_emb"].dtype

    # Only token IDS cross into the shard_map region (int32; the float
    # embedding is built inside the tick, on the stage that needs it).
    src_mb = src.reshape(m, mb, t)
    trg_mb = trg.reshape(m, mb, t)
    meta_mb = meta.reshape(m, mb, NUM_META)

    psum_axes = (axis,) if data_axis is None else (axis, data_axis)
    denom = float(b * t)
    bspec = P(None, data_axis)  # (M, mb[, ...]) with mb over 'data'
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def local(stk, meta_tab, tok_tab, nrm, hk, hb, s_mb, t_mb, mt_mb):
        mb_loc = s_mb.shape[1]
        s_idx = jax.lax.axis_index(axis)
        is_last = s_idx == n_stages - 1
        pos_mask = (jnp.arange(stream) >= NUM_META).astype(jnp.float32)[None, :]

        def embed(k):
            # Stage 0's injection: (mb, stream, D) for microbatch k.
            mk = jnp.take(mt_mb, k, axis=0)
            sk = jnp.take(s_mb, k, axis=0)
            return jnp.concatenate(
                [
                    jnp.take(meta_tab, mk, axis=0),
                    jnp.take(tok_tab, sk, axis=0),
                ],
                axis=1,
            )

        def stage_fwd(x):
            for j in range(l_per_stage):
                lp = jax.tree.map(lambda a, j=j: a[j], stk)
                if isinstance(cfg, TransformerConfig):
                    x = _tblock_full(lp, x, cfg)  # residuals inside the block
                else:
                    y = _mixer_full(lp, x, cfg)
                    x = x + y if cfg.residual else y
            return x

        if getattr(cfg, "remat", False):
            # Backward recomputes the mixer internals per tick; the scan
            # then holds one (mb, stream, D) residual per tick instead of
            # every intermediate of every mixer.
            stage_fwd = jax.checkpoint(stage_fwd)

        def head_loss(operands):
            out, sk, tk = operands
            prev = jnp.pad(sk, ((0, 0), (NUM_META, 0)))
            tg = jnp.pad(tk, ((0, 0), (NUM_META, 0)))
            h = _layernorm(out, nrm["scale"], nrm["bias"])
            logits = (h.astype(jnp.float32) @ hk + hb)[..., : cfg.vocab_size]
            filt = filtered_logits(prev, logits, layout)
            lp_ = jax.nn.log_softmax(filt, axis=-1)
            nll = -jnp.take_along_axis(lp_, tg[..., None], axis=-1)[..., 0]
            return jnp.sum(nll * pos_mask)

        def tick(carry, k):
            incoming, acc = carry
            kc = jnp.clip(k, 0, m - 1)
            x_in = jnp.where(s_idx == 0, embed(kc), incoming)
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
            jnp.zeros((mb_loc, stream, d_model), emb_dtype),
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
        in_specs=(
            P(axis), P(), P(), P(), P(), P(), bspec, bspec, bspec,
        ),
        out_specs=P(),
        check_vma=False,
    )
    return fn(
        ppp["layers"], ppp["meta_emb"], ppp["tok_emb"], ppp["norm"],
        ppp["head_kernel"], ppp["head_bias"], src_mb, trg_mb, meta_mb,
    )


def pp_loss(
    params: Any,
    src: jax.Array,
    trg: jax.Array,
    meta: jax.Array,
    cfg: MambaConfig,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    """Grammar-filtered CE of the Mamba LM with LAYERS sharded over `axis`.

    Convenience wrapper over `_pp_loss_fmt` taking MODEL-format params
    (parity tests, one-off evaluation). For training use the pp_format
    path (`pp_init` + `make_pp_train_step`) — only that keeps params,
    grads, and optimizer state sharded at rest."""
    return _pp_loss_fmt(
        pp_format(params, cfg), src, trg, meta, cfg, mesh, axis,
        microbatches, data_axis, layout,
    )


def make_pp_train_step(
    model,
    optimizer,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
    shardings: Optional[dict] = None,
    opt_shardings: Optional[Any] = None,
):
    """Jitted pipeline-parallel train step over the pp_format state:
    (ppp, opt_state, src, trg, meta) -> (ppp, opt_state, loss).

    With `shardings`/`opt_shardings` (from pp_init) the updated params and
    moments are constrained back onto their stages every step, so donation
    keeps per-device memory at 1/S steady-state."""
    cfg = model.cfg

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(ppp, opt_state, src, trg, meta):
        loss, grads = jax.value_and_grad(
            lambda q: _pp_loss_fmt(
                q, src, trg, meta, cfg, mesh, axis,
                microbatches=microbatches, data_axis=data_axis,
            )
        )(ppp)
        if shardings is not None:
            grads = jax.lax.with_sharding_constraint(grads, shardings)
        updates, opt_state = optimizer.update(grads, opt_state, ppp)
        new_params = optax.apply_updates(ppp, updates)
        if shardings is not None:
            new_params = jax.lax.with_sharding_constraint(
                new_params, shardings
            )
        if opt_shardings is not None:
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, opt_shardings
            )
        return new_params, opt_state, loss

    return step


def pp_opt_state_unformat(opt_state: Any, cfg: MambaConfig) -> Any:
    """Optax state over pp_format params -> the same state over
    model-format params (checkpoint interop: the saved TrainState matches
    what the single-device trainer would produce)."""
    def conv(element):
        if hasattr(element, "mu") and hasattr(element, "nu"):
            return element._replace(
                mu=pp_unformat(element.mu, cfg),
                nu=pp_unformat(element.nu, cfg),
            )
        return element
    if isinstance(opt_state, tuple):
        return tuple(conv(e) for e in opt_state)
    return conv(opt_state)
