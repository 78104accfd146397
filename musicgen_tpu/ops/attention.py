"""Causal relative-position attention with an always-visible metadata prefix.

Pure-XLA reference implementation of the reference model's attention
(reference: models/transformer/model_transformer.py:54-90 `HeadRelPos`,
:8-16 `generate_matrix`): Transformer-XL style AC+BD scores with a learnable
per-head relative-position embedding and the shift trick, masked causally
except that the first `n_meta` key columns (the metadata prefix) are visible
to every query.

Quirks preserved for fidelity:
  * the softmax scale is n_embd**-0.5 (the FULL model width, not head_dim —
    model_transformer.py:77 uses x.shape[-1]).
  * rel-position indices follow torch's pad+reshape `_rel_shift`
    (model_transformer.py:84-90): score[t, s] uses rel_emb[T - 1 - (t - s)].

A fused Pallas flash-attention kernel with the same contract lives in
`musicgen_tpu.ops.pallas_attention`; this module is the truth oracle.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NUM_META = 6
NEG_INF = float("-inf")


def rel_shift(x: jax.Array) -> jax.Array:
    """Transformer-XL relative shift, matching torch's view-based trick.

    x: (..., T, T) where x[..., t, s] = q_t . rel_s
    returns y with y[..., t, s] = x[..., t, s - t + T - 1] (garbage above the
    diagonal band, which the causal mask removes).
    """
    *lead, t, s = x.shape
    zero_pad = jnp.zeros((*lead, t, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)  # (..., T, T+1)
    x_reshaped = x_padded.reshape(*lead, s + 1, t)
    return x_reshaped[..., 1:, :].reshape(*lead, t, s)


def meta_causal_mask(t: int, n_meta: int = NUM_META, dtype=jnp.float32) -> jax.Array:
    """(T, T) additive mask: causal, with the first n_meta columns always
    visible (reference generate_matrix(n, 1) with matrix[:, :6] = 1)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    visible = (j <= i) | (j < n_meta)
    return jnp.where(visible, jnp.zeros((), dtype), jnp.asarray(NEG_INF, dtype))


def relpos_attention(
    q: jax.Array,  # (B, H, T, D)
    k: jax.Array,  # (B, H, T, D)
    v: jax.Array,  # (B, H, T, D)
    rel_emb: jax.Array,  # (H, T, D) learnable relative-position embeddings
    scale: float,
    n_meta: int = NUM_META,
    torch_exact_bd: bool = False,
) -> jax.Array:
    """Full-sequence attention. Returns (B, H, T, D)."""
    t = q.shape[2]
    ac = jnp.einsum("bhtd,bhsd->bhts", q, k)
    bd = jnp.einsum("bhtd,hsd->bhts", q, rel_emb[:, :t, :])
    bd = rel_shift(bd)
    if not torch_exact_bd:
        # Zero BD above the diagonal. The reference's torch rel_shift leaves
        # deterministic garbage there (wrapped next-row values) which its mask
        # keeps visible in the always-visible metadata columns for rows < 6
        # (model_transformer.py:14,84-90); we define those entries as 0
        # instead — consistent with the Pallas kernel and the cached decode
        # path. torch_exact_bd=True keeps the wrapped values (rel_shift here
        # IS the torch pad+view trick, so they match bit-for-bit) — the mode
        # the cross-framework parity harness uses.
        ti = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        si = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        bd = jnp.where((si <= ti)[None, None], bd, 0.0)
    scores = (ac + bd) * scale
    scores = scores + meta_causal_mask(t, n_meta, scores.dtype)[None, None]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v)


def relpos_attention_step(
    q: jax.Array,  # (B, H, D) single query
    k_cache: jax.Array,  # (B, H, S, D) cached keys (any slot order)
    v_cache: jax.Array,  # (B, H, S, D)
    rel_emb: jax.Array,  # (H, T, D) with T >= S (the trained buffer size)
    scale: float,
    key_ages: jax.Array,  # (S,) or (B, S) int32: query_pos - key_pos; <0 = masked
    rel_base: jax.Array,  # scalar int32: the query's row index in the window
) -> jax.Array:
    """Single-step cached attention over a (possibly ring-ordered) KV cache.

    Returns (B, H, D). The BD term indexes rel_emb at rel_base - age for a
    key `age` steps behind the query — the indices `rel_shift` produces for
    row `rel_base` of a (rel_base+1)-length sequence (the query has age 0;
    rel_base grows with the stream until the window is full, mirroring the
    reference's growing re-forward window, then stays at seq_len-1). Slots
    with age < 0 (unfilled) are masked. Because the learned rel_emb is
    position-independent on the K side, cached K/V stay valid as the window
    slides.

    `key_ages` may be (B, S): per-row ages for batch rows at DIFFERENT
    stream offsets (continuous-batching serving, serve/scheduler.py). The
    shared-(S,) path stays the cheaper gather.
    """
    t = rel_emb.shape[1]
    ac = jnp.einsum("bhd,bhsd->bhs", q, k_cache)
    rel_idx = jnp.clip(rel_base - key_ages, 0, t - 1)
    if key_ages.ndim == 2:
        # bd[b,h,s] = q[b,h,:] . rel_emb[h, rel_idx[b,s], :]. Two
        # lowerings, same math (unit-pinned equal in
        # tests/test_transformer.py::test_relpos_step_2d_ages_matches_naive_gather):
        #   matmul: contract q against ALL T table rows (a (B,H,T) matmul
        #     reading the ~3 MB table once), then gather scalars at (B,H,S).
        #   gather: fetch the (H,B,S,D) table rows, then dot — more HBM
        #     traffic on paper, but vector-gathers lower better on some
        #     backend versions.
        # Measured head-to-head at serving shape (slots=8, S=2048, trained
        # weights, experiments/r5/serve_transformer*.log): gather 435 tok/s
        # aggregate vs matmul 368 — XLA fuses the row-gather + dot better
        # than the take_along_axis scalar-gather, so the HBM-traffic
        # argument for the matmul form did not survive contact with the
        # compiler. gather is the default; MUSICGEN_RELPOS_BD=matmul keeps
        # the alternative lowering selectable for future backend versions.
        if os.environ.get("MUSICGEN_RELPOS_BD") == "matmul":
            all_bd = jnp.einsum("bhd,htd->bht", q, rel_emb)  # (B, H, T)
            idx = jnp.broadcast_to(
                rel_idx[:, None, :], (q.shape[0], q.shape[1], rel_idx.shape[1])
            )
            bd = jnp.take_along_axis(all_bd, idx, axis=2)  # (B, H, S)
        else:
            rel = rel_emb[:, rel_idx, :]  # (H, B, S, D)
            bd = jnp.einsum("bhd,hbsd->bhs", q, rel)
        vis = (key_ages >= 0) & (key_ages <= rel_base)  # (B, S)
        visible = vis[:, None, :]
    else:
        rel = rel_emb[:, rel_idx, :]  # (H, S, D)
        bd = jnp.einsum("bhd,hsd->bhs", q, rel)
        vis = (key_ages >= 0) & (key_ages <= rel_base)
        visible = vis[None, None, :]
    scores = (ac + bd) * scale
    scores = jnp.where(visible, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v_cache.dtype)
    return jnp.einsum("bhs,bhsd->bhd", probs, v_cache)
