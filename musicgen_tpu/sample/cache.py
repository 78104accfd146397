"""Decode-cache bookkeeping for the sliding-window sampler.

The reference sampler re-forwards the entire (meta + up to block_len tokens)
window for every generated token (scripts/generate.py:26-29) — O(window) per
token. Here each model keeps O(1) state instead; for the Transformer that is
a ring-buffered KV cache over seq_len = block_len + 6 slots:

  slot 0..5           : metadata prefix (written once at prefill)
  slot 6 + (i mod L)  : the i-th stream token (prompt tokens fill i=0..P-1,
                        generated tokens continue the stream index)

Because the rel-position embedding is applied only on the query side as a
function of key AGE (ops/attention.relpos_attention_step), a slot's cached
K/V stay valid as the window slides; per step we only recompute ages.

Equivalence contract: while the total stream length is <= block_len (the
growing-window phase) cached decode is EXACTLY the reference full re-forward.
Once the reference starts sliding it also re-computes old tokens with
truncated left context, which no cache can (or should) reproduce — the
cached path keeps streaming state, which is strictly more context. The
reference-windowing re-forward mode in sample.sampler exists for parity
validation.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import NUM_META


def token_slot(stream_index: jax.Array, block_len: int) -> jax.Array:
    """Cache slot for stream token `stream_index` (prompt tokens included)."""
    return NUM_META + jnp.mod(stream_index, block_len)


def step_geometry(
    total: jax.Array, block_len: int, streaming: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Ages + rel_base for a decode step.

    `total`: number of stream tokens INCLUDING the token being stepped
    (i.e. prompt_len + generated_so_far + 1). Returns (key_ages (seq_len,),
    rel_base scalar). Unfilled slots get age -1 (masked).

    streaming=True (production): rel_base is FIXED at seq_len-1 — the
    geometry the model sees during training, where every batch is exactly
    block_len tokens (processing/dataset.py:171-184 pads/crops) and the
    query always sits on the last row. The learned rel_pos function is
    therefore purely distance-based and cache-stable.

    streaming=False (reference-growing): rel_base tracks the current window
    length, reproducing the reference's growing re-forward geometry exactly
    — only used for plumbing validation on single-layer models (for deeper
    models the reference's T-dependent interior rel indices make caching
    mathematically unable to match a full re-forward; see module docstring).
    """
    window = jnp.minimum(total, block_len)
    if streaming:
        rel_base = jnp.int32(NUM_META - 1 + block_len)
    else:
        rel_base = NUM_META - 1 + window
    meta_ages = rel_base - jnp.arange(NUM_META, dtype=jnp.int32)
    r = jnp.arange(block_len, dtype=jnp.int32)
    tok_ages = jnp.mod(total - 1 - r, block_len)
    tok_ages = jnp.where(r < window, tok_ages, -1)
    return jnp.concatenate([meta_ages, tok_ages]), rel_base
