"""Training losses.

`filtered_cross_entropy` reproduces the reference's (unusual) objective
exactly (reference: train.py:161-165): the grammar-filtered values
-log_softmax(logits) * mask are fed to CrossEntropyLoss AS IF they were
logits, i.e.

    loss = mean_t [ -log_softmax( filtered(prev_t, logits_t) )[target_t] ]

`classifier_bce` is the multi-label BCE-with-logits objective of the
classifier trainer (reference: train_classifier.py:16-26,84-88): targets are
the multi-hot set of a sample's metadata tokens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VOCAB, VocabLayout
from ..ops.grammar import filtered_logits


def filtered_cross_entropy(
    prev_tokens: jax.Array,  # (B, T) the model INPUT tokens
    logits: jax.Array,  # (B, T, V)
    targets: jax.Array,  # (B, T)
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    filt = filtered_logits(prev_tokens, logits, layout)  # (B, T, V)
    log_probs = jax.nn.log_softmax(filt, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def chunked_filtered_cross_entropy(
    prev_tokens: jax.Array,  # (B, T) the model INPUT tokens
    hidden: jax.Array,  # (B, meta+T, D) final-norm hidden (model.hidden())
    head_kernel: jax.Array,  # (D, padded_vocab)
    head_bias: jax.Array,  # (padded_vocab,)
    targets: jax.Array,  # (B, T)
    vocab_size: int,
    chunk: int = 256,
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    """filtered_cross_entropy without ever materializing (B, T, V) logits.

    The memory profile of the standard loss is dominated by the vocab-sized
    intermediates (logits, grammar weights, log_softmax and their backward
    buffers: ~10 GiB of the 11 GiB train-step temps at B2 T2048 fp32 —
    experiments/sp_memory.py), NOT by layer activations (which is why plain
    per-layer remat does not move the total). This computes the head matmul
    + grammar filter + CE one time-chunk at a time inside a lax.scan with
    jax.checkpoint, so the backward pass recomputes each chunk's logits:
    peak vocab-sized memory drops from O(T) to O(chunk) at the cost of one
    extra head-matmul forward (~5% of step FLOPs).

    Exactly equals filtered_cross_entropy(src, model.apply(...), trg)
    (same per-position math; tests/test_chunked_loss.py pins loss + grads).
    """
    b, t = prev_tokens.shape
    n_meta = hidden.shape[1] - t
    h = hidden[:, n_meta:, :]  # hidden rows whose logits score the targets
    pad = (-t) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        prev_tokens = jnp.pad(prev_tokens, ((0, 0), (0, pad)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
    n = (t + pad) // chunk
    mask = (jnp.arange(t + pad) < t).astype(jnp.float32).reshape(n, chunk)

    chunks = lambda a, tail: a.reshape(b, n, chunk, *tail).swapaxes(0, 1)
    xs = (
        chunks(h, h.shape[2:]),  # (n, B, chunk, D)
        chunks(prev_tokens, ()),  # (n, B, chunk)
        chunks(targets, ()),
        mask,  # (n, chunk)
    )

    def chunk_nll(hc, pc, tc, mc, hk, hb):
        logits = (hc.astype(jnp.float32) @ hk + hb)[..., :vocab_size]
        filt = filtered_logits(pc, logits, layout)
        lp = jax.nn.log_softmax(filt, axis=-1)
        nll = -jnp.take_along_axis(lp, tc[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mc[None, :])

    remat_nll = jax.checkpoint(chunk_nll)

    def body(acc, x):
        hc, pc, tc, mc = x
        return acc + remat_nll(hc, pc, tc, mc, head_kernel, head_bias), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
    return total / (b * t)


def make_meta_multihot(meta: jax.Array, metadata_vocab_size: int) -> jax.Array:
    """(B, 6) meta tokens -> (B, meta_vocab) multi-hot float targets
    (reference train_classifier.py:16-26 builds the per-sample unique set)."""
    onehots = jax.nn.one_hot(meta, metadata_vocab_size)  # (B, 6, V)
    return jnp.clip(jnp.sum(onehots, axis=1), 0.0, 1.0)


def classifier_bce(
    logits: jax.Array,  # (B, meta_vocab)
    meta: jax.Array,  # (B, 6)
) -> jax.Array:
    targets = make_meta_multihot(meta, logits.shape[-1])
    logits = logits.astype(jnp.float32)
    # BCEWithLogits, mean over all elements (torch default reduction).
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)
