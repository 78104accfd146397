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
