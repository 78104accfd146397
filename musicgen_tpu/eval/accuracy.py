"""Per-field next-token accuracy harness.

Mirrors the reference's Test Accuracy notebook (reference:
scripts/Test Accuracy.ipynb cells 0-5): predictions are
argmax(filtered_logit) at the LAST position of each window, bucketed into
{pitch, dynamics, length, time, tempo} by the TARGET token's field, and
accumulated into per-field hit rates.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VOCAB, VocabLayout
from ..ops.grammar import field_bucket, filtered_logits

FIELDS = ("pitch", "dynamics", "length", "time", "tempo")


def last_position_prediction(
    apply_fn: Callable, params, src: jax.Array, meta: jax.Array
) -> jax.Array:
    """argmax over the grammar-filtered logits at the final position."""
    logits = apply_fn(params, src, meta)
    w = filtered_logits(src[:, -1], logits[:, -1, :])
    return jnp.argmax(w, axis=-1)


def accuracy_counts(
    predictions: np.ndarray, targets: np.ndarray, layout: VocabLayout = VOCAB
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (hits[5], totals[5]) bucketed by the target token's field."""
    buckets = np.asarray(field_bucket(jnp.asarray(targets), layout))
    hits = np.zeros(5, dtype=np.int64)
    totals = np.zeros(5, dtype=np.int64)
    for f in range(5):
        mask = buckets == f
        totals[f] += int(mask.sum())
        hits[f] += int((predictions[mask] == targets[mask]).sum())
    return hits, totals


def evaluate_accuracy(
    apply_fn: Callable,
    params,
    batches: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    layout: VocabLayout = VOCAB,
) -> Dict[str, float]:
    """Full-dataset per-field accuracy (last-position protocol)."""
    pred_fn = jax.jit(lambda p, s, m: last_position_prediction(apply_fn, p, s, m))
    hits = np.zeros(5, dtype=np.int64)
    totals = np.zeros(5, dtype=np.int64)
    for src, trg, meta in batches:
        preds = np.asarray(pred_fn(params, jnp.asarray(src), jnp.asarray(meta)))
        h, t = accuracy_counts(preds, trg[:, -1], layout)
        hits += h
        totals += t
    return {
        FIELDS[f]: (hits[f] / totals[f] if totals[f] else float("nan"))
        for f in range(5)
    }
