"""Composer-conditioning fidelity: classifier success-rate harness.

Mirrors the reference's test_classifier notebook (reference:
scripts/test_classifier.ipynb cells 0-8): the classifier's logits are
restricted to the band-token slice of the metadata vocabulary, the argmax
band is compared with the conditioning band token, and success rates are
accumulated per band.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def band_predictions(
    apply_fn: Callable, params, tokens: jax.Array, band_start: int
) -> jax.Array:
    """argmax over the band slice (reference: guesses =
    model(src)[:, band_start:].argmax(-1) + band_start)."""
    logits = apply_fn(params, tokens)
    return jnp.argmax(logits[:, band_start:], axis=-1) + band_start


def evaluate_success_rates(
    apply_fn: Callable,
    params,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],  # (tokens, meta)
    band_start: int,
) -> Dict[int, float]:
    """Per-band success rate {band_token: fraction correctly recovered}."""
    pred_fn = jax.jit(
        lambda p, t: band_predictions(apply_fn, p, t, band_start)
    )
    hits: Dict[int, int] = {}
    totals: Dict[int, int] = {}
    for tokens, meta in batches:
        preds = np.asarray(pred_fn(params, jnp.asarray(tokens)))
        bands = np.asarray(meta)[:, 0]
        for band, pred in zip(bands, preds):
            totals[int(band)] = totals.get(int(band), 0) + 1
            hits[int(band)] = hits.get(int(band), 0) + int(pred == band)
    return {b: hits.get(b, 0) / t for b, t in totals.items()}
