"""Fused sampler tail — Pallas TPU kernel.

One kernel for the per-step vocab-wide tail of the sampling loop
(sample/sampler.py): grammar-filtered weights, repetition-penalty division,
and exact top-3 selection

    w = -log_softmax(logits) * mask / min(base^hist, 1.2)
    (vals, idxs) = top3(w)            (ties -> lowest index, like lax.top_k)

The decode loop is dispatch-latency bound (DEV_NOTES.md); this collapses
~10 vocab-sized XLA ops (including the sort-based top_k over 17,914 lanes)
into one fused pass over VMEM.

Inputs are padded to the 128-aligned vocab; padded lanes carry mask=0 and
never win top-3 (the grammar guarantees >= 127 strictly-positive weights).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import VOCAB, VocabLayout

NEG = -1e30


def _tail_kernel(logits_ref, mask_ref, hist_ref, vals_ref, idx_ref, *, vp: int,
                 dyn_start: int, length_start: int):
    x = logits_ref[:].astype(jnp.float32)  # (B, Vp)
    mask = mask_ref[:].astype(jnp.float32)
    hist = hist_ref[:].astype(jnp.float32)
    bsz = x.shape[0]

    # log_softmax over the REAL vocab: padded lanes carry x = NEG.
    m = jnp.max(x, axis=-1, keepdims=True)
    ex = jnp.exp(x - m)
    lse = jnp.log(jnp.sum(ex, axis=-1, keepdims=True)) + m
    w = -(x - lse) * mask

    # Repetition penalty: pitch 1.01^h, dyn 1.02^h, capped 1.2, else 1.
    ids = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    log_base = jnp.where(
        ids < dyn_start,
        jnp.float32(0.00995033085316808),  # ln 1.01
        jnp.where(ids < length_start, jnp.float32(0.019802627296179712), 0.0),  # ln 1.02
    )
    pen = jnp.minimum(jnp.exp(hist * log_base), 1.2)
    w = w / pen

    # Exact top-3, ties -> lowest index (lax.top_k convention). Results are
    # accumulated into 128-wide output rows via lane masks (no scalar stores).
    lane = jax.lax.broadcasted_iota(jnp.int32, (bsz, 128), 1)
    out_vals = jnp.zeros((bsz, 128), jnp.float32)
    out_idx = jnp.zeros((bsz, 128), jnp.int32)
    for k in range(3):
        mk = jnp.max(w, axis=-1, keepdims=True)  # (B, 1)
        cand = jnp.where(w == mk, ids, vp)
        ik = jnp.min(cand, axis=-1, keepdims=True)  # (B, 1)
        out_vals = jnp.where(lane == k, jnp.broadcast_to(mk, (bsz, 128)), out_vals)
        out_idx = jnp.where(lane == k, jnp.broadcast_to(ik, (bsz, 128)), out_idx)
        w = jnp.where(ids == ik, NEG, w)
    vals_ref[:, 0, :] = out_vals
    idx_ref[:, 0, :] = out_idx


def fused_filter_penalty_top3(
    logits: jax.Array,  # (B, V) raw model logits
    mask_rows: jax.Array,  # (B, V) grammar mask rows for each prev token
    hist: jax.Array,  # (B, V) int32 penalty-window counts
    layout: VocabLayout = VOCAB,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (vals (B, 3), idxs (B, 3) int32)."""
    b, v = logits.shape
    vp = ((v + 127) // 128) * 128
    pad = vp - v
    if pad:
        logits = jnp.pad(logits, ((0, 0), (0, pad)), constant_values=NEG)
        mask_rows = jnp.pad(mask_rows, ((0, 0), (0, pad)))
        hist = jnp.pad(hist, ((0, 0), (0, pad)))

    kernel = functools.partial(
        _tail_kernel, vp=vp,
        dyn_start=layout.dyn_start, length_start=layout.length_start,
    )
    # Single program over the whole (B, Vp) arrays (B is tiny; 143 KB VMEM
    # at B=2, V=17920).
    vals, idxs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(logits, mask_rows, hist.astype(jnp.float32))
    return vals[:, 0, :3], idxs[:, 0, :3]
