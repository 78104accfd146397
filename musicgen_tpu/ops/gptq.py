"""GPTQ-calibrated int8 weight quantization for the fused decode kernel.

Round-2/3 round-to-nearest (RTN) K-group quantization left 8.8% mean rel
logit error on the trained Mamba (BENCHMARKS.md, experiments/int8_ablate.py
localized it to recurrence-amplified mixer noise): the no-residual stack
(reference quirk, /root/reference/models/mamba/mamba.py:32-33) compounds
per-layer weight rounding through 10 layers and across decode steps. GPTQ
(Frantar et al. 2022, arXiv:2210.17323 — public method, implemented here
from the paper) quantizes weight rows in order and redistributes each
row's rounding error over the not-yet-quantized rows via the Cholesky
factor of the inverse calibration second-moment H = X^T X, minimizing the
functional error ||X W - X Q|| instead of the parameter error ||W - Q||.

The output layout is exactly `ops.pallas_decode._quantize_cols`'s
(q (K, N) int8, s (G, N) f32 K-group scales), so the fused decode kernel
consumes GPTQ packs unchanged — pass `make_gptq_quantizer(hessians)` as
`build_decode_params(..., quantizer=...)`.

Everything here runs on host (numpy), once per checkpoint: calibration is
a few eager forward passes; the solver is O(K^2 N) per matrix in blocked
BLAS form (seconds per mixer on one CPU core).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import numpy as np

from .pallas_decode import QUANT_GROUP, _quantize_cols

QuantFn = Callable[[str, jax.Array], Tuple[jax.Array, jax.Array]]

#: Dense submodule names whose inputs are calibrated (the three matmuls the
#: fused kernel streams quantized; conv/gate/norm vectors stay fp32).
CALIB_SITES = ("in_proj", "out_proj", "lm_head")

#: Calibration sites for the xLSTM decode pack
#: (ops/pallas_xlstm_decode.build_xlstm_decode_params): the pack
#: concatenates w_i|w_f and w_z|w_o, whose halves share one input each, so
#: only the first member of each pair needs a Hessian. q/k/v (banded),
#: gates, and norms stay unquantized in the kernel.
XLSTM_CALIB_SITES = ("w_i", "w_z", "up_proj", "down_proj", "up", "down", "lm_head")


def collect_hessians(
    model: Any,
    variables: Any,
    batches: Iterable[Tuple[jax.Array, jax.Array]],
    sites: Sequence[str] = CALIB_SITES,
) -> Dict[str, np.ndarray]:
    """Per-site input second moments H = E[x x^T] from eager forwards.

    `batches` yields (tokens (B, T), meta (B, M)) calibration batches; the
    train-geometry `model.apply` is intercepted at each Dense in `sites`
    (flax intercept_methods) and the flattened inputs accumulated into a
    (K, K) float64 moment per site, keyed by the flax path string
    ('layer_3/in_proj', 'lm_head', ...). Run un-jitted (the interceptor
    pulls concrete values to host).
    """
    moments: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Dense)
            and context.method_name == "__call__"
            and mod.name in sites
        ):
            key = "/".join(mod.path)
            x = np.asarray(args[0], dtype=np.float32)
            x = x.reshape(-1, x.shape[-1])
            h = (x.T @ x).astype(np.float64)
            if key in moments:
                moments[key] += h
                counts[key] += x.shape[0]
            else:
                moments[key] = h
                counts[key] = x.shape[0]
        return next_fn(*args, **kwargs)

    for tokens, meta in batches:
        with nn.intercept_methods(interceptor):
            model.apply(variables, tokens, meta)
    return {k: v / max(counts[k], 1) for k, v in moments.items()}


def gptq_quantize(
    w: np.ndarray,
    hessian: np.ndarray,
    group: int = QUANT_GROUP,
    percdamp: float = 0.01,
    blocksize: int = 128,
    maxq: float = 127.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """GPTQ int8 of w (K, N) under calibration moment `hessian` (K, K).

    Returns (q (K, N) int8, s (G, N) f32) — `_quantize_cols`' layout. Rows
    are quantized in index order (no act-order: the kernel needs contiguous
    K-groups); each group's per-column scale is set on entry from the
    current, error-compensated values, matching RTN's symmetric max/127
    rule so the kernel's dequant math is identical.
    """
    w = np.array(w, dtype=np.float64)
    k, n = w.shape
    if k % group:
        group = k  # degenerate: one group (tiny matrices)
    h = np.array(hessian, dtype=np.float64)
    assert h.shape == (k, k), (h.shape, w.shape)

    dead = np.diag(h) <= 0
    h[dead, dead] = 1.0
    w[dead, :] = 0.0
    damp = percdamp * float(np.mean(np.diag(h)))
    h[np.diag_indices(k)] += max(damp, 1e-12)

    # Upper Cholesky of H^{-1}: hinv_u^T hinv_u = H^{-1}. Row k's
    # self-coupling is hinv_u[k, k]; its forward coupling hinv_u[k, k+1:].
    hinv = np.linalg.inv(h)
    # numpy cholesky is lower (hinv = L L^T); the GPTQ recursion wants the
    # upper factor U = L^T with U^T U = hinv.
    hinv_u = np.linalg.cholesky(hinv).T

    q_out = np.zeros((k, n), dtype=np.int8)
    s_out = np.zeros((k // group, n), dtype=np.float32)

    for b0 in range(0, k, blocksize):
        b1 = min(b0 + blocksize, k)
        wb = w[b0:b1, :]
        err = np.zeros((b1 - b0, n), dtype=np.float64)
        for i in range(b0, b1):
            j = i - b0
            if i % group == 0:
                g = i // group
                g1 = min(i + group, k)
                scale = np.max(np.abs(w[i:g1, :]), axis=0) / maxq
                scale = np.maximum(scale, 1e-20)
                s_out[g, :] = scale.astype(np.float32)
            scale64 = s_out[i // group, :].astype(np.float64)
            row = wb[j, :]
            q = np.clip(np.round(row / scale64), -maxq, maxq)
            q_out[i, :] = q.astype(np.int8)
            dq = q * scale64
            e = (row - dq) / hinv_u[i, i]
            # In-block compensation (rank-1); the tail is batched below.
            wb[j + 1 :, :] -= np.outer(hinv_u[i, j + 1 + b0 : b1], e)
            err[j, :] = e
        if b1 < k:
            w[b1:, :] -= hinv_u[b0:b1, b1:].T @ err
    return q_out, s_out


def make_gptq_quantizer(
    hessians: Dict[str, np.ndarray],
    group: int = QUANT_GROUP,
    percdamp: float = 0.01,
) -> QuantFn:
    """QuantFn for `build_decode_params(quantizer=...)`.

    Sites with a calibrated Hessian get GPTQ; anything else falls back to
    RTN `_quantize_cols` (bit-identical to the uncalibrated path). Solves
    are memoized per site (the pack is weight-only, so rebuilding the
    decode params for another batch size reuses them).

    NOTE: the solver is host-side numpy — build the pack OUTSIDE jit and
    hand it to `sample.generate(..., decode_pack=...)`.
    """
    import jax.numpy as jnp

    cache: Dict[str, Tuple[jax.Array, jax.Array]] = {}

    def quantize(name: str, w: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if name in cache:
            return cache[name]
        h = hessians.get(name)
        if h is None:
            return _quantize_cols(w, group=group)
        kw = int(w.shape[0])
        if h.shape[0] != kw:  # padded weights keep the unpadded moment
            hp = np.zeros((kw, kw), dtype=np.float64)
            hp[: h.shape[0], : h.shape[0]] = h
            h = hp
        q, s = gptq_quantize(np.asarray(w, np.float64), h, group, percdamp)
        cache[name] = (jnp.asarray(q), jnp.asarray(s))
        return cache[name]

    return quantize
