"""Mamba-2 SSD (state-space duality) selective-scan ops — pure XLA.

TPU-native replacement for the CUDA/Triton `mamba_ssm` selective-scan kernel
the reference depends on (reference: models/mamba/mamba.py:4,17;
requirements.txt:59). Implements the chunked block decomposition of the SSD
recurrence

    h_t = exp(dt_t * A) h_{t-1} + dt_t * (B_t outer x_t)
    y_t = C_t . h_t + D * x_t

as batched einsums over fixed-size chunks, which XLA maps onto the MXU, plus
an O(1) per-token step form for cached decode. A fused Pallas kernel with the
same contract lives in `musicgen_tpu.ops.pallas_ssd`; this module is the
truth oracle for its tests.

Shapes (G = ngroups, H = heads, P = headdim, N = d_state):
  x: (B, T, H, P)   dt: (B, T, H)   A: (H,)
  Bmat/C: (B, T, G, N) with H % G == 0
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def segsum(x: jax.Array) -> jax.Array:
    """Stable segment-sum: out[..., t, s] = sum_{s < k <= t} x[..., k].

    Lower-triangular; -inf above the diagonal. Matches the SSD paper's
    1-SS decomposition.
    """
    t = x.shape[-1]
    cum = jnp.cumsum(x, axis=-1)
    out = cum[..., :, None] - cum[..., None, :]
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(j <= i, out, -jnp.inf)


def ssd_chunked(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    C: jax.Array,
    chunk: int = 256,
    initial_state: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked SSD scan. Returns (y (B,T,H,P), final_state (B,H,P,N)).

    T must be a multiple of `chunk` (pad upstream).
    """
    b, t, h, p = x.shape
    g, n = Bmat.shape[2], Bmat.shape[3]
    assert t % chunk == 0, f"T={t} not a multiple of chunk={chunk}"
    nc = t // chunk
    rep = h // g

    f32 = jnp.float32
    xdt = x.astype(f32) * dt[..., None].astype(f32)  # (B,T,H,P)
    dA = dt.astype(f32) * A.astype(f32)[None, None, :]  # (B,T,H)

    # Reshape into chunks.
    xdt_c = xdt.reshape(b, nc, chunk, h, p)
    dA_c = dA.reshape(b, nc, chunk, h).transpose(0, 1, 3, 2)  # (B,NC,H,Q)
    B_c = jnp.repeat(Bmat.astype(f32), rep, axis=2).reshape(b, nc, chunk, h, n)
    C_c = jnp.repeat(C.astype(f32), rep, axis=2).reshape(b, nc, chunk, h, n)

    # Intra-chunk (diagonal blocks): y[t] += C_t . B_s L[t,s] xdt[s], s<=t
    L = jnp.exp(segsum(dA_c))  # (B,NC,H,Q,Q)
    scores = jnp.einsum("bcthn,bcshn->bchts", C_c, B_c) * L
    y_diag = jnp.einsum("bchts,bcshp->bcthp", scores, xdt_c)

    # Chunk-final states: sum_s exp(sum_{k>s} dA) B_s xdt_s
    dA_cum = jnp.cumsum(dA_c, axis=-1)  # (B,NC,H,Q)
    decay_to_end = jnp.exp(dA_cum[..., -1:] - dA_cum)  # (B,NC,H,Q)
    states = jnp.einsum(
        "bchs,bcshn,bcshp->bchpn", decay_to_end, B_c, xdt_c
    )  # (B,NC,H,P,N)

    # Inter-chunk recurrence over chunk states.
    chunk_decay = jnp.exp(dA_cum[..., -1])  # (B,NC,H)

    if initial_state is None:
        h0 = jnp.zeros((b, h, p, n), dtype=f32)
    else:
        h0 = initial_state.astype(f32)

    def scan_fn(carry, inp):
        state_in = carry
        decay, new_contrib = inp
        state_out = state_in * decay[..., None, None] + new_contrib
        return state_out, state_in  # emit the state ENTERING this chunk

    # scan over chunks: move NC to the front.
    decays = chunk_decay.transpose(1, 0, 2)  # (NC,B,H)
    contribs = states.transpose(1, 0, 2, 3, 4)  # (NC,B,H,P,N)
    final_state, entering = jax.lax.scan(scan_fn, h0, (decays, contribs))
    entering = entering.transpose(1, 0, 2, 3, 4)  # (B,NC,H,P,N)

    # Off-diagonal contribution: y[t] += C_t exp(sum_{k<=t} dA) h_enter
    in_decay = jnp.exp(dA_cum)  # (B,NC,H,Q)
    y_off = jnp.einsum("bcthn,bchpn,bcht->bcthp", C_c, entering, in_decay)

    y = (y_diag + y_off).reshape(b, t, h, p)
    return y, final_state


def ssd_step(
    x: jax.Array,  # (B, H, P)
    dt: jax.Array,  # (B, H)
    A: jax.Array,  # (H,)
    Bmat: jax.Array,  # (B, G, N)
    C: jax.Array,  # (B, G, N)
    state: jax.Array,  # (B, H, P, N)
) -> Tuple[jax.Array, jax.Array]:
    """Single-token recurrence. Returns (y (B,H,P), new_state)."""
    h, g = x.shape[1], Bmat.shape[1]
    rep = h // g
    f32 = jnp.float32
    Bh = jnp.repeat(Bmat.astype(f32), rep, axis=1)  # (B,H,N)
    Ch = jnp.repeat(C.astype(f32), rep, axis=1)
    decay = jnp.exp(dt.astype(f32) * A.astype(f32)[None, :])  # (B,H)
    update = jnp.einsum("bhp,bhn->bhpn", x.astype(f32) * dt[..., None].astype(f32), Bh)
    new_state = state * decay[..., None, None] + update
    y = jnp.einsum("bhpn,bhn->bhp", new_state, Ch)
    return y, new_state


def ssd_reference(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    Bmat: jax.Array,
    C: jax.Array,
    initial_state: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Naive sequential scan over T — the numerically-literal truth oracle."""
    b, t, h, p = x.shape
    n = Bmat.shape[-1]
    state = (
        jnp.zeros((b, h, p, n), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def body(state, inp):
        xt, dtt, bt, ct = inp
        y, state = ssd_step(xt, dtt, A, bt, ct, state)
        return state, y

    xs = (
        x.transpose(1, 0, 2, 3),
        dt.transpose(1, 0, 2),
        Bmat.transpose(1, 0, 2, 3),
        C.transpose(1, 0, 2, 3),
    )
    state, ys = jax.lax.scan(body, state, xs)
    return ys.transpose(1, 0, 2, 3), state


def causal_conv1d(
    x: jax.Array,  # (B, T, C)
    w: jax.Array,  # (K, C) depthwise taps, tap K-1 multiplies x[t]
    bias: Optional[jax.Array] = None,  # (C,)
) -> jax.Array:
    """Depthwise causal conv (reference dep: Dao-AILab/causal-conv1d CUDA,
    requirements.txt:13). y[t] = sum_k w[k] * x[t - (K-1) + k] + b."""
    k = w.shape[0]
    parts = []
    for i in range(k):
        shift = k - 1 - i
        shifted = jnp.pad(x, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1], :]
        parts.append(shifted * w[i][None, None, :])
    y = sum(parts)
    if bias is not None:
        y = y + bias[None, None, :]
    return y


def causal_conv1d_step(
    x: jax.Array,  # (B, C) newest input
    conv_state: jax.Array,  # (B, K-1, C) previous K-1 inputs (oldest first)
    w: jax.Array,  # (K, C)
    bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """O(1) conv step. Returns (y (B,C), new_conv_state)."""
    window = jnp.concatenate([conv_state, x[:, None, :]], axis=1)  # (B,K,C)
    y = jnp.einsum("bkc,kc->bc", window, w)
    if bias is not None:
        y = y + bias[None, :]
    return y, window[:, 1:, :]
