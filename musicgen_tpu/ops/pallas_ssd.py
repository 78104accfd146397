"""Fused Mamba-2 SSD chunked scan — Pallas TPU kernel.

Replaces the pure-XLA chunked einsums in ops/ssm.ssd_chunked (itself the
TPU-native replacement for the reference's CUDA selective-scan dependency,
SURVEY.md §2.3). One grid step processes one (batch*head, chunk) tile and
carries the (P, N) SSM state in VMEM scratch across the sequential chunk
axis, so the (Q, Q) decay/score matrices never round-trip through HBM:

  y[t] = C_t . ( sum_{s<=t} exp(sum_{s<k<=t} dA_k) dt_s x_s B_s^T )  [+ carry]

Forward-only (sampling prefill / inference); training uses the XLA oracle
whose backward XLA derives. Verified against ops/ssm.ssd_reference in tests.

Layout notes: per-tile operands are (Q, P) / (Q, N) with P = N = 64 for the
reference model; Q = 256 keeps the MXU matmuls (Q x Q and Q x {P,N}) large.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ssd_kernel(
    x_ref, dt_ref, da_ref, b_ref, c_ref,  # inputs
    y_ref, state_out_ref,  # outputs
    state_scratch,  # (P, N) carried SSM state
    *, chunk: int,
):
    ci = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        state_scratch[:] = jnp.zeros_like(state_scratch)

    x = x_ref[0].astype(jnp.float32)  # (Q, P)
    dt = dt_ref[0].astype(jnp.float32)  # (Q, 1)
    da = da_ref[0].astype(jnp.float32)  # (Q, 1) = dt * A precomputed
    b = b_ref[0].astype(jnp.float32)  # (Q, N)
    c = c_ref[0].astype(jnp.float32)  # (Q, N)

    # Inclusive prefix sums via triangular matmuls (Mosaic lacks cumsum);
    # column form (Q,1) and row form (1,Q) computed separately to avoid a
    # (Q,1)->(1,Q) transpose relayout. All gating stays in safe difference
    # form: exp(cum[t]-cum[s]) with s <= t never overflows (da <= 0).
    ti = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    causal = si <= ti
    tril = causal.astype(jnp.float32)
    cum_col = jax.lax.dot_general(
        tril, da, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Q, 1)
    cum_row = jax.lax.dot_general(
        da, tril, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (1, Q)
    xdt = x * dt  # (Q, P)

    # Intra-chunk: scores[t, s] = (C_t . B_s) * exp(cum[t] - cum[s]).
    # Materialize the (Q,Q) difference via single-axis broadcasts only.
    # Gate/cum math stays f32; the big matmuls take bf16 inputs with f32
    # accumulation (XLA's default f32-matmul precision, 4x the MXU rate).
    cum_t = jnp.broadcast_to(cum_col, (chunk, chunk))  # lanes
    diff = cum_t - jnp.broadcast_to(cum_row, (chunk, chunk))  # sublanes
    decay = jnp.where(causal, jnp.exp(diff), 0.0)
    cb = jax.lax.dot_general(
        c.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (Q, Q)
    scores = cb * decay
    y = jax.lax.dot_general(
        scores.astype(jnp.bfloat16), xdt.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (Q, P)

    # Inter-chunk: y[t] += exp(cum[t]) * C_t . state_in
    state_in = state_scratch[:]  # (P, N)
    y_off = jax.lax.dot_general(
        c.astype(jnp.bfloat16), state_in.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (Q, P)
    y = y + y_off * jnp.exp(cum_col)

    # State update: state_out = exp(cum_last) * state_in
    #   + sum_s exp(cum_last - cum[s]) xdt_s B_s^T
    # cum_last (the full-chunk decay) is just sum(da) — keep it a TRUE
    # scalar: Mosaic rejects the (1,1)-slice + dual-axis broadcast form.
    cum_last = jnp.sum(da)
    decay_to_end = jnp.exp(cum_last - cum_col)  # (Q, 1)
    contrib = jax.lax.dot_general(
        (xdt * decay_to_end).astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (P, N)
    state_scratch[:] = state_in * jnp.exp(cum_last) + contrib

    y_ref[0] = y.astype(y_ref.dtype)

    @pl.when(ci == nc - 1)
    def _emit_state():
        state_out_ref[0] = state_scratch[:].astype(state_out_ref.dtype)


def ssd_chunked_pallas(
    x: jax.Array,  # (B, T, H, P)
    dt: jax.Array,  # (B, T, H)
    A: jax.Array,  # (H,)
    Bmat: jax.Array,  # (B, T, G, N)
    C: jax.Array,  # (B, T, G, N)
    chunk: int = 256,
    interpret: bool = False,
):
    """Fused SSD scan. Returns (y (B,T,H,P), final_state (B,H,P,N)).

    Requires T % chunk == 0 (pad upstream) and ngroups G dividing H.
    """
    b, t, h, p = x.shape
    g, n = Bmat.shape[2], Bmat.shape[3]
    assert t % chunk == 0, f"T={t} % chunk={chunk}"
    rep = h // g
    nc = t // chunk

    # Broadcast B/C across head groups and flatten (B, H) for the grid.
    bh = b * h
    xf = x.transpose(0, 2, 1, 3).reshape(bh, t, p)
    dtf = dt.transpose(0, 2, 1).reshape(bh, t, 1)
    bx = jnp.repeat(Bmat, rep, axis=2).transpose(0, 2, 1, 3).reshape(bh, t, n)
    cx = jnp.repeat(C, rep, axis=2).transpose(0, 2, 1, 3).reshape(bh, t, n)
    # dt * A precomputed outside the kernel (A is per-head; folding it into a
    # (bh, t, 1) stream avoids per-grid-step scalar plumbing).
    daf = (dt * A[None, None, :]).transpose(0, 2, 1).reshape(bh, t, 1)

    grid = (bh, nc)
    kernel = functools.partial(_ssd_kernel, chunk=chunk)

    y, state = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, p), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, chunk, 1), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, chunk, 1), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, chunk, n), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, chunk, n), lambda i, c: (i, c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, p), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, p, n), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, p), x.dtype),
            jax.ShapeDtypeStruct((bh, p, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((p, n), jnp.float32)],
        interpret=interpret,
    )(xf, dtf, daf, bx, cx)

    y = y.reshape(b, h, t, p).transpose(0, 2, 1, 3)
    state = state.reshape(b, h, p, n)
    return y, state
