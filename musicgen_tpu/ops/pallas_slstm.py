"""Fused batched sLSTM recurrence — Pallas TPU kernel.

Replaces the lax.scan in ops/slstm.slstm_sequential (itself the TPU-native
replacement for NX-AI's JIT-compiled CUDA sLSTM, reference
models/xlstm/xlstm_model.py:28 backend="cuda"; SURVEY.md §2.3). Per step:

    pre = wx_t + h_{t-1} @ R_bd + bias        [i | f | z | o]
    m_t = max(f + m, i);  i' = exp(i - m_t);  f' = exp(f + m - m_t)
    c_t = f' c + i' tanh(z);  n_t = f' n + i';  h_t = sigmoid(o) c_t / n_t

Batched-in-kernel design (v2 — the round-1 kernel ran one (1, DH) x
(DH, 4DH) matmul per (batch, head) grid program, starving the MXU and
losing 10x to XLA's scan): ALL heads' recurrences advance in ONE
(B, H*DH) x (H*DH, 4*H*DH) MXU matmul per step against a block-diagonal
recurrent matrix R_bd[h*DH+p, g*d + h*DH+q] = R[g, h, p, q] (gate-major
columns, per-head blocks; zeros elsewhere keep heads independent). The
4x zero-FLOP padding is free — the step is latency-bound, not FLOP-bound.
R_bd (~16 MB f32 at the reference size) stays resident in VMEM across the
whole sequence; wx streams in T-chunks double-buffered by the pipeline;
the (B, d) h/c/n/m state lives in VMEM scratch.

Arbitrary T is handled by padding to a chunk multiple and masking state
updates past T (the final state must not see pad steps).

Forward-only; training uses the XLA scan oracle (slstm_sequential).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .slstm import SState

NEG_LARGE = -1e30


def _slstm_kernel(
    wx_ref,  # (B, TT, 4d) f32 chunk
    r_ref,  # (d, 4d) f32 block-diagonal
    b_ref,  # (1, 4d) f32
    h_out_ref,  # (B, TT, d)
    state_out_ref,  # (4, B, d) final (h, c, n, m)
    h_s, c_s, n_s, m_s,  # scratch (B, d) f32
    *, chunk: int, d: int, t_real: int,
):
    ci = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(ci == 0)
    def _init():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)
        n_s[:] = jnp.zeros_like(n_s)
        m_s[:] = jnp.full_like(m_s, NEG_LARGE)

    bias = b_ref[0].astype(jnp.float32)[None, :]  # (1, 4d)

    def step(t, _):
        gt = ci * chunk + t
        wx_t = wx_ref[:, t, :].astype(jnp.float32)  # (B, 4d)
        h_prev = h_s[:]
        rec = jax.lax.dot_general(
            h_prev, r_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, 4d)
        pre = wx_t + rec + bias
        i_pre = pre[:, 0 * d : 1 * d]
        f_pre = pre[:, 1 * d : 2 * d]
        z_pre = pre[:, 2 * d : 3 * d]
        o_pre = pre[:, 3 * d : 4 * d]

        m_prev = m_s[:]
        m_new = jnp.maximum(f_pre + m_prev, i_pre)
        i_act = jnp.exp(i_pre - m_new)
        f_act = jnp.exp(f_pre + m_prev - m_new)
        c_new = f_act * c_s[:] + i_act * jnp.tanh(z_pre)
        n_new = f_act * n_s[:] + i_act
        h_new = jax.nn.sigmoid(o_pre) * c_new / n_new

        # Pad steps (gt >= t_real) must not advance the state.
        valid = gt < t_real
        h_s[:] = jnp.where(valid, h_new, h_prev)
        c_s[:] = jnp.where(valid, c_new, c_s[:])
        n_s[:] = jnp.where(valid, n_new, n_s[:])
        m_s[:] = jnp.where(valid, m_new, m_prev)
        h_out_ref[:, t, :] = h_new.astype(h_out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(ci == nc - 1)
    def _emit_state():
        state_out_ref[0, :, :] = h_s[:].astype(state_out_ref.dtype)
        state_out_ref[1, :, :] = c_s[:].astype(state_out_ref.dtype)
        state_out_ref[2, :, :] = n_s[:].astype(state_out_ref.dtype)
        state_out_ref[3, :, :] = m_s[:].astype(state_out_ref.dtype)


def _block_diag_r(r: jax.Array) -> jax.Array:
    """(4, H, DH, DH) -> (H*DH, 4*H*DH) gate-major block-diagonal."""
    four, h, dh, _ = r.shape
    d = h * dh
    # eye_h[h1, h2] selects the diagonal blocks: (H,DH,H,DH) mask trick.
    out = jnp.zeros((d, 4 * d), r.dtype)
    for g in range(four):
        # (H, DH, DH) -> (H*DH, H*DH) block diagonal
        blk = jax.scipy.linalg.block_diag(*[r[g, i] for i in range(h)])
        out = jax.lax.dynamic_update_slice(out, blk, (0, g * d))
    return out


def slstm_pallas(
    wx: jax.Array,  # (B, T, 4, H, DH)
    r: jax.Array,  # (4, H, DH, DH)
    b: jax.Array,  # (4, H, DH)
    chunk: int = 128,
    interpret: bool = False,
) -> Tuple[jax.Array, SState]:
    """Fused full-sequence sLSTM. Returns (h (B, T, H, DH), final_state),
    matching ops.slstm.slstm_sequential's contract. Any T (padded to a
    chunk multiple internally; pad steps are masked out of the state)."""
    bsz, t, four, h, dh = wx.shape
    assert four == 4
    d = h * dh

    t_pad = -(-t // chunk) * chunk
    # (B,T,4,H,DH) -> (B, T, 4d) with [g][h][q] column order
    wx_f = wx.reshape(bsz, t, 4 * d)
    if t_pad != t:
        wx_f = jnp.pad(wx_f, ((0, 0), (0, t_pad - t), (0, 0)))
    r_bd = _block_diag_r(r.astype(jnp.float32))  # (d, 4d)
    b_f = b.astype(jnp.float32).reshape(1, 4 * d)  # [g][h][q]

    grid = (t_pad // chunk,)
    kernel = functools.partial(_slstm_kernel, chunk=chunk, d=d, t_real=t)

    h_out, state_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, chunk, 4 * d), lambda c: (0, c, 0)),
            pl.BlockSpec((d, 4 * d), lambda c: (0, 0)),
            pl.BlockSpec((1, 4 * d), lambda c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bsz, chunk, d), lambda c: (0, c, 0)),
            pl.BlockSpec((4, bsz, d), lambda c: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t_pad, d), wx.dtype),
            jax.ShapeDtypeStruct((4, bsz, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bsz, d), jnp.float32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wx_f, r_bd, b_f)

    h_seq = h_out[:, :t, :].reshape(bsz, t, h, dh)
    st = state_out.reshape(4, bsz, h, dh)
    state: SState = (st[0], st[1], st[2], st[3])
    return h_seq, state
