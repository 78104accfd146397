"""Fused sLSTM recurrence — Pallas TPU kernel.

Replaces the lax.scan in ops/slstm.slstm_sequential (itself the TPU-native
replacement for NX-AI's JIT-compiled CUDA sLSTM, SURVEY.md §2.3) with a
single kernel that keeps the (h, c, n, m) state in VMEM for the whole
sequence and batches the four gates' recurrent matmuls into one
(1, DH) x (DH, 4*DH) MXU op per step:

    pre = wx_t + h_{t-1} @ R_cat + bias       [i | f | z | o]
    m_t = max(f + m, i);  i' = exp(i - m_t);  f' = exp(f + m - m_t)
    c_t = f' c + i' tanh(z);  n_t = f' n + i';  h_t = sigmoid(o) c_t / n_t

Grid: (batch*heads, T/chunk) with the chunk axis sequential (state carried
in scratch). Forward-only; training uses the XLA scan oracle.

Status: bit-exact vs the scan oracle on TPU, but ~10x SLOWER at the
reference sizes — each grid program runs (1, DH) x (DH, 4DH) matmuls (M=1
starves the MXU) while XLA's scan batches all B*H recurrences into one
matmul per step. Kept as the starting point for a batched-in-kernel
version; `XLSTMConfig.slstm_impl` defaults to 'xla'.
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
    wx_ref,  # (1, TT, 4*DH)
    r_ref,  # (1, DH, 4*DH)
    b_ref,  # (1, 1, 4*DH)
    h_out_ref,  # (1, TT, DH)
    state_out_ref,  # (1, 4, DH) final (h, c, n, m)
    h_s, c_s, n_s, m_s,  # scratch (1, DH) each
    *, chunk: int, dh: int,
):
    ci = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)
        n_s[:] = jnp.zeros_like(n_s)
        m_s[:] = jnp.full_like(m_s, NEG_LARGE)

    r_cat = r_ref[0].astype(jnp.float32)  # (DH, 4DH)
    bias = b_ref[0].astype(jnp.float32)  # (1, 4DH)

    def step(t, _):
        wx_t = wx_ref[0, pl.ds(t, 1), :].astype(jnp.float32)  # (1, 4DH)
        h_prev = h_s[:]
        rec = jax.lax.dot_general(
            h_prev, r_cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, 4DH)
        pre = wx_t + rec + bias
        i_pre = pre[:, 0 * dh : 1 * dh]
        f_pre = pre[:, 1 * dh : 2 * dh]
        z_pre = pre[:, 2 * dh : 3 * dh]
        o_pre = pre[:, 3 * dh : 4 * dh]

        m_prev = m_s[:]
        m_new = jnp.maximum(f_pre + m_prev, i_pre)
        i_act = jnp.exp(i_pre - m_new)
        f_act = jnp.exp(f_pre + m_prev - m_new)
        c_new = f_act * c_s[:] + i_act * jnp.tanh(z_pre)
        n_new = f_act * n_s[:] + i_act
        h_new = jax.nn.sigmoid(o_pre) * c_new / n_new

        h_s[:] = h_new
        c_s[:] = c_new
        n_s[:] = n_new
        m_s[:] = m_new
        h_out_ref[0, pl.ds(t, 1), :] = h_new.astype(h_out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(ci == nc - 1)
    def _emit_state():
        state_out_ref[0, 0:1, :] = h_s[:].astype(state_out_ref.dtype)
        state_out_ref[0, 1:2, :] = c_s[:].astype(state_out_ref.dtype)
        state_out_ref[0, 2:3, :] = n_s[:].astype(state_out_ref.dtype)
        state_out_ref[0, 3:4, :] = m_s[:].astype(state_out_ref.dtype)


def slstm_pallas(
    wx: jax.Array,  # (B, T, 4, H, DH)
    r: jax.Array,  # (4, H, DH, DH)
    b: jax.Array,  # (4, H, DH)
    chunk: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, SState]:
    """Fused full-sequence sLSTM. Returns (h (B, T, H, DH), final_state),
    matching ops.slstm.slstm_sequential's contract.

    T must be a multiple of `chunk` (pad upstream).
    """
    bsz, t, four, h, dh = wx.shape
    assert four == 4 and t % chunk == 0
    bh = bsz * h

    # (B,T,4,H,DH) -> (B,H,T,4*DH) -> (BH, T, 4DH)
    wx_f = wx.transpose(0, 3, 1, 2, 4).reshape(bh, t, 4 * dh)
    # R: (4,H,DH,DH) -> per head (DH, 4*DH), tiled per batch.
    r_cat = r.transpose(1, 2, 0, 3).reshape(h, dh, 4 * dh)
    r_f = jnp.tile(r_cat, (bsz, 1, 1))  # (BH, DH, 4DH)
    b_cat = b.transpose(1, 0, 2).reshape(h, 1, 4 * dh)
    b_f = jnp.tile(b_cat, (bsz, 1, 1))  # (BH, 1, 4DH)

    grid = (bh, t // chunk)
    kernel = functools.partial(_slstm_kernel, chunk=chunk, dh=dh)

    h_out, state_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, 4 * dh), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, dh, 4 * dh), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 1, 4 * dh), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, dh), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, 4, dh), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, dh), wx.dtype),
            jax.ShapeDtypeStruct((bh, 4, dh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, dh), jnp.float32),
            pltpu.VMEM((1, dh), jnp.float32),
            pltpu.VMEM((1, dh), jnp.float32),
            pltpu.VMEM((1, dh), jnp.float32),
        ],
        interpret=interpret,
    )(wx_f, r_f, b_f)

    h_seq = h_out.reshape(bsz, h, t, dh).transpose(0, 2, 1, 3)
    st = state_out.reshape(bsz, h, 4, dh)
    state: SState = (st[:, :, 0], st[:, :, 1], st[:, :, 2], st[:, :, 3])
    return h_seq, state
