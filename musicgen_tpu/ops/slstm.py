"""sLSTM (scalar-memory LSTM with exponential gating) ops — pure XLA.

TPU-native replacement for NX-AI's JIT-compiled CUDA sLSTM kernel
(reference: models/xlstm/xlstm_model.py:28 uses backend="cuda"; SURVEY.md
§2.3). The recurrence (xLSTM paper eq. 9-18), per head with head_dim dh and
block-diagonal recurrent weights R_g:

    g~_t = W_g x_t + R_g h_{t-1} + b_g          for g in {i, f, z, o}
    m_t  = max(f~_t + m_{t-1}, i~_t)             (stabilizer)
    i_t  = exp(i~_t - m_t)
    f_t  = exp(f~_t + m_{t-1} - m_t)
    c_t  = f_t c_{t-1} + i_t tanh(z~_t)
    n_t  = f_t n_{t-1} + i_t
    h_t  = sigmoid(o~_t) * c_t / n_t

The recurrence is inherently sequential (h_{t-1} feeds the gates), so the
full-sequence form is a lax.scan; a fused Pallas kernel with the same
contract lives in ops/pallas_slstm.

Shapes: gate input preactivations Wx (B, T, 4, H, DH) [order i, f, z, o],
recurrent weights R (4, H, DH, DH), bias (4, H, DH).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SState = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]  # h, c, n, m: (B,H,DH)


def slstm_init_state(batch: int, heads: int, dh: int) -> SState:
    z = jnp.zeros((batch, heads, dh), jnp.float32)
    return (z, z, z, jnp.full((batch, heads, dh), -jnp.inf, jnp.float32))


def slstm_step(
    wx: jax.Array,  # (B, 4, H, DH) input preactivations [i, f, z, o]
    r: jax.Array,  # (4, H, DH, DH) block-diagonal recurrent weights
    b: jax.Array,  # (4, H, DH)
    state: SState,
) -> Tuple[jax.Array, SState]:
    """One recurrent step. Returns (h (B,H,DH), new_state)."""
    h_prev, c_prev, n_prev, m_prev = state
    f32 = jnp.float32
    rec = jnp.einsum("bhd,ghde->bghe", h_prev.astype(f32), r.astype(f32))
    pre = wx.astype(f32) + rec + b.astype(f32)[None]
    i_pre, f_pre, z_pre, o_pre = pre[:, 0], pre[:, 1], pre[:, 2], pre[:, 3]

    m_new = jnp.maximum(f_pre + m_prev, i_pre)
    i_act = jnp.exp(i_pre - m_new)
    f_act = jnp.exp(f_pre + m_prev - m_new)

    c_new = f_act * c_prev + i_act * jnp.tanh(z_pre)
    n_new = f_act * n_prev + i_act
    h_new = jax.nn.sigmoid(o_pre) * c_new / n_new
    return h_new, (h_new, c_new, n_new, m_new)


def slstm_sequential(
    wx: jax.Array,  # (B, T, 4, H, DH)
    r: jax.Array,  # (4, H, DH, DH)
    b: jax.Array,  # (4, H, DH)
    initial_state: SState | None = None,
) -> Tuple[jax.Array, SState]:
    """Full-sequence scan. Returns (h (B,T,H,DH), final_state)."""
    bsz, t, _, h, dh = wx.shape
    state = initial_state if initial_state is not None else slstm_init_state(bsz, h, dh)

    def body(state, wx_t):
        h_t, state = slstm_step(wx_t, r, b, state)
        return state, h_t

    state, hs = jax.lax.scan(body, state, wx.transpose(1, 0, 2, 3, 4))
    return hs.transpose(1, 0, 2, 3), state


def powerlaw_blockdependent_bias(
    num_heads: int, dh: int, block_idx: int, num_blocks: int
) -> jnp.ndarray:
    """Forget-gate bias init spreading per-head timescales.

    Approximates NX-AI's "powerlaw_blockdependent" bias_init
    (reference models/xlstm/xlstm_model.py:31): within each head the bias
    ramps over a power-law curve whose exponent depends on the block's depth
    ratio, giving early blocks shorter and late blocks longer memory.
    """
    ratio = block_idx / max(num_blocks - 1, 1)
    x = jnp.linspace(0.0, 1.0, num_heads * dh).reshape(num_heads, dh)
    return 3.0 + 9.0 * x ** (0.3 + 1.3 * ratio)
