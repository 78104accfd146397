"""mLSTM (matrix-memory LSTM) ops — pure XLA.

TPU-native replacement for NX-AI's Triton `mlstm_kernels` (reference dep:
requirements.txt:67, used by models/xlstm/xlstm_model.py and
models/classifier/model.py through xLSTMBlockStack).

The mLSTM recurrence (xLSTM paper, eq. 19-27), per head with key/value
dimension dh:

    m_t = max(f~_t + m_{t-1}, i~_t)                (stabilizer)
    S_t = exp(f~_t + m_{t-1} - m_t) S_{t-1}
          + exp(i~_t - m_t) (k_t / sqrt(dh)) v_t^T  (matrix memory)
    n_t = exp(f~_t + m_{t-1} - m_t) n_{t-1}
          + exp(i~_t - m_t) (k_t / sqrt(dh))        (normalizer)
    h_t = (q_t . S_t) / max(|q_t . n_t|, exp(-m_t))

`mlstm_parallel` computes the mathematically identical quadratic form for
training (softmax-attention-shaped einsums -> MXU friendly);
`mlstm_step` is the O(dh^2) recurrent step for cached decode. Both are
cross-checked against each other in tests.

Shapes: q/k/v (B, T, H, DH); igate/fgate preactivations (B, T, H).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MState = Tuple[jax.Array, jax.Array, jax.Array]  # (S (B,H,DK,DV), n (B,H,DK), m (B,H))


def mlstm_parallel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    igate: jax.Array,
    fgate: jax.Array,
) -> jax.Array:
    """Full-sequence stabilized parallel form. Returns (B, T, H, DH)."""
    b, t, h, dh = q.shape
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)

    log_f = jax.nn.log_sigmoid(fgate.astype(f32))  # (B,T,H)
    f_cum = jnp.cumsum(log_f, axis=1)

    # D[t, s] = f_cum[t] - f_cum[s] + i[s]  for s <= t
    d = (
        f_cum[:, :, None, :]
        - f_cum[:, None, :, :]
        + igate.astype(f32)[:, None, :, :]
    )  # (B, T_query, T_key, H)
    ti = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    causal = (si <= ti)[None, :, :, None]
    d = jnp.where(causal, d, -jnp.inf)

    m = jnp.max(d, axis=2)  # (B, T, H) row-max stabilizer
    w = jnp.exp(d - m[:, :, None, :])  # (B,T,T,H)

    scores = jnp.einsum("bthd,bshd->btsh", q, k) / jnp.sqrt(float(dh))
    cw = scores * w
    numerator = jnp.einsum("btsh,bshd->bthd", cw, v)
    denom = jnp.sum(cw, axis=2)  # (B,T,H)
    denom = jnp.maximum(jnp.abs(denom), jnp.exp(-m))
    return numerator / denom[..., None]


def mlstm_init_state(batch: int, heads: int, dh: int) -> MState:
    return (
        jnp.zeros((batch, heads, dh, dh), jnp.float32),
        jnp.zeros((batch, heads, dh), jnp.float32),
        jnp.full((batch, heads), -jnp.inf, jnp.float32),
    )


def mlstm_step(
    q: jax.Array,  # (B, H, DH)
    k: jax.Array,
    v: jax.Array,
    igate: jax.Array,  # (B, H)
    fgate: jax.Array,
    state: MState,
) -> Tuple[jax.Array, MState]:
    """O(1) recurrent step. Returns (h (B,H,DH), new_state)."""
    s_prev, n_prev, m_prev = state
    dh = q.shape[-1]
    f32 = jnp.float32
    q, k, v = q.astype(f32), k.astype(f32), v.astype(f32)

    log_f = jax.nn.log_sigmoid(fgate.astype(f32))
    i_pre = igate.astype(f32)
    m_new = jnp.maximum(log_f + m_prev, i_pre)
    f_act = jnp.exp(log_f + m_prev - m_new)
    i_act = jnp.exp(i_pre - m_new)

    k_scaled = k / jnp.sqrt(float(dh))
    s_new = (
        f_act[..., None, None] * s_prev
        + i_act[..., None, None] * jnp.einsum("bhk,bhv->bhkv", k_scaled, v)
    )
    n_new = f_act[..., None] * n_prev + i_act[..., None] * k_scaled

    numerator = jnp.einsum("bhk,bhkv->bhv", q, s_new)
    denom = jnp.einsum("bhk,bhk->bh", q, n_new)
    denom = jnp.maximum(jnp.abs(denom), jnp.exp(-m_new))
    return numerator / denom[..., None], (s_new, n_new, m_new)


def mlstm_sequential(
    q: jax.Array, k: jax.Array, v: jax.Array, igate: jax.Array, fgate: jax.Array
) -> jax.Array:
    """lax.scan over mlstm_step — truth oracle for the parallel form."""
    b, t, h, dh = q.shape
    state = mlstm_init_state(b, h, dh)

    def body(state, inp):
        qt, kt, vt, it, ft = inp
        ht, state = mlstm_step(qt, kt, vt, it, ft, state)
        return state, ht

    xs = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
        igate.transpose(1, 0, 2),
        fgate.transpose(1, 0, 2),
    )
    _, hs = jax.lax.scan(body, state, xs)
    return hs.transpose(1, 0, 2, 3)
