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


def mlstm_chunkwise(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    igate: jax.Array,
    fgate: jax.Array,
    chunk: int = 256,
    initial_state: MState | None = None,
) -> Tuple[jax.Array, MState]:
    """Chunkwise-parallel mLSTM (the formulation of NX-AI's Triton
    `mlstm_kernels`, reimplemented in XLA): O(T*chunk) memory instead of the
    O(T^2) parallel form, with exact carry of the (S, n, m) state across
    chunks — so it also serves long-context streaming prefill.

    Returns (h (B,T,H,DH), final_state). T must be a multiple of `chunk`.
    """
    b, t, h, dh = q.shape
    assert t % chunk == 0, f"T={t} % chunk={chunk}"
    nc = t // chunk
    f32 = jnp.float32

    log_f = jax.nn.log_sigmoid(fgate.astype(f32)).reshape(b, nc, chunk, h)
    ig = igate.astype(f32).reshape(b, nc, chunk, h)
    qc = q.astype(f32).reshape(b, nc, chunk, h, dh)
    kc = (k.astype(f32) / jnp.sqrt(float(dh))).reshape(b, nc, chunk, h, dh)
    vc = v.astype(f32).reshape(b, nc, chunk, h, dh)

    # Within-chunk cumulative log-forget b_t = sum_{k<=t} log_f_k.
    bcum = jnp.cumsum(log_f, axis=2)  # (B,NC,Q,H)
    btot = bcum[:, :, -1, :]  # (B,NC,H)
    # Intra-chunk source weight a_s = i_s - b_s; stabilizer over prefixes.
    a = ig - bcum  # (B,NC,Q,H)
    m_intra = jax.lax.cummax(a, axis=2) + bcum  # (B,NC,Q,H): max_{s<=t}(b_t - b_s + i_s)

    if initial_state is None:
        s0 = jnp.zeros((b, h, dh, dh), f32)
        n0 = jnp.zeros((b, h, dh), f32)
        m0 = jnp.full((b, h), -jnp.inf, f32)
    else:
        s0, n0, m0 = (x.astype(f32) for x in initial_state)

    def scan_chunk(carry, xs):
        s_in, n_in, m_in = carry
        bcum_i, btot_i, a_i, m_intra_i, q_i, k_i, v_i = xs
        # Shapes: bcum_i (B,Q,H), btot_i (B,H), a_i (B,Q,H), q/k/v (B,Q,H,DH)

        # Per-position stabilizer.
        m_t = jnp.maximum(m_in[:, None, :] + bcum_i, m_intra_i)  # (B,Q,H)

        # Intra-chunk: D[t,s] = exp(b_t - b_s + i_s - m_t), s <= t.
        qn = bcum_i[:, :, None, :] + a_i[:, None, :, :]  # b_t + (i_s - b_s): (B,T,S,H)
        d = qn - m_t[:, :, None, :]
        ti = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        si = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        causal = (si <= ti)[None, :, :, None]
        w = jnp.where(causal, jnp.exp(d), 0.0)  # (B,T,S,H)

        scores = jnp.einsum("bthd,bshd->btsh", q_i, k_i)
        cw = scores * w
        num = jnp.einsum("btsh,bshd->bthd", cw, v_i)
        den = jnp.sum(cw, axis=2)  # (B,T,H)

        # Inter-chunk contribution.
        inter = jnp.exp(m_in[:, None, :] + bcum_i - m_t)  # (B,T,H)
        num = num + inter[..., None] * jnp.einsum("bthd,bhde->bthe", q_i, s_in)
        den = den + inter * jnp.einsum("bthd,bhd->bth", q_i, n_in)

        den = jnp.maximum(jnp.abs(den), jnp.exp(-m_t))
        h_out = num / den[..., None]

        # Carry update to chunk end.
        m_out = jnp.maximum(m_in + btot_i, m_intra_i[:, -1, :])  # (B,H)
        w_end = jnp.exp(btot_i[:, None, :] + a_i - m_out[:, None, :])  # (B,S,H)
        s_out = (
            jnp.exp(m_in + btot_i - m_out)[:, :, None, None] * s_in
            + jnp.einsum("bsh,bshd,bshe->bhde", w_end, k_i, v_i)
        )
        n_out = (
            jnp.exp(m_in + btot_i - m_out)[:, :, None] * n_in
            + jnp.einsum("bsh,bshd->bhd", w_end, k_i)
        )
        return (s_out, n_out, m_out), h_out

    xs = (
        bcum.transpose(1, 0, 2, 3),
        btot.transpose(1, 0, 2),
        a.transpose(1, 0, 2, 3),
        m_intra.transpose(1, 0, 2, 3),
        qc.transpose(1, 0, 2, 3, 4),
        kc.transpose(1, 0, 2, 3, 4),
        vc.transpose(1, 0, 2, 3, 4),
    )
    (s_f, n_f, m_f), hs = jax.lax.scan(scan_chunk, (s0, n0, m0), xs)
    h_seq = hs.transpose(1, 0, 2, 3, 4).reshape(b, t, h, dh)
    return h_seq, (s_f, n_f, m_f)
