"""Fused flash attention with relative positions + metadata prefix — Pallas.

TPU kernel replacing the XLA reference implementation in ops/attention.py
for the forward pass: online-softmax tiles (never materializing the (T, T)
score matrix in HBM), with the Transformer-XL BD term computed per tile via
a banded matmul + shear reshape:

    BD[t, s] = q_t . rel[s - t + T - 1]

Per (q-tile, k-tile) the needed rel rows form a contiguous band of length
Bq + Bk - 1; P = q_tile @ band^T is sheared into the tile with the
pad/flatten/slice/reshape trick (the tile-level generalization of
`rel_shift`, see ops/attention.rel_shift), so no gathers are needed.

Mask: causal with the first `n_meta` key columns always visible
(reference model_transformer.py:8-16 generate_matrix).

Forward-only: training uses the XLA path (whose backward XLA derives);
sampling prefill uses this kernel. Numerics: fp32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NUM_META

NEG_INF = -1e30


def _flash_relpos_kernel(
    q_ref, k_ref, v_ref, rel_ref,  # inputs
    o_ref,  # output
    m_scratch, l_scratch, acc_scratch,  # online-softmax state
    *, scale: float, block_q: int, block_k: int, seq_len: int, n_meta: int,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    k_start = kj * block_k

    # Skip tiles that are entirely above the causal diagonal AND outside the
    # metadata prefix columns.
    tile_needed = (k_start <= q_start + block_q - 1) | (k_start < n_meta)

    @pl.when(tile_needed)
    def _compute():
        # bf16 matmul inputs with fp32 accumulation: matches XLA's default
        # f32 matmul precision on TPU at ~4x the fp32 MXU rate.
        q = q_ref[0].astype(jnp.bfloat16)  # (Bq, D)
        k = k_ref[0].astype(jnp.bfloat16)  # (Bk, D)
        v = v_ref[0].astype(jnp.bfloat16)  # (Bk, D)

        ac = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, Bk)

        # BD band: rel rows for rel-index base + (c - r), c in [0,Bk),
        # r in [0,Bq). base = (T-1) + k_start - q_start. rel_ref is padded by
        # block_q - 1 rows at the FRONT (and block_k at the back); in padded
        # coordinates the band [base-(Bq-1), base+Bk-1] starts at `base`
        # (always in range for non-skipped tiles: k_start <= q_start+Bq-1).
        # Band length padded to Bq+Bk (instead of the minimal Bq+Bk-1) to
        # keep lane shapes 128-aligned for Mosaic.
        band_len = block_q + block_k
        base = (seq_len - 1) + k_start - q_start
        band = rel_ref[0, pl.ds(base, band_len), :].astype(jnp.bfloat16)
        p = jax.lax.dot_general(
            q, band, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bq, band_len)

        # Shear: bd[r, c] = p[r, c + (Bq - 1) - r]. TPU's strided rotate does
        # this in one op: right-rotate row r by (shift + r) with
        # shift = -(Bq-1) mod band_len, so the rotated index is
        # (c - shift - r) mod L = c + (Bq-1) - r (never wraps into the used
        # columns: c + Bq-1 - r ranges [0, band_len-1]).
        shear_shift = (-(block_q - 1)) % band_len
        bd = pltpu.roll(p, shift=shear_shift, axis=1, stride=1, stride_axis=0)
        bd = bd[:, :block_k]

        s = (ac + bd) * scale

        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        visible = (cols <= rows) | (cols < n_meta)
        s = jnp.where(visible, s, NEG_INF)

        m_prev = m_scratch[:]  # (Bq, 1)
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p_exp = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p_exp, axis=1, keepdims=True)

        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p_exp.astype(jnp.bfloat16), v,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    @pl.when(kj == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:]).astype(o_ref.dtype)


def flash_relpos_attention(
    q: jax.Array,  # (B, H, T, D)
    k: jax.Array,
    v: jax.Array,
    rel_emb: jax.Array,  # (H, T, D)
    scale: float,
    n_meta: int = NUM_META,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.attention.relpos_attention (forward)."""
    b, h, t, d = q.shape
    if t % block_q or t % block_k:
        # Pad T so tiles divide evenly; padded queries/keys are masked by the
        # causal rule (their rows are sliced off, their cols are > any real
        # row... cols of padded keys ARE > real rows, so invisible).
        pad = (-t) % max(block_q, block_k)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # rel rows are distance-indexed from the END (row T-1-d for distance
        # d), so padding must go at the FRONT to keep distances aligned.
        out = flash_relpos_attention(
            q, k, v, jnp.pad(rel_emb, ((0, 0), (pad, 0), (0, 0))),
            scale, n_meta, block_q, block_k, interpret,
        )
        return out[:, :, :t, :]

    # Flatten (B, H) into the grid's first dim; rel is per head.
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    # Pad rel rows: block_q-1 zeros at the front and block_q+block_k at the
    # back, so every band slice (length Bq+Bk starting at `base` <= T+Bq-2 in
    # padded coords) stays in range. Index map selects the head's slab.
    rel_padded = jnp.pad(rel_emb, ((0, 0), (block_q - 1, block_q + block_k), (0, 0)))
    rel_rows = rel_padded.shape[1]

    grid = (b * h, t // block_q, t // block_k)

    kernel = functools.partial(
        _flash_relpos_kernel,
        scale=scale, block_q=block_q, block_k=block_k, seq_len=t, n_meta=n_meta,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kj: (bh, kj, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kj: (bh, kj, 0)),
            pl.BlockSpec(
                (1, rel_rows, d), lambda bh, qi, kj: (bh % (rel_padded.shape[0]), 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, kj: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, rel_padded)
    return out.reshape(b, h, t, d)
