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

Training uses the custom-VJP pair below (`flash_relpos_attention_train`):
the forward additionally emits per-row logsumexp residuals, and two backward
kernels recompute the tiles flash-style to produce dQ/dK/dV *and* the
relative-embedding gradient dRel (a banded transposed accumulation — the
piece XLA cannot fuse, and the reason the round-1 training path fell back
to the O(T^2)-materializing XLA attention). Numerics: bf16 matmul inputs,
fp32 accumulation, matching XLA's default f32 precision on TPU.

Replaces the backward of reference model_transformer.py:54-90 (torch autograd
over the materialized (B,H,T,T) score tensor).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NUM_META

NEG_INF = -1e30
LANES = 128  # lse/delta are stored lane-replicated for aligned writes


def _flash_relpos_kernel(
    q_ref, k_ref, v_ref, rel_ref,  # inputs
    o_ref, lse_ref,  # outputs
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
        lse = m_scratch[:] + jnp.log(l_scratch[:])  # (Bq, 1)
        lse_ref[0] = jnp.broadcast_to(lse, (block_q, LANES))


def _pad_rel(rel_emb: jax.Array, t: int, block_q: int, block_k: int):
    """Pad rel rows: block_q-1 zeros at the FRONT (so every band slice stays
    in range and above-diagonal shear reads land on zeros at the back) and
    enough at the back to (a) cover band slices, (b) keep the row count a
    multiple of 8 for aligned VMEM scratch in the backward."""
    rows = t + (block_q - 1) + (block_q + block_k)
    back = (block_q + block_k) + ((-rows) % 8)
    return jnp.pad(rel_emb, ((0, 0), (block_q - 1, back), (0, 0)))


def _flash_fwd(
    q, k, v, rel_emb, scale, n_meta, block_q, block_k, interpret
):
    """Core forward (T divisible by blocks). Returns (out, lse[BH,T,LANES])."""
    b, h, t, d = q.shape
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    rel_padded = _pad_rel(rel_emb, t, block_q, block_k)
    rel_rows = rel_padded.shape[1]

    grid = (b * h, t // block_q, t // block_k)

    kernel = functools.partial(
        _flash_relpos_kernel,
        scale=scale, block_q=block_q, block_k=block_k, seq_len=t, n_meta=n_meta,
    )

    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kj: (bh, qi, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda bh, qi, kj: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, rel_padded)
    return out.reshape(b, h, t, d), lse


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
    t = q.shape[2]
    out_dtype = q.dtype
    # f32 refs: Mosaic's dynamic sublane offsets in the rel-band reads are
    # 8-aligned for f32 but need 16-alignment for bf16 blocks (bf16 inputs
    # failed to compile); the kernel casts to bf16 for its matmuls anyway.
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    rel_emb = rel_emb.astype(jnp.float32)
    # The learned buffer may be longer than the sequence (model configured
    # for block 2048, run at a shorter block): use the first T rows, exactly
    # like the XLA path's rel_emb[:, :t, :].
    rel_emb = rel_emb[:, :t, :]
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
        rel_emb = jnp.pad(rel_emb, ((0, 0), (pad, 0), (0, 0)))
    out, _ = _flash_fwd(
        q, k, v, rel_emb, scale, n_meta, block_q, block_k, interpret
    )
    return out[:, :, :t, :].astype(out_dtype)


# ---------------------------------------------------------------------------
# Backward kernels (custom VJP)
# ---------------------------------------------------------------------------

def _recompute_tile(
    q_ref, k_ref, v_ref, rel_ref, do_ref, lse_ref, delta_ref,
    *, scale, block_q, block_k, seq_len, n_meta, qi, kj,
):
    """Recompute p and d(ac+bd) = ds for one (q-tile, k-tile).

    Returns (q, k, band, p, ds, base, band_len) with p/ds fp32 (Bq, Bk).
    """
    q_start = qi * block_q
    k_start = kj * block_k
    band_len = block_q + block_k
    base = (seq_len - 1) + k_start - q_start

    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    do = do_ref[0].astype(jnp.bfloat16)

    ac = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    band = rel_ref[0, pl.ds(base, band_len), :].astype(jnp.bfloat16)
    p_band = jax.lax.dot_general(
        q, band, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    shear_shift = (-(block_q - 1)) % band_len
    bd = pltpu.roll(p_band, shift=shear_shift, axis=1, stride=1, stride_axis=0)
    bd = bd[:, :block_k]

    s = (ac + bd) * scale
    rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    visible = (cols <= rows) | (cols < n_meta)
    s = jnp.where(visible, s, NEG_INF)

    lse = lse_ref[0][:, :1]  # (Bq, 1)
    p = jnp.exp(s - lse)  # masked entries -> exp(-1e30) == 0

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Bk) = do . v^T
    delta = delta_ref[0][:, :1]  # (Bq, 1) = sum_d o * do
    ds = p * (dp - delta) * scale  # d(ac + bd)
    return q, k, band, do, p, ds, base, band_len


def _unshear(ds: jax.Array, block_q: int, block_k: int) -> jax.Array:
    """Inverse of the forward shear: dp_band[r, j] = ds[r, j - (Bq-1) + r]
    (zero where out of band — the wrapped reads land on the zero padding
    columns [Bk, L)).

    The direct form needs a roll with stride -1 (or L-1 mod L), which Mosaic
    rejects ("max shift in a vreg larger than vreg width"). Equivalent
    supported form: conjugate a stride=+1 roll with the row-reversal
    permutation P (two cheap 128x128 MXU matmuls):

        dp_band = P @ roll(P @ ds_ext, shift=0, stride=1, stride_axis=0)

    since (P@B)[r] = B[Bq-1-r] and roll gives B[r', j] = A[r', j - r'].
    """
    band_len = block_q + block_k
    ds_ext = jnp.concatenate(
        [ds, jnp.zeros((block_q, band_len - block_k), ds.dtype)], axis=1
    )
    ri = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_q), 1)
    perm = (ri + ci == block_q - 1).astype(jnp.bfloat16)
    a = jax.lax.dot_general(
        perm, ds_ext.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    b = pltpu.roll(a, shift=0, axis=1, stride=1, stride_axis=0)
    return jax.lax.dot_general(
        perm, b.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, rel_ref, do_ref, lse_ref, delta_ref,
    dq_ref, drel_ref,
    dq_acc, drel_acc,
    *, scale, block_q, block_k, seq_len, n_meta,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((qi == 0) & (kj == 0))
    def _init_drel():
        drel_acc[:] = jnp.zeros_like(drel_acc)

    q_start = qi * block_q
    k_start = kj * block_k
    tile_needed = (k_start <= q_start + block_q - 1) | (k_start < n_meta)

    @pl.when(tile_needed)
    def _compute():
        q, k, band, do, p, ds, base, band_len = _recompute_tile(
            q_ref, k_ref, v_ref, rel_ref, do_ref, lse_ref, delta_ref,
            scale=scale, block_q=block_q, block_k=block_k,
            seq_len=seq_len, n_meta=n_meta, qi=qi, kj=kj,
        )
        ds_b = ds.astype(jnp.bfloat16)
        dq_acc[:] += jax.lax.dot_general(
            ds_b, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp_band = _unshear(ds, block_q, block_k).astype(jnp.bfloat16)
        dq_acc[:] += jax.lax.dot_general(
            dp_band, band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # drel band: dband[j, d] = sum_r dp_band[r, j] * q[r, d]
        dband = jax.lax.dot_general(
            dp_band, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (band_len, D)
        drel_acc[pl.ds(base, band_len), :] += dband

    @pl.when(kj == nk - 1)
    def _write_dq():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)

    @pl.when((qi == nq - 1) & (kj == nk - 1))
    def _write_drel():
        drel_ref[0] = drel_acc[:].astype(drel_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, rel_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, block_q, block_k, seq_len, n_meta,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q
    k_start = kj * block_k
    tile_needed = (k_start <= q_start + block_q - 1) | (k_start < n_meta)

    @pl.when(tile_needed)
    def _compute():
        q, k, band, do, p, ds, base, band_len = _recompute_tile(
            q_ref, k_ref, v_ref, rel_ref, do_ref, lse_ref, delta_ref,
            scale=scale, block_q=block_q, block_k=block_k,
            seq_len=seq_len, n_meta=n_meta, qi=qi, kj=kj,
        )
        p_b = p.astype(jnp.bfloat16)
        ds_b = ds.astype(jnp.bfloat16)
        dv_acc[:] += jax.lax.dot_general(
            p_b, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc[:] += jax.lax.dot_general(
            ds_b, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(qi == nq - 1)
    def _write():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(
    q, k, v, rel_emb, out, lse, do,
    scale, n_meta, block_q, block_k, interpret,
):
    """Returns (dq, dk, dv, drel). Core path: T divisible by blocks."""
    b, h, t, d = q.shape
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)
    dof = do.reshape(bh, t, d)
    rel_padded = _pad_rel(rel_emb, t, block_q, block_k)
    rel_rows = rel_padded.shape[1]

    delta = jnp.sum(
        out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1
    ).reshape(bh, t)[..., None]
    delta = jnp.broadcast_to(delta, (bh, t, LANES))

    block_shapes = [
        (1, block_q, d),  # q
        (1, block_k, d),  # k
        (1, block_k, d),  # v
        (1, rel_rows, d),  # rel
        (1, block_q, d),  # do
        (1, block_q, LANES),  # lse
        (1, block_q, LANES),  # delta
    ]

    # --- pass 1: dq + drel, grid (bh, qi, kj) ---
    h_heads = rel_padded.shape[0]
    maps_q = [
        lambda bh_, qi, kj: (bh_, qi, 0),
        lambda bh_, qi, kj: (bh_, kj, 0),
        lambda bh_, qi, kj: (bh_, kj, 0),
        lambda bh_, qi, kj: (bh_ % h_heads, 0, 0),
        lambda bh_, qi, kj: (bh_, qi, 0),
        lambda bh_, qi, kj: (bh_, qi, 0),
        lambda bh_, qi, kj: (bh_, qi, 0),
    ]
    dq, drel_per_bh = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel,
            scale=scale, block_q=block_q, block_k=block_k,
            seq_len=t, n_meta=n_meta,
        ),
        grid=(bh, t // block_q, t // block_k),
        in_specs=[
            pl.BlockSpec(s, m) for s, m in zip(block_shapes, maps_q)
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, qi, kj: (bh_, qi, 0)),
            pl.BlockSpec((1, rel_rows, d), lambda bh_, qi, kj: (bh_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, rel_rows, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((rel_rows, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, rel_padded, dof, lse, delta)

    # --- pass 2: dk + dv, grid (bh, kj, qi) ---
    maps_kv = [
        lambda bh_, kj, qi: (bh_, qi, 0),
        lambda bh_, kj, qi: (bh_, kj, 0),
        lambda bh_, kj, qi: (bh_, kj, 0),
        lambda bh_, kj, qi: (bh_ % h_heads, 0, 0),
        lambda bh_, kj, qi: (bh_, qi, 0),
        lambda bh_, kj, qi: (bh_, qi, 0),
        lambda bh_, kj, qi: (bh_, qi, 0),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            scale=scale, block_q=block_q, block_k=block_k,
            seq_len=t, n_meta=n_meta,
        ),
        grid=(bh, t // block_k, t // block_q),
        in_specs=[
            pl.BlockSpec(s, m) for s, m in zip(block_shapes, maps_kv)
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bh_, kj, qi: (bh_, kj, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh_, kj, qi: (bh_, kj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, rel_padded, dof, lse, delta)

    # Reduce drel over batch, unpad rows back to the (H, T, D) parameter.
    drel = drel_per_bh.reshape(b, h, rel_rows, d).sum(0)
    drel = drel[:, block_q - 1 : block_q - 1 + t, :].astype(rel_emb.dtype)
    return (
        dq.reshape(b, h, t, d), dk.reshape(b, h, t, d),
        dv.reshape(b, h, t, d), drel,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_train_core(q, k, v, rel_emb, scale, n_meta, block_q, block_k,
                      interpret):
    out, _ = _flash_fwd(q, k, v, rel_emb, scale, n_meta, block_q, block_k,
                        interpret)
    return out


def _flash_train_fwd(q, k, v, rel_emb, scale, n_meta, block_q, block_k,
                     interpret):
    out, lse = _flash_fwd(q, k, v, rel_emb, scale, n_meta, block_q, block_k,
                          interpret)
    return out, (q, k, v, rel_emb, out, lse)


def _flash_train_bwd(scale, n_meta, block_q, block_k, interpret, res, do):
    q, k, v, rel_emb, out, lse = res
    return _flash_bwd(q, k, v, rel_emb, out, lse, do,
                      scale, n_meta, block_q, block_k, interpret)


_flash_train_core.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_relpos_attention_train(
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
    """Differentiable fused attention: flash forward + flash backward
    (dQ/dK/dV/dRel), the training-path replacement for the XLA oracle."""
    t = q.shape[2]
    out_dtype = q.dtype
    # See flash_relpos_attention: f32 refs for Mosaic alignment; the VJP of
    # astype casts the gradients back automatically.
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    rel_emb = rel_emb.astype(jnp.float32)
    # See flash_relpos_attention: slice the (possibly longer) learned buffer
    # to T rows; the VJP then produces zero cotangents for unused rows.
    rel_emb = rel_emb[:, :t, :]
    pad = 0
    if t % block_q or t % block_k:
        pad = (-t) % max(block_q, block_k)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        rel_emb = jnp.pad(rel_emb, ((0, 0), (pad, 0), (0, 0)))
    out = _flash_train_core(q, k, v, rel_emb, scale, n_meta, block_q,
                            block_k, interpret)
    out = out[:, :, : q.shape[2] - pad, :] if pad else out
    return out.astype(out_dtype)
