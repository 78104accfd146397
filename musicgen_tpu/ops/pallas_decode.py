"""Fused full-model Mamba-2 decode step — Pallas TPU kernel.

The reference samples by re-forwarding the whole 2048-token window per token
(scripts/generate.py:26-29, the ~26 tok/s bottleneck). Round 1 replaced that
with an O(1)-state `lax.scan` decode; this kernel removes the remaining
bottleneck of THAT loop.

Measured on the target chip (experiments/kernel_ablate.py): the kernel is
purely DMA-bound — a DMA-only variant costs the same 229 us/step as the
full kernel, streaming 166 MB of bf16 weights/token at ~725 GB/s (~89% of
the v5e's 819 GB/s HBM bandwidth), with all compute hidden under the
pipeline. The XLA step path costs ~250-325 us and cannot reach this point:
XLA's small-M bf16 matmul lowering on this target is slower than fp32
(measured; the cause of round 1's "bf16 regression"), so the bf16 — and
int8 — streaming wins require a hand kernel. Three variants share the body:
  * bf16 (default): bf16 weights, fp32 elementwise; logits at bf16 tolerance.
  * quant='int8': W8A8 — per-output-column int8 weights, dynamic per-row
    activation quant onto the MXU int8 path; halves the stream (~120
    us/step, 1.9x) at ~8-bit logit noise.
  * tail_inputs=...: the sampler tail (grammar filter, repetition penalty,
    exact top-3) runs as one extra grid step over VMEM-resident logits;
    only (vals, idxs) top-3 leave the kernel (fused_sample_step).

Design: ONE `pallas_call` advances the WHOLE model by one token.
  - grid = (n_layers + head_chunks,). Grid steps 0..L-1 run one mixer layer
    each, streaming that layer's in_proj/out_proj weights (bf16, ~13 MB)
    HBM->VMEM, double-buffered by the Pallas pipeline against the previous
    layer's compute. Steps L.. run the final LayerNorm + lm_head, streaming
    the bf16 lm_head in N-chunks (prefetched while the last mixers compute).
  - The (8, d_model) activation row-block lives in VMEM scratch and persists
    across grid steps (batch rows 0..B-1 real, rest zero).
  - Per-layer conv tail and SSM state are kernel inputs aliased to outputs
    (read+write once per step, no extra copies).
  - All elementwise work (conv step, silu, softplus gating, state update,
    gated RMSNorm) happens in-register between the matmuls, eliminating the
    per-op dispatch overhead of the XLA path.

Mosaic-layout notes: the compiler rejects lane<->sublane reshapes (e.g.
(B, H*P) -> (B, H, P)), so the whole kernel is rank-2. The SSM state is laid
out as S[h*P+p, b*N+n] (lanes = batch-major state columns, 128-aligned for
B=2/N=64) and every head- or batch-expansion is a tiny constant matmul:

  per-head -> per-channel broadcast:  dt_e = dt  @ E,   E[h, h*P+p] = 1
  batch-blocked outer product:        upd  = dtx^T_via_dot @ Bdiag, where
      Bdiag[b, b*N+n] = B[b, n] (block-diagonal; built by lane-tiling + mask)
  state read-out:                     y^T  = S @ Cdiag^T (same trick)

Contracting over the B dim with a block-diagonal right operand keeps each
batch's contribution in its own lane block, so no transposes or reshapes are
ever materialized. Layer-constant expansions (E itself, A and D broadcast to
channels) are precomputed once in `build_decode_params`, not in-kernel.

HBM traffic per token: ~129 MB of bf16 mixer weights + ~37 MB bf16 lm_head +
~2 MB state r/w. Numerics: matmuls are bf16 x bf16 with fp32 accumulation;
everything else fp32. Logits match the XLA step to bf16 tolerance
(tests/test_pallas_decode).

Replaces: the per-token path of the reference's `mamba_ssm` CUDA kernels
(models/mamba/mamba.py:17, SURVEY.md §2.3) at decode time.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MambaConfig

_ROWS = 8  # minimum matmul row block (fp32 sublane tile); see DecodeDims.rows
_HEAD_CHUNKS = 5  # lm_head streamed in this many N-chunks


@dataclasses.dataclass(frozen=True)
class DecodeDims:
    n_layers: int
    batch: int
    d_model: int  # 1024
    d_inner: int  # 2048 (= nheads * headdim = rows of the state layout)
    nheads: int  # 32
    headdim: int  # 64
    d_state: int  # 64
    conv_dim: int  # d_inner + 2*d_state (ngroups=1) = 2176
    d_in_proj: int  # 2*d_inner + 2*d_state + nheads = 4256
    d_in_pad: int  # padded to lane multiple = 4352
    padded_vocab: int  # 17920
    head_chunk: int  # padded_vocab / _HEAD_CHUNKS
    vocab_size: int  # 17914 (unpadded; tail softmax excludes pad lanes)
    dyn_start: int  # vocab field boundaries (tail penalty bases)
    length_start: int
    rows: int  # matmul row block = batch padded up to a sublane multiple;
    # weights stream ONCE per step regardless of batch, so serving batches
    # (up to VMEM limits) ride the same DMA cost

    @classmethod
    def create(cls, cfg: MambaConfig, batch: int) -> "DecodeDims":
        from ..config import VOCAB

        assert cfg.ngroups == 1, "fused decode kernel assumes ngroups=1"
        # The kernel bakes in the reference's no-residual stack quirk
        # (models/mamba/mamba.py:32-33): x is OVERWRITTEN per layer, never
        # added. A residual-enabled config must take the XLA step path.
        assert not cfg.residual, "fused decode kernel implements residual=False only"
        d_in_proj = 2 * cfg.d_inner + 2 * cfg.d_state + cfg.nheads
        d_in_pad = -(-d_in_proj // 128) * 128
        pv = cfg.padded_vocab
        assert pv % (_HEAD_CHUNKS * 128) == 0, pv
        return cls(
            vocab_size=cfg.vocab_size,
            dyn_start=VOCAB.dyn_start,
            length_start=VOCAB.length_start,
            rows=max(_ROWS, -(-batch // 8) * 8),
            n_layers=cfg.n_layers,
            batch=batch,
            d_model=cfg.d_model,
            d_inner=cfg.d_inner,
            nheads=cfg.nheads,
            headdim=cfg.headdim,
            d_state=cfg.d_state,
            conv_dim=cfg.conv_dim,
            d_in_proj=d_in_proj,
            d_in_pad=d_in_pad,
            padded_vocab=pv,
            head_chunk=pv // _HEAD_CHUNKS,
        )


def _dot(a, b, contract=((1,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32
    )


def _qdot(x, wq, s):
    """W8A8 matmul with K-group scales: x (M, K) f32, wq (K, N) int8
    quantized per (256-row group x output column), s (G, N) f32 group
    scales. The matmul splits into G partial int8 MXU matmuls; each partial
    sum is exact under its own scale, so grouping costs nothing at runtime
    (the kernel is DMA-bound) while cutting quantization error vs the
    round-2 per-column-only scales. Activations are dynamically quantized
    per (row x group)."""
    g_n, n = s.shape
    k = wq.shape[0]
    gsz = k // g_n
    acc = jnp.zeros((x.shape[0], n), jnp.float32)
    for g in range(g_n):
        xg = x[:, g * gsz : (g + 1) * gsz]
        ax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)  # (M, 1)
        s_x = jnp.maximum(ax, 1e-20) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(xg / s_x), -127.0, 127.0).astype(jnp.int8)
        part = jax.lax.dot_general(
            xq, wq[g * gsz : (g + 1) * gsz],
            ((((1,), (0,))), ((), ())), preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * s_x * s[g : g + 1, :]
    return acc


def _w8dot(x, wq, s):
    """Weight-only int8 (W8A16) with K-group scales: int8 weights promoted
    to bf16 on the fly, bf16 activations, fp32 accumulation; the (G, N)
    group scale multiplies each K-group's partial sum. Same halved HBM
    stream as W8A8 but no activation-quant noise (experiments/int8_quality.py)."""
    g_n, n = s.shape
    k = wq.shape[0]
    gsz = k // g_n
    acc = jnp.zeros((x.shape[0], n), jnp.float32)
    for g in range(g_n):
        part = _dot(
            x[:, g * gsz : (g + 1) * gsz].astype(jnp.bfloat16),
            wq[g * gsz : (g + 1) * gsz].astype(jnp.bfloat16),
        )
        acc = acc + part * s[g : g + 1, :]
    return acc


def _mixer_math(
    x,  # (rows, d_model) f32
    w_in, w_in_s, w_out, w_out_s,  # weight blocks (+ scales or None)
    conv_w,  # (4, conv_dim) f32
    conv_b,  # (1, conv_dim) f32
    dt_bias,  # (1, 128) f32
    a_e,  # (1, d_inner) f32
    d_e,  # (1, d_inner) f32
    e_mat,  # (nheads, d_inner) f32
    norm_w,  # (1, d_inner) f32
    cs,  # (B, 3, conv_dim) f32 conv state
    s,  # (d_inner, B*N) f32 SSM state
    dims: DecodeDims,
    quant: str,
):
    """One Mamba-2 mixer layer on a single token (values in, values out).

    Shared by the per-token kernel (_decode_kernel, HBM-aliased states) and
    the whole-generation kernel (ops/pallas_generate, VMEM-resident states).
    Returns (x_out (rows, d_model), cs_new (B, 3, conv_dim), s_new)."""
    B = dims.batch
    di, dc, dh = dims.d_inner, dims.conv_dim, dims.nheads
    ds = dims.d_state
    f32 = jnp.float32

    if quant == "w8a8":
        zx = _qdot(x, w_in, w_in_s)
    elif quant == "w8a16":
        zx = _w8dot(x, w_in, w_in_s)
    else:
        zx = _dot(x.astype(jnp.bfloat16), w_in)  # (rows, d_in_pad)

    z = zx[:B, 0:di]  # (B, d_inner)
    xbc_new = zx[:B, di : di + dc]  # (B, conv_dim) raw conv input
    dt_raw = zx[:B, di + dc : di + dc + dh]  # (B, nheads)

    # Depthwise causal conv, 4-tap window (ops/ssm.causal_conv1d_step
    # semantics: state rows oldest->newest, tap K-1 hits the newest).
    y_conv = (
        cs[:, 0, :] * conv_w[0][None, :]
        + cs[:, 1, :] * conv_w[1][None, :]
        + cs[:, 2, :] * conv_w[2][None, :]
        + xbc_new * conv_w[3][None, :]
        + conv_b
    )  # (B, conv_dim)
    cs_new = jnp.stack([cs[:, 1, :], cs[:, 2, :], xbc_new], axis=1)

    xbc = y_conv * jax.nn.sigmoid(y_conv)  # silu
    x_ssd = xbc[:, :di]  # (B, d_inner), lanes = h*P+p
    b_vec = xbc[:, di : di + ds]  # (B, N)
    c_vec = xbc[:, di + ds : di + 2 * ds]  # (B, N)

    dt = jax.nn.softplus(dt_raw + dt_bias[0, :dh][None, :])  # (B, H)
    dt_e = _dot(dt, e_mat)  # (B, d_inner) per-channel dt
    decay_e = jnp.exp(dt_e * a_e)  # (B, d_inner)
    dtx = x_ssd * dt_e  # (B, d_inner)

    # Block-diagonal B/C: lane-tile (B, N) -> (B, B*N), mask off-blocks.
    b_of_col = jax.lax.broadcasted_iota(jnp.int32, (B, B * ds), 1) // ds
    b_row = jax.lax.broadcasted_iota(jnp.int32, (B, B * ds), 0)
    eb = (b_of_col == b_row).astype(f32)  # (B, B*N)
    b_diag = jnp.concatenate([b_vec] * B, axis=1) * eb
    c_diag = jnp.concatenate([c_vec] * B, axis=1) * eb

    # Contract over the batch dim; block-diagonality keeps batches apart.
    decay2d = _dot(decay_e, eb, contract=((0,), (0,)))  # (d_inner, B*N)
    upd = _dot(dtx, b_diag, contract=((0,), (0,)))  # (d_inner, B*N)

    s_new = s * decay2d + upd

    y_t = _dot(s_new, c_diag, contract=((1,), (1,)))  # (d_inner, B)
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    ).astype(f32)
    y = _dot(eye_b, y_t, contract=((1,), (1,)))  # (B, d_inner)
    y = y + x_ssd * d_e  # D residual

    # Gated RMSNorm (models/mamba._rms_norm_gated semantics).
    g = y * (z * jax.nn.sigmoid(z))
    var = jnp.mean(g * g, axis=-1, keepdims=True)
    g = g * jax.lax.rsqrt(var + 1e-5) * norm_w

    if dims.rows == B:
        g_rows = g
    else:
        g_rows = jnp.concatenate(
            [g, jnp.zeros((dims.rows - B, di), f32)], axis=0
        )  # (rows, d_inner); zero pad rows keep x pad rows zero
    if quant == "w8a8":
        x_out = _qdot(g_rows, w_out, w_out_s)
    elif quant == "w8a16":
        x_out = _w8dot(g_rows, w_out, w_out_s)
    else:
        x_out = _dot(g_rows.astype(jnp.bfloat16), w_out)
    return x_out, cs_new, s_new


def _head_math(x, ln, lm_w, lm_s, quant):
    """Final LayerNorm (recomputed per chunk — trivially cheap) + lm_head
    N-chunk. Returns chunk logits (rows, head_chunk), pre-bias."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    h = h * ln[0][None, :] + ln[1][None, :]
    if quant == "w8a8":
        return _qdot(h, lm_w, lm_s)
    elif quant == "w8a16":
        return _w8dot(h, lm_w, lm_s)
    return _dot(h.astype(jnp.bfloat16), lm_w)


def _tail_math(x, gram, hist, bucket_oh, dims: DecodeDims):
    """Grammar-filtered, penalty-divided sampling weights + exact top-3 —
    the XLA sampler tail (sample/sampler.py steps 1-2 and the top-k of step
    4). Semantics match ops/grammar.filtered_logits + penalty_divisor +
    _iter_top_k (ties -> lowest index).

    x: (rows, Vp) logits incl. bias; gram: (8, Vp) zero-row-padded grammar
    table; hist: (rows, Vp) f32 window counts; bucket_oh: (rows, 8) one-hot
    of the prev token's field. Returns (vals, idx) (rows, 128), top-3 in
    lanes 0-2."""
    f32 = jnp.float32
    vp = dims.padded_vocab
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    real = ids < dims.vocab_size
    xm = jnp.where(real, x, -1e30)  # pad lanes out of the softmax
    m = jnp.max(xm, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(xm - m), axis=-1, keepdims=True)) + m
    # Grammar row per batch row, selected by the prev-token field bucket:
    # an (8,8)x(8,Vp) MXU matmul against the (zero-row-padded) grammar
    # table gathers the rows.
    mask = jax.lax.dot_general(
        bucket_oh, gram, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, Vp)
    w = (lse - xm) * mask
    w = jnp.where(real & (mask > 0.0), w, 0.0)

    log_base = jnp.where(
        ids < dims.dyn_start,
        jnp.float32(0.00995033085316808),  # ln 1.01
        jnp.where(
            ids < dims.length_start,
            jnp.float32(0.019802627296179712),  # ln 1.02
            0.0,
        ),
    )
    pen = jnp.minimum(jnp.exp(hist * log_base), 1.2)
    w = w / pen

    lane = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 128), 1)
    out_vals = jnp.zeros((x.shape[0], 128), f32)
    out_idx = jnp.zeros((x.shape[0], 128), jnp.int32)
    for k in range(3):
        mk = jnp.max(w, axis=-1, keepdims=True)
        cand = jnp.where(w == mk, ids, vp)
        ik = jnp.min(cand, axis=-1, keepdims=True)
        out_vals = jnp.where(
            lane == k, jnp.broadcast_to(mk, out_vals.shape), out_vals
        )
        out_idx = jnp.where(
            lane == k, jnp.broadcast_to(ik, out_idx.shape), out_idx
        )
        w = jnp.where(ids == ik, -1e30, w)
    return out_vals, out_idx


def _decode_kernel(
    # inputs
    x_in_ref,  # (_ROWS, d_model) f32 — embedded token, zero-padded rows
    w_in_ref,  # (1, d_model, d_in_pad) bf16
    w_out_ref,  # (1, d_inner, d_model) bf16
    conv_w_ref,  # (1, 4, conv_dim) f32
    conv_b_ref,  # (1, 1, conv_dim) f32
    dt_bias_ref,  # (1, 1, 128) f32 (nheads used)
    a_e_ref,  # (1, 1, d_inner) f32: -exp(A_log) per channel
    d_e_ref,  # (1, 1, d_inner) f32: D per channel
    e_ref,  # (nheads, d_inner) f32: one-hot head->channel expansion
    norm_w_ref,  # (1, 1, d_inner) f32
    ln_ref,  # (2, d_model) f32: final LayerNorm scale | bias
    lm_w_ref,  # (d_model, head_chunk) bf16 lm_head N-chunk
    conv_state_ref,  # (1, B, 3, conv_dim) f32 (aliased to output)
    ssm_state_ref,  # (1, d_inner, B*N) f32, S[h*P+p, b*N+n] (aliased)
    # quant='int8' adds 3 scale inputs (w_in_s, w_out_s, lm_s); tail=True
    # adds (lm_b chunk, grammar (5, Vp), hist (_ROWS, Vp)) inputs, swaps the
    # logits output for (vals, idx) top-3 outputs, and adds a logits
    # scratch. Then outputs (conv_state_out, ssm_state_out) and scratch.
    *rest,
    dims: DecodeDims,
    quant: str = "none",  # 'none' | 'w8a8' | 'w8a16'
    tail: bool = False,
):
    rest = list(rest)
    if quant != "none":
        w_in_s_ref, w_out_s_ref, lm_s_ref = rest[:3]
        del rest[:3]
    if tail:
        (lm_b_ref, gram_ref, hist_ref,
         vals_ref, idx_ref, conv_state_out_ref, ssm_state_out_ref,
         x_scr, logit_scr) = rest
    else:
        (logits_ref, conv_state_out_ref, ssm_state_out_ref, x_scr) = rest
    i = pl.program_id(0)
    L = dims.n_layers
    B = dims.batch
    di, dc, dh = dims.d_inner, dims.conv_dim, dims.nheads
    ds = dims.d_state
    f32 = jnp.float32

    @pl.when(i == 0)
    def _():
        x_scr[:, :] = x_in_ref[:, :]

    @pl.when(i < L)
    def _mixer():
        x_out, cs_new, s_new = _mixer_math(
            x_scr[:, :],
            w_in_ref[0],
            w_in_s_ref[0] if quant != "none" else None,
            w_out_ref[0],
            w_out_s_ref[0] if quant != "none" else None,
            conv_w_ref[0],
            conv_b_ref[0],
            dt_bias_ref[0],
            a_e_ref[0],
            d_e_ref[0],
            e_ref[:, :],
            norm_w_ref[0],
            conv_state_ref[0],
            ssm_state_ref[0],
            dims,
            quant,
        )
        conv_state_out_ref[0] = cs_new
        ssm_state_out_ref[0] = s_new
        x_scr[:, :] = x_out

    n_head_end = L + _HEAD_CHUNKS

    @pl.when(jnp.logical_and(i >= L, i < n_head_end))
    def _head():
        chunk_logits = _head_math(
            x_scr[:, :],
            ln_ref[:, :],
            lm_w_ref[:, :],
            lm_s_ref[:, :] if quant != "none" else None,
            quant,
        )
        if tail:
            chunk_logits = chunk_logits + lm_b_ref[:, :]
            c0 = (i - L) * dims.head_chunk
            logit_scr[:, pl.ds(c0, dims.head_chunk)] = chunk_logits
        else:
            logits_ref[:, :] = chunk_logits

    if tail:

        @pl.when(i == n_head_end)
        def _tail():
            # The wrapper packs the prev-field bucket one-hot into hist's 8
            # trailing pad lanes [vp, vp+8) — see fused_sample_step.
            vp = dims.padded_vocab
            out_vals, out_idx = _tail_math(
                logit_scr[:, :],
                gram_ref[:, :],
                hist_ref[:, :vp],
                hist_ref[:, vp : vp + 8],
                dims,
            )
            vals_ref[:, :] = out_vals
            idx_ref[:, :] = out_idx


def _clamp_layer(i, L):
    return jnp.minimum(i, L - 1)


@functools.partial(jax.jit, static_argnames=("dims", "interpret", "quant_mode"))
def fused_decode_step(
    x0: jax.Array,  # (B, d_model) f32 embedded token
    w_in: jax.Array,  # (L, d_model, d_in_pad) bf16 | int8
    w_out: jax.Array,  # (L, d_inner, d_model) bf16 | int8
    conv_w: jax.Array,  # (L, 4, conv_dim) f32
    conv_b: jax.Array,  # (L, 1, conv_dim) f32
    dt_bias: jax.Array,  # (L, 1, 128) f32
    a_e: jax.Array,  # (L, 1, d_inner) f32
    d_e: jax.Array,  # (L, 1, d_inner) f32
    e_mat: jax.Array,  # (nheads, d_inner) f32
    norm_w: jax.Array,  # (L, 1, d_inner) f32
    ln: jax.Array,  # (2, d_model) f32
    lm_w: jax.Array,  # (d_model, padded_vocab) bf16 | int8
    conv_state: jax.Array,  # (L, B, 3, conv_dim) f32
    ssm_state: jax.Array,  # (L, d_inner, B*N) f32
    dims: DecodeDims,
    interpret: bool = False,
    scales: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    # scales = (w_in_s (L, G_in, d_in_pad), w_out_s (L, G_out, d_model),
    # lm_s (G_lm, Vp)) — K-group x output-column int8 scales (G = K/256):
    # presence selects an int8 variant (weights must then be int8);
    # quant_mode picks 'w8a8' (activations quantized too, MXU int8 path) or
    # 'w8a16' (weights dequantized to bf16 in-kernel).
    quant_mode: str = "w8a8",
    tail_inputs: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    # tail_inputs = (lm_b (1, Vp), grammar (8, Vp) zero-row-padded table,
    # hist_oh (_ROWS, Vp + 128) penalty counts with the field-bucket one-hot
    # packed in lanes [Vp, Vp+8)): presence selects the in-kernel sampler
    # tail — outputs become (vals (B,3), idxs (B,3)) instead of logits.
) -> Tuple[jax.Array, ...]:
    """Advance the whole model by one token. Returns (logits (B, padded_vocab)
    pre-bias, new_conv_state, new_ssm_state), or with tail_inputs
    ((vals (B,128), idxs (B,128) — top-3 in lanes 0-2), conv, ssm)."""
    L = dims.n_layers
    B = dims.batch
    bn = B * dims.d_state
    quant = quant_mode if scales is not None else "none"
    tail = tail_inputs is not None
    x_pad = jnp.pad(x0.astype(jnp.float32), ((0, dims.rows - B), (0, 0)))

    kernel = functools.partial(
        _decode_kernel, dims=dims, quant=quant, tail=tail
    )
    grid = (L + _HEAD_CHUNKS + (1 if tail else 0),)
    lc = functools.partial(_clamp_layer, L=L)
    hc = lambda i: jnp.clip(i - L, 0, _HEAD_CHUNKS - 1)  # lm chunk index
    in_specs = [
        pl.BlockSpec((dims.rows, dims.d_model), lambda i: (0, 0)),
        pl.BlockSpec((1, dims.d_model, dims.d_in_pad), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, dims.d_inner, dims.d_model), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, 4, dims.conv_dim), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, 1, dims.conv_dim), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, 1, 128), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((dims.nheads, dims.d_inner), lambda i: (0, 0)),
        pl.BlockSpec((1, 1, dims.d_inner), lambda i: (lc(i), 0, 0)),
        pl.BlockSpec((2, dims.d_model), lambda i: (0, 0)),
        pl.BlockSpec((dims.d_model, dims.head_chunk), lambda i: (0, hc(i))),
        pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
        pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
    ]
    operands = [
        x_pad, w_in, w_out, conv_w, conv_b, dt_bias, a_e, d_e, e_mat,
        norm_w, ln, lm_w, conv_state, ssm_state,
    ]
    if quant != "none":
        g_in, g_out, g_lm = (s.shape[-2] for s in scales)
        in_specs += [
            pl.BlockSpec((1, g_in, dims.d_in_pad), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((1, g_out, dims.d_model), lambda i: (lc(i), 0, 0)),
            pl.BlockSpec((g_lm, dims.head_chunk), lambda i: (0, hc(i))),
        ]
        operands += list(scales)
    if tail:
        lm_b, gram, hist_oh = tail_inputs
        in_specs += [
            pl.BlockSpec((1, dims.head_chunk), lambda i: (0, hc(i))),
            pl.BlockSpec((8, dims.padded_vocab), lambda i: (0, 0)),
            pl.BlockSpec(
                (dims.rows, dims.padded_vocab + 128), lambda i: (0, 0)
            ),
        ]
        operands += [lm_b, gram, hist_oh]
    # conv_state/ssm_state are always operands 12/13 (quant/tail extras
    # append after); their output slots shift by 2 in tail mode.
    aliases = {12: 1, 13: 2}
    if tail:
        out_specs = [
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((dims.rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((dims.rows, 128), jnp.int32),
            jax.ShapeDtypeStruct(conv_state.shape, jnp.float32),
            jax.ShapeDtypeStruct(ssm_state.shape, jnp.float32),
        ]
        aliases = {12: 2, 13: 3}
        scratch = [
            pltpu.VMEM((dims.rows, dims.d_model), jnp.float32),
            pltpu.VMEM((dims.rows, dims.padded_vocab), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((dims.rows, dims.head_chunk), lambda i: (0, hc(i))),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((dims.rows, dims.padded_vocab), jnp.float32),
            jax.ShapeDtypeStruct(conv_state.shape, jnp.float32),
            jax.ShapeDtypeStruct(ssm_state.shape, jnp.float32),
        ]
        scratch = [pltpu.VMEM((dims.rows, dims.d_model), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)
    if tail:
        vals, idxs, cs, ss = outs
        return vals[:B], idxs[:B], cs, ss
    logits, cs, ss = outs
    return logits[:B], cs, ss


# ---------------------------------------------------------------------------
# Parameter/state packing
# ---------------------------------------------------------------------------


QUANT_GROUP = 256  # int8 K-group size (rows per scale group)


def _quantize_cols(w: jax.Array, group: int = QUANT_GROUP) -> Tuple[jax.Array, jax.Array]:
    """K-grouped per-output-column symmetric int8.

    Returns (q (K, N) int8, s (G, N) f32) with G = K/group: each scale
    covers a (group x 1) tile. Round 2 used a single scale per column
    (9.6% mean rel logit error, BENCHMARKS.md); row-grouping at 256 adds
    only (G, N) f32 of stream and cuts the error roughly in half because a
    single outlier row no longer dilates the whole column's step size."""
    k = w.shape[0]
    if k % group:
        group = k  # degenerate: one group (tiny matrices)
    g = k // group
    wg = w.reshape(g, group, -1)
    s = jnp.max(jnp.abs(wg), axis=1) / 127.0  # (G, N)
    s = jnp.maximum(s, 1e-20)
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -127.0, 127.0)
    return q.astype(jnp.int8).reshape(w.shape), s.astype(jnp.float32)


def build_decode_params(
    variables: Any, cfg: MambaConfig, batch: int, quant: str = "bf16",
    quantizer: Any = None,
):
    """Stack and pre-process MambaLM flax params for the fused kernel.

    Returns a dict pytree (built once per generation, hoisted out of the
    sampling scan): matmul weights padded to lane multiples, per-head
    vectors pre-broadcast to channels, plus the fp32 embedding and lm_head
    bias used outside the kernel.

    quant='bf16' (default) streams bf16 weights; 'int8' (W8A8) and 'int8w'
    (W8A16, weight-only) store in_proj/out_proj/lm_head int8 with
    (256-row-group x output-column) scales, halving the DMA-bound kernel's
    HBM traffic. The int8 pack is identical for both modes — execution
    differs in-kernel.

    `quantizer` (optional): a `(site_name, w) -> (q, s)` callable replacing
    the RTN `_quantize_cols` pack per matrix — e.g.
    `ops.gptq.make_gptq_quantizer(hessians)` for calibrated GPTQ packs with
    the identical (q, K-group s) layout. Site names: 'layer_{i}/in_proj',
    'layer_{i}/out_proj', 'lm_head'.
    """
    assert quant in ("bf16", "int8", "int8w"), quant
    qfn = quantizer if quantizer is not None else (
        lambda _name, w: _quantize_cols(w)
    )
    quant = "int8" if quant in ("int8", "int8w") else "bf16"
    p = variables["params"]
    dims = DecodeDims.create(cfg, batch)
    L = cfg.n_layers

    w_in, w_out, conv_w, conv_b = [], [], [], []
    dt_bias, a_e, d_e, norm_w = [], [], [], []
    w_in_s, w_out_s = [], []
    for i in range(L):
        lp = p[f"layer_{i}"]
        k_in = lp["in_proj"]["kernel"]  # (d_model, d_in_proj)
        pad = dims.d_in_pad - dims.d_in_proj
        k_in = jnp.pad(k_in, ((0, 0), (0, pad)))
        k_out = lp["out_proj"]["kernel"]
        if quant == "int8":
            q_in, s_in = qfn(f"layer_{i}/in_proj", k_in)
            q_out, s_out = qfn(f"layer_{i}/out_proj", k_out)
            w_in.append(q_in)
            w_out.append(q_out)
            w_in_s.append(s_in)
            w_out_s.append(s_out)
        else:
            w_in.append(k_in.astype(jnp.bfloat16))
            w_out.append(k_out.astype(jnp.bfloat16))
        conv_w.append(lp["conv_w"].astype(jnp.float32))
        conv_b.append(lp["conv_b"].astype(jnp.float32)[None, :])
        dt_bias.append(
            jnp.pad(lp["dt_bias"].astype(jnp.float32), (0, 128 - cfg.nheads))[None, :]
        )
        a_neg = -jnp.exp(lp["A_log"].astype(jnp.float32))  # (H,)
        a_e.append(jnp.repeat(a_neg, cfg.headdim)[None, :])  # (1, d_inner)
        d_e.append(jnp.repeat(lp["D"].astype(jnp.float32), cfg.headdim)[None, :])
        norm_w.append(lp["norm_weight"].astype(jnp.float32)[None, :])

    e_mat = (
        jnp.arange(dims.d_inner)[None, :] // cfg.headdim
        == jnp.arange(cfg.nheads)[:, None]
    ).astype(jnp.float32)

    lm_w = p["lm_head"]["kernel"]  # (d_model, padded_vocab)
    assert lm_w.shape == (dims.d_model, dims.padded_vocab), lm_w.shape

    out = {
        "w_in": jnp.stack(w_in),
        "w_out": jnp.stack(w_out),
        "conv_w": jnp.stack(conv_w),
        "conv_b": jnp.stack(conv_b),
        "dt_bias": jnp.stack(dt_bias),
        "a_e": jnp.stack(a_e),
        "d_e": jnp.stack(d_e),
        "e_mat": e_mat,
        "norm_w": jnp.stack(norm_w),
        "ln": jnp.stack(
            [p["norm"]["scale"].astype(jnp.float32), p["norm"]["bias"].astype(jnp.float32)]
        ),
        "lm_b": p["lm_head"]["bias"].astype(jnp.float32),
        "embed": p["token_embedding"]["embedding"].astype(jnp.float32),
    }
    if quant == "int8":
        q_lm, s_lm = qfn("lm_head", lm_w)
        out["lm_w"] = q_lm
        out["w_in_s"] = jnp.stack(w_in_s)
        out["w_out_s"] = jnp.stack(w_out_s)
        out["lm_s"] = s_lm  # (1, padded_vocab)
    else:
        out["lm_w"] = lm_w.astype(jnp.bfloat16)

    # Grammar weight table for the in-kernel sampler tail (rows 5-7 zero;
    # an (8,8) one-hot matmul selects the prev-field row — see _tail).
    from ..config import VOCAB
    from .grammar import grammar_mask

    g = grammar_mask(VOCAB)  # (5, vocab_size)
    out["gram8"] = (
        jnp.zeros((8, dims.padded_vocab), jnp.float32)
        .at[:5, : VOCAB.vocab_size]
        .set(g.astype(jnp.float32))
    )
    return out


def stack_states(states) -> Tuple[jax.Array, jax.Array]:
    """Per-layer state dicts from MambaLM.prefill -> stacked kernel arrays.

    conv: (L, B, K-1, conv_dim); ssm: (B, H, P, N) -> S[h*P+p, b*N+n]."""
    conv = jnp.stack([s["conv"].astype(jnp.float32) for s in states])

    def to2d(ssm):
        b, h, p_, n = ssm.shape
        return ssm.astype(jnp.float32).transpose(1, 2, 0, 3).reshape(h * p_, b * n)

    ssm = jnp.stack([to2d(s["ssm"]) for s in states])
    return conv, ssm


def unstack_states(conv: jax.Array, ssm: jax.Array, dims: DecodeDims):
    """Inverse of stack_states (for switching back to the XLA step path)."""
    out = []
    for i in range(conv.shape[0]):
        s2 = ssm[i].reshape(dims.nheads, dims.headdim, dims.batch, dims.d_state)
        out.append({"conv": conv[i], "ssm": s2.transpose(2, 0, 1, 3)})
    return tuple(out)


def fused_logits_step(
    dp: dict,
    token: jax.Array,  # (B,) int32
    carry: Tuple[jax.Array, jax.Array],
    cfg: MambaConfig,
    dims: DecodeDims,
    interpret: bool = False,
    quant_mode: str = "w8a8",  # used when dp is an int8 pack
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Full decode step: embed -> fused kernel (mixers + LN + lm_head).

    Semantics match MambaLM.step (bf16 matmul tolerance on logits)."""
    conv_state, ssm_state = carry
    x0 = dp["embed"][token]  # (B, d_model)
    scales = None
    if "w_in_s" in dp:  # int8-quantized pack (build_decode_params quant='int8')
        scales = (dp["w_in_s"], dp["w_out_s"], dp["lm_s"])
    logits, conv_state, ssm_state = fused_decode_step(
        x0,
        dp["w_in"],
        dp["w_out"],
        dp["conv_w"],
        dp["conv_b"],
        dp["dt_bias"],
        dp["a_e"],
        dp["d_e"],
        dp["e_mat"],
        dp["norm_w"],
        dp["ln"],
        dp["lm_w"],
        conv_state,
        ssm_state,
        dims,
        interpret=interpret,
        scales=scales,
        quant_mode=quant_mode,
    )
    logits = logits + dp["lm_b"][None, :]
    return logits[:, : cfg.vocab_size], (conv_state, ssm_state)


def fused_sample_step(
    dp: dict,
    token: jax.Array,  # (B,) int32
    carry: Tuple[jax.Array, jax.Array],
    hist: jax.Array,  # (B, vocab_size) int32 penalty-window counts
    bucket_oh: jax.Array,  # (B, 8) one-hot of the token's field bucket
    cfg: MambaConfig,
    dims: DecodeDims,
    interpret: bool = False,
    quant_mode: str = "w8a8",  # used when dp is an int8 pack
) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, jax.Array]]:
    """Decode step WITH the in-kernel sampler tail: embed -> fused kernel
    (mixers + LN + lm_head + grammar/penalty/top-3). Returns
    (vals (B,3), idxs (B,3), new_carry) — ties -> lowest index, matching
    sample/sampler._iter_top_k. The full-vocab logits never leave VMEM."""
    conv_state, ssm_state = carry
    x0 = dp["embed"][token]
    scales = None
    if "w_in_s" in dp:
        scales = (dp["w_in_s"], dp["w_out_s"], dp["lm_s"])
    vp, v, b = dims.padded_vocab, dims.vocab_size, token.shape[0]
    hist_oh = jnp.zeros((dims.rows, vp + 128), jnp.float32)
    hist_oh = hist_oh.at[:b, :v].set(hist.astype(jnp.float32))
    hist_oh = hist_oh.at[:b, vp : vp + 8].set(bucket_oh.astype(jnp.float32))
    vals, idxs, conv_state, ssm_state = fused_decode_step(
        x0,
        dp["w_in"],
        dp["w_out"],
        dp["conv_w"],
        dp["conv_b"],
        dp["dt_bias"],
        dp["a_e"],
        dp["d_e"],
        dp["e_mat"],
        dp["norm_w"],
        dp["ln"],
        dp["lm_w"],
        conv_state,
        ssm_state,
        dims,
        interpret=interpret,
        scales=scales,
        quant_mode=quant_mode,
        tail_inputs=(dp["lm_b"][None, :], dp["gram8"], hist_oh),
    )
    return vals[:, :3], idxs[:, :3], (conv_state, ssm_state)
