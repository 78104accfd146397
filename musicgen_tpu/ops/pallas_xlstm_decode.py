"""Fused full-model xLSTM decode step — Pallas TPU kernel.

Round 2 left xLSTM sampling on the dispatch-bound XLA step loop
(`XLSTMLM.step`: ~615 us/token at B=2 on the target chip,
experiments/bench_xlstm_step.py) while Mamba got a fused kernel at the HBM
roofline. This kernel closes that gap: ONE `pallas_call` advances the whole
11-block stack (7 mLSTM + 4 sLSTM blocks), the final LayerNorm, the
17,920-lane lm_head and (optionally) the sampler tail by one token, with
every weight streamed HBM->VMEM exactly once and all elementwise work fused
between the matmuls.

Per-token HBM traffic at B=2 (the irreducible cost of exact decode):
  ~131 MB bf16 weights (mixers + lm_head) + ~113 MB f32 mLSTM matrix
  state r/w + ~1 MB small state  ->  ~300 MB  ->  ~366 us at the v5e's
  819 GB/s, vs the XLA step's measured 615 us. quant='w8a16' halves the
  weight stream (int8 K-group weights, bf16 math — ops/pallas_decode._w8dot).
  The matrix state can additionally be STORED bf16 (stack_xlstm_states
  state_dtype=bf16; the kernel reads the storage dtype off the operand and
  computes f32 in-register), halving the other big stream — at int8w+sb16
  the per-token traffic drops to ~66 + ~57 MB. Storage rounding enters the
  S recurrence once per step (S = f*S + i k v^T with f<=1, so errors decay
  rather than accumulate); measured drift is bounded in
  tests/test_pallas_xlstm_decode.py and experiments/int8_quality.py.

Mosaic-layout notes (the compiler rejects lane<->sublane reshapes, so the
whole kernel is rank-2; rank>2 blocks only carry size-1/static-indexed
leading dims):

  * mLSTM matrix memory S (B,H,DK,DV) lives as S2[h*DK+kk, b*DV+vv]
    (2048 x B*512). The per-head rank-1 update k v^T becomes an MXU matmul
    k_h (DK,B) @ v_diag (B,B*DV) with v lane-tiled and masked
    block-diagonal, exactly the batch-contraction trick of
    ops/pallas_decode. k arrives batch-major from the projections; the
    (DK,B) form is one tiny contraction against eye(B).
  * The normalizer n and stabilizer m need NO transposes: n lives
    batch-major as nm[b, h*DK+kk] (lanes match the q/k layout), so
    n_new = f*n + i*k is elementwise and the denominator q.n is an
    elementwise product reduced per 512-lane head block by a constant
    one-hot matmul. m sits in nm's trailing pad lanes [2048, 2048+H).
  * The qkv_proj_blocksize=4 block-diagonal projections (NX-AI
    LinearHeadwiseExpand) are BANDED with bandwidth 4: q[c] = sum_d
    x[c-d] * w_d[c] for d in (-3..3), where w_d packs the in-band block
    weights per output lane (built once in build_xlstm_decode_params).
    Seven lane-shifted multiply-adds replace a 2048x2048 matrix stream.
  * The sLSTM block-diagonal recurrence R (4 gates, H, DH, DH) runs as H
    per-head matmuls h_h (B,DH) @ R_h (DH, 4*DH) -> gate preactivations,
    all four gates of a head in one MXU pass (round-2 batched-sLSTM trick).

Grid = (11 layer steps + 5 lm_head N-chunks + optional tail,). Layer steps
double-buffer that layer's weights against the previous layer's compute;
mLSTM and sLSTM weight stacks are separate operands whose index maps
advance only on their own layer type (unchanged indices -> no re-fetch
while the other type runs). The (rows, d_model) activation block persists
in VMEM scratch; recurrent states are kernel inputs aliased to outputs.

Replaces: the no-cache loop at reference scripts/generate.py:26-29 applied
to models/xlstm/xlstm_model.py:44-57 (NX-AI CUDA sLSTM + Triton mLSTM
kernels, SURVEY.md §2.3), at weight-stream speed.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import XLSTMConfig
from .pallas_decode import _HEAD_CHUNKS, _dot, _head_math, _tail_math, _w8dot
from .pallas_decode import _quantize_cols

_ROWS = 8


@dataclasses.dataclass(frozen=True)
class XDims:
    n_blocks: int  # 11
    slstm_at: Tuple[int, ...]  # (1, 4, 7, 10)
    batch: int
    d_model: int  # 1024
    heads: int  # 4
    m_inner: int  # 2 * d_model = 2048
    m_dh: int  # m_inner / heads = 512
    s_dh: int  # d_model / heads = 256
    ffn_inner: int  # int(1.3 * d_model) = 1331
    ffn_pad: int  # lane-padded = 1408
    padded_vocab: int
    head_chunk: int
    vocab_size: int
    dyn_start: int
    length_start: int
    rows: int

    @classmethod
    def create(cls, cfg: XLSTMConfig, batch: int) -> "XDims":
        from ..config import VOCAB

        d = cfg.embedding_dim
        m_inner = int(cfg.mlstm_proj_factor * d)
        ffn_inner = int(cfg.slstm_ff_proj_factor * d)
        pv = cfg.padded_vocab
        assert pv % (_HEAD_CHUNKS * 128) == 0, pv
        assert cfg.qkv_proj_blocksize == 4, "banded qkv packing assumes blocksize 4"
        assert cfg.conv1d_kernel_size == 4, "conv step unrolled for k=4"
        return cls(
            n_blocks=cfg.num_blocks,
            slstm_at=tuple(cfg.slstm_at),
            batch=batch,
            d_model=d,
            heads=cfg.num_heads,
            m_inner=m_inner,
            m_dh=m_inner // cfg.num_heads,
            s_dh=d // cfg.num_heads,
            ffn_inner=ffn_inner,
            ffn_pad=-(-ffn_inner // 128) * 128,
            padded_vocab=pv,
            head_chunk=pv // _HEAD_CHUNKS,
            vocab_size=cfg.vocab_size,
            dyn_start=VOCAB.dyn_start,
            length_start=VOCAB.length_start,
            rows=max(_ROWS, -(-batch // 8) * 8),
        )

    @property
    def n_mlstm(self) -> int:
        return self.n_blocks - len(self.slstm_at)

    @property
    def n_slstm(self) -> int:
        return len(self.slstm_at)


def _mm(x, w, s, quant):
    """Big-matrix matmul in the kernel's selected precision."""
    if quant == "w8a16":
        return _w8dot(x, w, s)
    return _dot(x.astype(jnp.bfloat16), w)


def _layernorm(x, g, b, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def _pad_rows(x, rows):
    """Zero-pad (b, d) -> (rows, d). Mosaic rejects zero-sized vector
    types, so when b == rows (e.g. a full 8-slot serving batch) the
    (0, d) pad operand must never be built."""
    b = x.shape[0]
    if rows == b:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((rows - b, x.shape[1]), x.dtype)], axis=0
    )


def _shift_lanes(x, d):
    """roll(x, d, axis=1): out[:, c] = x[:, c - d] (wraparound lanes are
    always masked by zero band weights). Python negative indexing makes one
    expression correct for both signs."""
    if d == 0:
        return x
    return jnp.concatenate([x[:, -d:], x[:, :-d]], axis=1)


def _banded_proj(x, w7):
    """Blocksize-4 block-diagonal projection as 7 banded multiply-adds.

    x (B, D); w7 (7, D) with w7[d+3, c] = W[c//4, c%4 - d, c%4] (zero when
    out of band). Matches models/xlstm.BlockwiseDense."""
    acc = x * w7[3:4, :]
    for d in (-3, -2, -1, 1, 2, 3):
        acc = acc + _shift_lanes(x, d) * w7[d + 3 : d + 4, :]
    return acc


def _headblock_norm(x, dh, eps=1e-5):
    """Per-head (dh-lane-block) layernorm without scale (models/xlstm
    _headnorm/_groupnorm core)."""
    parts = []
    n = x.shape[1] // dh
    for h in range(n):
        xh = x[:, h * dh : (h + 1) * dh]
        mean = jnp.mean(xh, axis=-1, keepdims=True)
        var = jnp.mean(xh * xh, axis=-1, keepdims=True) - mean * mean
        parts.append((xh - mean) * jax.lax.rsqrt(var + eps))
    return jnp.concatenate(parts, axis=1)


def _conv_step(cs, x_new, conv_w, conv_b):
    """4-tap depthwise causal conv step (ops/ssm.causal_conv1d_step
    semantics: cs rows oldest->newest). Returns (y, cs_new)."""
    y = (
        cs[:, 0, :] * conv_w[0][None, :]
        + cs[:, 1, :] * conv_w[1][None, :]
        + cs[:, 2, :] * conv_w[2][None, :]
        + x_new * conv_w[3][None, :]
        + conv_b
    )
    cs_new = jnp.stack([cs[:, 1, :], cs[:, 2, :], x_new], axis=1)
    return y, cs_new


def _mlstm_block_math(x, r, st, dims: XDims, quant: str):
    """One mLSTM block (pre-LN residual) on one token.

    x (rows, d_model) f32; r: dict of this layer's weight refs (read);
    st: (conv (B,3,m_inner), S (H*DK, B*DV), nm (8, H*DK + 128)).
    Returns (x_new, conv_new, s_new, nm_new). Matches
    models/xlstm.MLSTMLayer.step + XLSTMBlock.step."""
    B, H, DK = dims.batch, dims.heads, dims.m_dh
    DV = DK
    di = dims.m_inner
    f32 = jnp.float32
    conv_st, s_st, nm_st = st

    xn = _layernorm(x[:B], r["ln"][0:1, :], r["ln"][1:2, :])
    up = _mm(
        _pad_rows(xn, dims.rows),
        r["w_up"],
        r.get("w_up_s"),
        quant,
    )  # (rows, 2*di)
    x_m = up[:B, :di]
    z = up[:B, di : 2 * di]

    y_conv, conv_new = _conv_step(conv_st, x_m, r["conv_w"], r["conv_b"])
    x_c = y_conv * jax.nn.sigmoid(y_conv)  # silu

    q = _banded_proj(x_c, r["qkv_w"][0])
    k = _banded_proj(x_c, r["qkv_w"][1])
    v = _banded_proj(x_m, r["qkv_w"][2])

    # i/f gate Dense(H) in fp32 (exp-gate sensitive): w_gate (2H, 3*di)
    # row-major (rows 0..H-1 igate, H..2H-1 fgate); one feature-contraction
    # lands gates batch-major directly — no transposes.
    gate_in = jnp.concatenate([q, k, v], axis=1)  # (B, 3*di)
    gates = _dot(gate_in, r["w_gate"], contract=((1,), (1,)))  # (B, 2H)
    gates = gates + r["gate_b"][:, : 2 * H]
    i_pre = gates[:, :H]
    f_pre = gates[:, H : 2 * H]

    m_prev = nm_st[:B, di : di + H]
    n_prev = nm_st[:B, :di]
    log_f = jax.nn.log_sigmoid(f_pre)
    m_new = jnp.maximum(log_f + m_prev, i_pre)  # (B, H)
    f_act = jnp.exp(log_f + m_prev - m_new)
    i_act = jnp.exp(i_pre - m_new)

    # Expand per-head gate activations to per-channel lanes (h*DK+kk).
    e_h = (
        jax.lax.broadcasted_iota(jnp.int32, (H, di), 1) // DK
        == jax.lax.broadcasted_iota(jnp.int32, (H, di), 0)
    ).astype(f32)  # (H, di)
    f_lane = _dot(f_act, e_h)  # (B, di)
    i_lane = _dot(i_act, e_h)

    k_scaled = k * (1.0 / (DK**0.5))
    n_new = f_lane * n_prev + i_lane * k_scaled  # (B, di)

    # Matrix memory per head: S2[h*DK+kk, b*DV+vv].
    eye_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    ).astype(f32)
    ik = i_lane * k_scaled  # fold i into k: upd = (i k) v^T
    ik2 = _dot(ik, eye_b, contract=((0,), (0,)))  # (di, B) rows h*DK+kk
    eb = (
        jax.lax.broadcasted_iota(jnp.int32, (B, B * DV), 1) // DV
        == jax.lax.broadcasted_iota(jnp.int32, (B, B * DV), 0)
    ).astype(f32)  # (B, B*DV) block mask
    sum_mat = (
        jax.lax.broadcasted_iota(jnp.int32, (B * DV, DV), 0) % DV
        == jax.lax.broadcasted_iota(jnp.int32, (B * DV, DV), 1)
    ).astype(f32)  # (B*DV, DV): fold diag blocks back to (B, DV)

    h_parts = []
    s_new_parts = []
    for h in range(H):
        s_h = s_st[h * DK : (h + 1) * DK, :]  # (DK, B*DV)
        ik_h = ik2[h * DK : (h + 1) * DK, :]  # (DK, B)
        v_h = v[:, h * DV : (h + 1) * DV]  # (B, DV)
        f_h = f_act[:, h : h + 1]  # (B, 1)
        v_diag = jnp.concatenate([v_h] * B, axis=1) * eb  # (B, B*DV)
        f_cols = _dot(f_h, eb, contract=((0,), (0,)))  # (1, B*DV)
        upd = _dot(ik_h, v_diag, contract=((1,), (0,)))  # (DK, B*DV)
        s_h_new = s_h * f_cols + upd
        s_new_parts.append(s_h_new)
        q_h = q[:, h * DK : (h + 1) * DK]  # (B, DK)
        qs = _dot(q_h, s_h_new) * eb  # (B, B*DV), off-blocks zeroed
        h_parts.append(_dot(qs, sum_mat))  # (B, DV)
    num = jnp.concatenate(h_parts, axis=1)  # (B, di) lanes h*DV+vv

    # Denominator: q.n per head (elementwise + per-head-block reduce).
    qn = _dot(q * n_new, e_h, contract=((1,), (1,)))  # (B, H)
    denom = jnp.maximum(jnp.abs(qn), jnp.exp(-m_new))  # (B, H)
    denom_lane = _dot(denom, e_h)  # (B, di)
    h_att = num / denom_lane

    h_att = _headblock_norm(h_att, DK) * r["outnorm"][0][None, :]
    h_att = h_att + r["skip"][0][None, :] * x_c
    y = h_att * (z * jax.nn.sigmoid(z))
    y_rows = _pad_rows(y, dims.rows)
    down = _mm(y_rows, r["w_down"], r.get("w_down_s"), quant)
    x_new = x + down  # pre-LN residual (XLSTMBlock.step)

    s_new = jnp.concatenate(s_new_parts, axis=0)  # (di, B*DV)
    # Rebuild nm by concatenation (in-kernel .at[].set lowers to scatter,
    # which Mosaic does not implement).
    nm_row = jnp.concatenate(
        [n_new, m_new, jnp.zeros((B, nm_st.shape[1] - di - H), f32)], axis=1
    )
    nm_new = _pad_rows(nm_row, nm_st.shape[0])
    return x_new, conv_new, s_new, nm_new


def _slstm_block_math(x, r, st, dims: XDims, quant: str):
    """One sLSTM block (pre-LN residual + post-FFN) on one token.

    st: (conv (B,3,d), hcnm (4, 8, d)). Matches models/xlstm
    SLSTMLayer.step + XLSTMBlock.step (incl. the FFN sub-block)."""
    B, H, DH = dims.batch, dims.heads, dims.s_dh
    d = dims.d_model
    f32 = jnp.float32
    conv_st, hcnm_st = st

    xn = _layernorm(x[:B], r["ln"][0:1, :], r["ln"][1:2, :])
    y_conv, conv_new = _conv_step(conv_st, xn, r["conv_w"], r["conv_b"])
    x_c = y_conv * jax.nn.sigmoid(y_conv)

    wx_if = _mm(
        _pad_rows(x_c, dims.rows), r["w_if"], r.get("w_if_s"), quant
    )[:B]  # (B, 2d): lanes [i | f]
    wx_zo = _mm(
        _pad_rows(xn, dims.rows), r["w_zo"], r.get("w_zo_s"), quant
    )[:B]  # (B, 2d): lanes [z | o]

    h_prev = hcnm_st[0, :B, :]  # (B, d) lanes h*DH+e
    c_prev = hcnm_st[1, :B, :]
    n_prev = hcnm_st[2, :B, :]
    m_prev = hcnm_st[3, :B, :]

    # Block-diagonal recurrence: per head, (B, DH) @ (DH, 4*DH) -> all four
    # gates' recurrent preactivations for that head. Gather per-gate segments
    # and concatenate (in-kernel .at[].set lowers to unsupported scatter).
    rec_segs: list[list] = [[] for _ in range(4)]
    for h in range(H):
        h_h = h_prev[:, h * DH : (h + 1) * DH].astype(jnp.bfloat16)
        rec_h = _dot(h_h, r["r_w"][h])  # (B, 4*DH) lanes g*DH+e
        for g in range(4):
            rec_segs[g].append(rec_h[:, g * DH : (g + 1) * DH])
    rec_parts = [jnp.concatenate(segs, axis=1) for segs in rec_segs]

    i_pre = wx_if[:, :d] + rec_parts[0] + r["bias"][0:1, :]
    f_pre = wx_if[:, d:] + rec_parts[1] + r["bias"][1:2, :]
    z_pre = wx_zo[:, :d] + rec_parts[2] + r["bias"][2:3, :]
    o_pre = wx_zo[:, d:] + rec_parts[3] + r["bias"][3:4, :]

    m_new = jnp.maximum(f_pre + m_prev, i_pre)
    i_act = jnp.exp(i_pre - m_new)
    f_act = jnp.exp(f_pre + m_prev - m_new)
    c_new = f_act * c_prev + i_act * jnp.tanh(z_pre)
    n_new = f_act * n_prev + i_act
    h_new = jax.nn.sigmoid(o_pre) * c_new / n_new

    h_gn = _headblock_norm(h_new, DH) * r["gn_scale"][0][None, :]
    x1 = x[:B] + h_gn  # residual 1

    # FFN sub-block: x = x + ffn(ln_ffn(x)).
    fn = _layernorm(x1, r["ln_ffn"][0:1, :], r["ln_ffn"][1:2, :])
    fn_rows = _pad_rows(fn, dims.rows)
    up = _mm(fn_rows, r["ffn_up"], r.get("ffn_up_s"), quant)
    up = up + r["ffn_up_b"][0][None, :]
    # Zero the pad lanes (bias may be nonzero there only if packing forgot;
    # build_xlstm_decode_params zero-pads, but gelu(0)=0 keeps them inert).
    up = jax.nn.gelu(up, approximate=True)
    down = _mm(up, r["ffn_down"], r.get("ffn_down_s"), quant)
    down = down[:B] + r["ffn_down_b"][0][None, :]
    x2 = x1 + down

    x_new = _pad_rows(x2, dims.rows)
    hcnm_new = jnp.stack(
        [
            _pad_rows(h_new, _ROWS),
            _pad_rows(c_new, _ROWS),
            _pad_rows(n_new, _ROWS),
            _pad_rows(m_new, _ROWS),
        ],
        axis=0,
    )
    return x_new, conv_new, hcnm_new


_M_WEIGHTS = (
    "ln", "w_up", "conv_w", "conv_b", "qkv_w", "w_gate", "gate_b",
    "outnorm", "skip", "w_down",
)
_S_WEIGHTS = (
    "ln", "conv_w", "conv_b", "w_if", "w_zo", "r_w", "bias", "gn_scale",
    "ln_ffn", "ffn_up", "ffn_up_b", "ffn_down", "ffn_down_b",
)
_M_QUANT = ("w_up", "w_down")
_S_QUANT = ("w_if", "w_zo", "ffn_up", "ffn_down")


def _xlstm_kernel(*refs, dims: XDims, quant: str, tail: bool, names):
    r = dict(zip(names, refs))
    i = pl.program_id(0)
    L = dims.n_blocks
    B = dims.batch

    @pl.when(i == 0)
    def _():
        r["x_scr"][:, :] = r["x_in"][:, :]

    is_sl = jnp.zeros((), jnp.bool_)
    for j in dims.slstm_at:
        is_sl = jnp.logical_or(is_sl, i == j)

    @pl.when(jnp.logical_and(i < L, jnp.logical_not(is_sl)))
    def _mlstm():
        mr = {k: r[f"m_{k}"][0] for k in _M_WEIGHTS}
        if quant == "w8a16":
            for k in _M_QUANT:
                mr[f"{k}_s"] = r[f"m_{k}_s"][0]
        x_new, conv_new, s_new, nm_new = _mlstm_block_math(
            r["x_scr"][:, :],
            mr,
            # The matrix state's STORAGE dtype may be bf16; math is f32.
            (r["conv_m"][0], r["s_m"][0].astype(jnp.float32), r["nm_m"][0]),
            dims,
            quant,
        )
        r["x_scr"][:, :] = x_new
        r["conv_m_out"][0] = conv_new
        r["s_m_out"][0] = s_new.astype(r["s_m_out"].dtype)
        r["nm_m_out"][0] = nm_new

    @pl.when(is_sl)
    def _slstm():
        sr = {k: r[f"s_{k}"][0] for k in _S_WEIGHTS}
        if quant == "w8a16":
            for k in _S_QUANT:
                sr[f"{k}_s"] = r[f"s_{k}_s"][0]
        x_new, conv_new, hcnm_new = _slstm_block_math(
            r["x_scr"][:, :],
            sr,
            (r["conv_s"][0], r["hcnm_s"][0]),
            dims,
            quant,
        )
        r["x_scr"][:, :] = x_new
        r["conv_s_out"][0] = conv_new
        r["hcnm_s_out"][0] = hcnm_new

    n_head_end = L + _HEAD_CHUNKS

    @pl.when(jnp.logical_and(i >= L, i < n_head_end))
    def _head():
        chunk_logits = _head_math(
            r["x_scr"][:, :],
            r["ln_f"][:, :],
            r["lm_w"][:, :],
            r["lm_s"][:, :] if quant == "w8a16" else None,
            "w8a16" if quant == "w8a16" else "none",
        )
        if tail:
            chunk_logits = chunk_logits + r["lm_b"][:, :]
            c0 = (i - L) * dims.head_chunk
            r["logit_scr"][:, pl.ds(c0, dims.head_chunk)] = chunk_logits
        else:
            r["logits"][:, :] = chunk_logits

    if tail:

        @pl.when(i == n_head_end)
        def _tail():
            vp = dims.padded_vocab
            out_vals, out_idx = _tail_math(
                r["logit_scr"][:, :],
                r["gram"][:, :],
                r["hist"][:, :vp],
                r["hist"][:, vp : vp + 8],
                dims,
            )
            r["vals"][:, :] = out_vals
            r["idx"][:, :] = out_idx


@functools.partial(
    jax.jit, static_argnames=("dims", "interpret", "quant", "tail")
)
def _fused_xlstm_call(
    x0,  # (B, d_model) f32 embedded token
    wp: dict,  # weight pack (build_xlstm_decode_params, minus embed/lm_b)
    conv_m, s_m, nm_m, conv_s, hcnm_s,  # states
    tail_ops: Tuple[jax.Array, ...] | None,
    dims: XDims,
    interpret: bool = False,
    quant: str = "none",
    tail: bool = False,
):
    L = dims.n_blocks
    B = dims.batch
    f32 = jnp.float32

    def s_before(i):
        n = 0
        for j in dims.slstm_at:
            n = n + jnp.where(i > j, 1, 0)
        return n

    def m_idx(i):
        return jnp.clip(i - s_before(i), 0, dims.n_mlstm - 1)

    def s_idx(i):
        return jnp.clip(s_before(i), 0, dims.n_slstm - 1)

    hc = lambda i: jnp.clip(i - L, 0, _HEAD_CHUNKS - 1)

    x_pad = jnp.pad(x0.astype(f32), ((0, dims.rows - B), (0, 0)))

    names = ["x_in"]
    operands = [x_pad]
    in_specs = [pl.BlockSpec((dims.rows, dims.d_model), lambda i: (0, 0))]

    def add(name, arr, idx_map):
        names.append(name)
        operands.append(arr)
        in_specs.append(
            pl.BlockSpec((1,) + arr.shape[1:], idx_map)
        )

    # Per-layer-type weight stacks.
    for k in _M_WEIGHTS:
        arr = wp[f"m_{k}"]
        nd = arr.ndim - 1
        add(f"m_{k}", arr, lambda i, nd=nd: (m_idx(i),) + (0,) * nd)
    for k in _S_WEIGHTS:
        arr = wp[f"s_{k}"]
        nd = arr.ndim - 1
        add(f"s_{k}", arr, lambda i, nd=nd: (s_idx(i),) + (0,) * nd)

    # Shared head weights.
    names.append("ln_f")
    operands.append(wp["ln_f"])
    in_specs.append(pl.BlockSpec(wp["ln_f"].shape, lambda i: (0, 0)))
    names.append("lm_w")
    operands.append(wp["lm_w"])
    in_specs.append(
        pl.BlockSpec((dims.d_model, dims.head_chunk), lambda i: (0, hc(i)))
    )

    # States (aliased to outputs).
    state_arrs = {
        "conv_m": (conv_m, lambda i, nd=3: (m_idx(i),) + (0,) * nd),
        "s_m": (s_m, lambda i, nd=2: (m_idx(i),) + (0,) * nd),
        "nm_m": (nm_m, lambda i, nd=2: (m_idx(i),) + (0,) * nd),
        "conv_s": (conv_s, lambda i, nd=3: (s_idx(i),) + (0,) * nd),
        "hcnm_s": (hcnm_s, lambda i, nd=3: (s_idx(i),) + (0,) * nd),
    }
    alias_in = {}
    for name, (arr, imap) in state_arrs.items():
        alias_in[name] = len(operands)
        add(name, arr, imap)

    if quant == "w8a16":
        for k in _M_QUANT:
            arr = wp[f"m_{k}_s"]
            nd = arr.ndim - 1
            add(f"m_{k}_s", arr, lambda i, nd=nd: (m_idx(i),) + (0,) * nd)
        for k in _S_QUANT:
            arr = wp[f"s_{k}_s"]
            nd = arr.ndim - 1
            add(f"s_{k}_s", arr, lambda i, nd=nd: (s_idx(i),) + (0,) * nd)
        names.append("lm_s")
        operands.append(wp["lm_s"])
        in_specs.append(
            pl.BlockSpec(
                (wp["lm_s"].shape[0], dims.head_chunk), lambda i: (0, hc(i))
            )
        )

    if tail:
        lm_b, gram, hist_oh = tail_ops
        names.append("lm_b")
        operands.append(lm_b)
        in_specs.append(pl.BlockSpec((1, dims.head_chunk), lambda i: (0, hc(i))))
        names.append("gram")
        operands.append(gram)
        in_specs.append(pl.BlockSpec((8, dims.padded_vocab), lambda i: (0, 0)))
        names.append("hist")
        operands.append(hist_oh)
        in_specs.append(
            pl.BlockSpec((dims.rows, dims.padded_vocab + 128), lambda i: (0, 0))
        )

    # Outputs: result first, then state write-backs (aliased).
    out_names, out_specs, out_shape = [], [], []
    if tail:
        out_names += ["vals", "idx"]
        out_specs += [
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((dims.rows, 128), f32),
            jax.ShapeDtypeStruct((dims.rows, 128), jnp.int32),
        ]
    else:
        out_names.append("logits")
        out_specs.append(
            pl.BlockSpec((dims.rows, dims.head_chunk), lambda i: (0, hc(i)))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((dims.rows, dims.padded_vocab), f32)
        )
    aliases = {}
    for name, (arr, imap) in state_arrs.items():
        aliases[alias_in[name]] = len(out_names)
        out_names.append(f"{name}_out")
        out_specs.append(pl.BlockSpec((1,) + arr.shape[1:], imap))
        # Aliased write-back keeps the state's storage dtype (s_m may be
        # stored bf16 to halve its HBM stream; everything else is f32).
        out_shape.append(jax.ShapeDtypeStruct(arr.shape, arr.dtype))

    scratch = [pltpu.VMEM((dims.rows, dims.d_model), f32)]
    scratch_names = ["x_scr"]
    if tail:
        scratch.append(pltpu.VMEM((dims.rows, dims.padded_vocab), f32))
        scratch_names.append("logit_scr")

    kernel = functools.partial(
        _xlstm_kernel,
        dims=dims,
        quant=quant,
        tail=tail,
        names=tuple(names + out_names + scratch_names),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(L + _HEAD_CHUNKS + (1 if tail else 0),),
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
    return dict(zip(out_names, outs))


# ---------------------------------------------------------------------------
# Parameter/state packing
# ---------------------------------------------------------------------------


def _band_pack(w: jax.Array, d_out: int) -> jax.Array:
    """BlockwiseDense kernel (nb, 4, 4) -> banded (7, d_out) lane weights:
    out[d+3, c] = w[c//4, c%4 - d, c%4] (zero out of band).

    Index maps are static numpy; the gather is jnp so this traces under jit
    (build_xlstm_decode_params runs inside the jitted generate runner)."""
    import numpy as np

    dlt, c = np.meshgrid(np.arange(-3, 4), np.arange(d_out), indexing="ij")
    n, j = c // 4, c % 4
    i = j - dlt
    valid = (i >= 0) & (i < 4)
    gathered = w.astype(jnp.float32)[n, np.where(valid, i, 0), j]
    return jnp.where(jnp.asarray(valid), gathered, 0.0)


def build_xlstm_decode_params(
    variables: Any, cfg: XLSTMConfig, batch: int, quant: str = "bf16",
    quantizer: Any = None,
) -> dict:
    """Stack and pre-process XLSTMLM flax params for the fused kernel.

    quant='bf16' streams bf16 weights; 'int8w' stores the six big matmul
    weight classes (mLSTM up/down, sLSTM if/zo, FFN up/down) plus lm_head
    as K-grouped int8 (W8A16 in-kernel, ops/pallas_decode._w8dot).

    `quantizer` (optional): `(site_name, w) -> (q, s)` replacing the RTN
    pack per matrix — e.g. `ops.gptq.make_gptq_quantizer(hessians)` with
    hessians collected at XLSTM_CALIB_SITES. Site names are flax paths
    ('stack/block_3/mlstm/up_proj', 'lm_head', ...); concatenated packs
    (sLSTM w_i|w_f, w_z|w_o) are keyed by their first member — both halves
    share the same input, hence the same Hessian."""
    assert quant in ("bf16", "int8w"), quant
    p = variables["params"]
    dims = XDims.create(cfg, batch)
    H, d = dims.heads, dims.d_model
    di = dims.m_inner
    int8 = quant == "int8w"
    qfn = quantizer if quantizer is not None else (
        lambda _name, w: _quantize_cols(w)
    )

    def big(w, name=""):
        if int8:
            return qfn(name, w)
        return w.astype(jnp.bfloat16), None

    m: dict = {k: [] for k in _M_WEIGHTS}
    ms: dict = {k: [] for k in _M_QUANT}
    s: dict = {k: [] for k in _S_WEIGHTS}
    ss: dict = {k: [] for k in _S_QUANT}
    stack_p = p["stack"]
    for b_i in range(cfg.num_blocks):
        bp = stack_p[f"block_{b_i}"]
        if b_i in cfg.slstm_at:
            lp = bp["slstm"]
            s["ln"].append(_ln2(bp["ln"], d))
            s["conv_w"].append(lp["conv_w"].astype(jnp.float32))
            s["conv_b"].append(lp["conv_b"].astype(jnp.float32)[None, :])
            w_if = jnp.concatenate(
                [lp["w_i"]["kernel"], lp["w_f"]["kernel"]], axis=1
            )
            w_zo = jnp.concatenate(
                [lp["w_z"]["kernel"], lp["w_o"]["kernel"]], axis=1
            )
            q_if, s_if = big(w_if, f"stack/block_{b_i}/slstm/w_i")
            q_zo, s_zo = big(w_zo, f"stack/block_{b_i}/slstm/w_z")
            s["w_if"].append(q_if)
            s["w_zo"].append(q_zo)
            if int8:
                ss["w_if"].append(s_if)
                ss["w_zo"].append(s_zo)
            # r_kernel (4, H, DH, DH) -> per-head (DH, 4*DH), bf16.
            rk = lp["r_kernel"].astype(jnp.float32)
            r_h = jnp.stack(
                [
                    jnp.concatenate([rk[g, h] for g in range(4)], axis=1)
                    for h in range(H)
                ]
            )  # (H, DH, 4*DH)
            s["r_w"].append(r_h.astype(jnp.bfloat16))
            s["bias"].append(
                lp["bias"].astype(jnp.float32).reshape(4, H * dims.s_dh)
            )
            s["gn_scale"].append(lp["gn_scale"].astype(jnp.float32)[None, :])
            s["ln_ffn"].append(_ln2(bp["ln_ffn"], d))
            fu = jnp.pad(
                bp["ffn"]["up"]["kernel"],
                ((0, 0), (0, dims.ffn_pad - dims.ffn_inner)),
            )
            fub = jnp.pad(
                bp["ffn"]["up"]["bias"], (0, dims.ffn_pad - dims.ffn_inner)
            )
            fd = jnp.pad(
                bp["ffn"]["down"]["kernel"],
                ((0, dims.ffn_pad - dims.ffn_inner), (0, 0)),
            )
            q_fu, s_fu = big(fu, f"stack/block_{b_i}/ffn/up")
            q_fd, s_fd = big(fd, f"stack/block_{b_i}/ffn/down")
            s["ffn_up"].append(q_fu)
            s["ffn_down"].append(q_fd)
            if int8:
                ss["ffn_up"].append(s_fu)
                ss["ffn_down"].append(s_fd)
            s["ffn_up_b"].append(fub.astype(jnp.float32)[None, :])
            s["ffn_down_b"].append(
                bp["ffn"]["down"]["bias"].astype(jnp.float32)[None, :]
            )
        else:
            lp = bp["mlstm"]
            m["ln"].append(_ln2(bp["ln"], d))
            q_up, s_up = big(lp["up_proj"]["kernel"], f"stack/block_{b_i}/mlstm/up_proj")
            m["w_up"].append(q_up)
            if int8:
                ms["w_up"].append(s_up)
            m["conv_w"].append(lp["conv_w"].astype(jnp.float32))
            m["conv_b"].append(lp["conv_b"].astype(jnp.float32)[None, :])
            m["qkv_w"].append(
                jnp.stack(
                    [
                        _band_pack(lp["q"]["kernel"], di),
                        _band_pack(lp["k"]["kernel"], di),
                        _band_pack(lp["v"]["kernel"], di),
                    ]
                )
            )
            wg = jnp.concatenate(
                [lp["igate"]["kernel"], lp["fgate"]["kernel"]], axis=1
            )  # (3*di, 2H)
            m["w_gate"].append(wg.T.astype(jnp.float32))  # (2H, 3*di)
            gb = jnp.concatenate(
                [lp["igate"]["bias"], lp["fgate"]["bias"]]
            )  # (2H,)
            m["gate_b"].append(
                jnp.pad(gb.astype(jnp.float32), (0, 128 - 2 * H))[None, :]
            )
            m["outnorm"].append(
                lp["outnorm_scale"].astype(jnp.float32)[None, :]
            )
            m["skip"].append(
                lp["learnable_skip"].astype(jnp.float32)[None, :]
            )
            q_dn, s_dn = big(lp["down_proj"]["kernel"], f"stack/block_{b_i}/mlstm/down_proj")
            m["w_down"].append(q_dn)
            if int8:
                ms["w_down"].append(s_dn)

    out = {}
    for k, v in m.items():
        out[f"m_{k}"] = jnp.stack(v)
    for k, v in s.items():
        out[f"s_{k}"] = jnp.stack(v)
    if int8:
        for k, v in ms.items():
            out[f"m_{k}_s"] = jnp.stack(v)
        for k, v in ss.items():
            out[f"s_{k}_s"] = jnp.stack(v)

    out["ln_f"] = _ln2(stack_p["post_norm"], d)
    lm_w = p["lm_head"]["kernel"]
    if int8:
        q_lm, s_lm = qfn("lm_head", lm_w)
        out["lm_w"] = q_lm
        out["lm_s"] = s_lm
    else:
        out["lm_w"] = lm_w.astype(jnp.bfloat16)
    out["lm_b"] = p["lm_head"]["bias"].astype(jnp.float32)
    out["embed"] = p["token_embedding"]["embedding"].astype(jnp.float32)

    from ..config import VOCAB
    from .grammar import grammar_mask

    g = grammar_mask(VOCAB)
    out["gram8"] = (
        jnp.zeros((8, dims.padded_vocab), jnp.float32)
        .at[:5, : VOCAB.vocab_size]
        .set(g.astype(jnp.float32))
    )
    return out


def _ln2(lnp, d):
    return jnp.stack(
        [lnp["scale"].astype(jnp.float32), lnp["bias"].astype(jnp.float32)]
    )


def fused_vmem_bytes(
    variables: Any,
    cfg: XLSTMConfig,
    batch: int,
    quant: str = "bf16",
    state_dtype=jnp.float32,
    tail: bool = False,
) -> int:
    """Estimate the fused kernel's scoped-VMEM requirement at this batch.

    Mosaic allocates one persistent window per operand for the whole
    kernel, double-buffered (2 buffering levels in the compiler's memory
    dump), so the requirement is the SUM over all operands of
    2 x window_bytes — not the per-grid-step maximum. The dominant
    B-scaling term is the mLSTM matrix memory s_m, whose (H*DK, B*DV)
    window appears both as input and as aliased output: 4 x 2048 x B*512
    x itemsize. At B=8 f32 that is 128 MiB by itself, which is how the
    round-4 serving campaign OOM'd the 128 MiB VMEM ceiling at slots=8
    (experiments/r4/serve_xlstm_int8w.log: 166.71M used; this estimator
    reproduces that dump to within the spill slack).

    Shapes come from jax.eval_shape over the real pack builder (zero
    FLOPs/bytes) plus the documented state-stack shapes, so the estimate
    tracks the kernel's operand list by construction.
    """
    dims = XDims.create(cfg, batch)
    qmode = "int8w" if quant in ("int8", "int8w") else "bf16"
    pack = jax.eval_shape(
        lambda v: build_xlstm_decode_params(v, cfg, batch, quant=qmode),
        variables,
    )
    f32, sdt = jnp.float32, jnp.dtype(state_dtype)

    def win(shape, dtype, bufs=2):
        n = 1
        for s in shape:
            n *= s
        return bufs * n * jnp.dtype(dtype).itemsize

    total = win((dims.rows, dims.d_model), f32)  # x_in
    keys = [f"m_{k}" for k in _M_WEIGHTS] + [f"s_{k}" for k in _S_WEIGHTS]
    if qmode == "int8w":
        keys += [f"m_{k}_s" for k in _M_QUANT]
        keys += [f"s_{k}_s" for k in _S_QUANT]
    for k in keys:  # per-layer stacks: window = one layer's slice
        a = pack[k]
        total += win(a.shape[1:], a.dtype)
    total += win(pack["ln_f"].shape, f32)
    total += win((dims.d_model, dims.head_chunk), pack["lm_w"].dtype)
    if qmode == "int8w":
        total += win((pack["lm_s"].shape[0], dims.head_chunk), f32)
    # States: input window + aliased output window, each double-buffered.
    di, d, H = dims.m_inner, dims.d_model, dims.heads
    M, S, B = dims.n_mlstm, dims.n_slstm, dims.batch
    states = [
        ((B, 3, di), f32),  # conv_m
        ((di, B * dims.m_dh), sdt),  # s_m — the B-scaling giant
        ((8, di + 128), f32),  # nm_m
        ((B, 3, d), f32),  # conv_s
        ((4, 8, d), f32),  # hcnm_s
    ]
    for shape, dt in states:
        total += 2 * win(shape, dt)
    if tail:
        total += win((1, dims.head_chunk), f32)  # lm_b
        total += win((8, dims.padded_vocab), f32)  # gram
        total += win((dims.rows, dims.padded_vocab + 128), f32)  # hist
        total += 2 * win((dims.rows, 128), f32)  # vals + idx outputs
        total += win((dims.rows, dims.padded_vocab), f32, bufs=1)  # scratch
    else:
        total += win((dims.rows, dims.head_chunk), f32)  # logits out
    total += win((dims.rows, dims.d_model), f32, bufs=1)  # x_scr
    return total


# Fit ceiling for auto-selection, set to the kernel's own
# vmem_limit_bytes request. The estimator reproduced the one measured
# OOM dump to 1% (168.1 MiB estimated vs 166.71M reported at B=8 int8w
# f32-state), so little extra slack is held back here — and a wrong
# admission is cheap anyway: BatchScheduler._run_chunk catches a Mosaic
# VMEM OOM at compile time and rebuilds around the XLA step.
FUSED_VMEM_CEILING = 110 * 1024 * 1024


def fused_vmem_fits(variables, cfg, batch, quant="bf16",
                    state_dtype=jnp.float32, tail: bool = False) -> bool:
    return (
        fused_vmem_bytes(variables, cfg, batch, quant, state_dtype, tail)
        <= FUSED_VMEM_CEILING
    )


def stack_xlstm_states(states, cfg: XLSTMConfig, batch: int,
                       state_dtype=jnp.float32):
    """XLSTMStack.prefill per-block state dicts -> stacked kernel arrays.

    Returns (conv_m (M,B,3,di), s_m (M, di, B*DV), nm_m (M, 8, di+128),
    conv_s (S,B,3,d), hcnm_s (S, 4, 8, d)).

    state_dtype sets the mLSTM matrix memory's STORAGE dtype only (bf16
    halves its ~113 MB/token HBM stream; the kernel computes f32). The
    small n/m/conv/sLSTM states stay f32 regardless."""
    dims = XDims.create(cfg, batch)
    B, H = batch, dims.heads
    DK = dims.m_dh
    conv_m, s_m, nm_m, conv_s, hcnm_s = [], [], [], [], []
    for b_i, st in enumerate(states):
        if b_i in cfg.slstm_at:
            conv_s.append(st["conv"].astype(jnp.float32))
            h, c, n, mm = (x.astype(jnp.float32) for x in st["slstm"])
            hcnm_s.append(
                jnp.stack(
                    [
                        jnp.pad(x.reshape(B, -1), ((0, _ROWS - B), (0, 0)))
                        for x in (h, c, n, mm)
                    ]
                )
            )
        else:
            conv_m.append(st["conv"].astype(jnp.float32))
            s_, n_, m_ = (x.astype(jnp.float32) for x in st["mlstm"])
            # S (B,H,DK,DV) -> (H*DK, B*DV)
            s2 = s_.transpose(1, 2, 0, 3).reshape(H * DK, B * DK)
            s_m.append(s2)
            nm = jnp.zeros((_ROWS, dims.m_inner + 128), jnp.float32)
            nm = nm.at[:B, : dims.m_inner].set(n_.reshape(B, -1))
            nm = nm.at[:B, dims.m_inner : dims.m_inner + H].set(m_)
            nm_m.append(nm)
    return (
        jnp.stack(conv_m),
        jnp.stack(s_m).astype(state_dtype),
        jnp.stack(nm_m),
        jnp.stack(conv_s),
        jnp.stack(hcnm_s),
    )


def unstack_xlstm_states(packs, cfg: XLSTMConfig, batch: int):
    """Inverse of stack_xlstm_states (to resume the XLA step path)."""
    conv_m, s_m, nm_m, conv_s, hcnm_s = packs
    dims = XDims.create(cfg, batch)
    B, H, DK = batch, dims.heads, dims.m_dh
    out = []
    mi = si = 0
    for b_i in range(cfg.num_blocks):
        if b_i in cfg.slstm_at:
            g = hcnm_s[si]
            out.append(
                {
                    "conv": conv_s[si],
                    "slstm": tuple(
                        g[j, :B].reshape(B, H, dims.s_dh) for j in range(4)
                    ),
                }
            )
            si += 1
        else:
            s4 = (
                s_m[mi].astype(jnp.float32)
                .reshape(H, DK, B, DK).transpose(2, 0, 1, 3)
            )
            n_ = nm_m[mi][:B, : dims.m_inner].reshape(B, H, DK)
            m_ = nm_m[mi][:B, dims.m_inner : dims.m_inner + H]
            out.append({"conv": conv_m[mi], "mlstm": (s4, n_, m_)})
            mi += 1
    return tuple(out)


def fused_xlstm_logits_step(
    wp: dict,
    token: jax.Array,  # (B,) int32
    carry,
    cfg: XLSTMConfig,
    dims: XDims,
    interpret: bool = False,
):
    """Full decode step: embed -> fused kernel. Semantics match
    XLSTMLM.step (bf16 matmul tolerance on logits)."""
    x0 = wp["embed"][token]
    quant = "w8a16" if "lm_s" in wp else "none"
    outs = _fused_xlstm_call(
        x0, wp, *carry, None, dims, interpret=interpret, quant=quant
    )
    logits = outs["logits"][: token.shape[0]] + wp["lm_b"][None, :]
    carry = tuple(
        outs[k] for k in ("conv_m_out", "s_m_out", "nm_m_out", "conv_s_out", "hcnm_s_out")
    )
    return logits[:, : cfg.vocab_size], carry


def fused_xlstm_sample_step(
    wp: dict,
    token: jax.Array,
    carry,
    hist: jax.Array,  # (B, vocab_size) penalty counts
    bucket_oh: jax.Array,  # (B, 8)
    cfg: XLSTMConfig,
    dims: XDims,
    interpret: bool = False,
):
    """Decode step WITH the in-kernel sampler tail (grammar/penalty/top-3).
    Returns (vals (B,3), idxs (B,3), new_carry)."""
    x0 = wp["embed"][token]
    quant = "w8a16" if "lm_s" in wp else "none"
    b = token.shape[0]
    vp, v = dims.padded_vocab, dims.vocab_size
    hist_oh = jnp.zeros((dims.rows, vp + 128), jnp.float32)
    hist_oh = hist_oh.at[:b, :v].set(hist.astype(jnp.float32))
    hist_oh = hist_oh.at[:b, vp : vp + 8].set(bucket_oh.astype(jnp.float32))
    outs = _fused_xlstm_call(
        x0,
        wp,
        *carry,
        (wp["lm_b"][None, :], wp["gram8"], hist_oh),
        dims,
        interpret=interpret,
        quant=quant,
        tail=True,
    )
    carry = tuple(
        outs[k] for k in ("conv_m_out", "s_m_out", "nm_m_out", "conv_s_out", "hcnm_s_out")
    )
    return outs["vals"][:b, :3], outs["idx"][:b, :3], carry
