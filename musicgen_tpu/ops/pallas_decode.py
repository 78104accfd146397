"""Fused full-model Mamba-2 decode step — Pallas TPU kernel.

The reference samples by re-forwarding the whole 2048-token window per token
(scripts/generate.py:26-29, the ~26 tok/s bottleneck). Round 1 replaced that
with an O(1)-state `lax.scan` decode; this kernel removes the remaining
bottleneck of THAT loop.

Measured on the target chip (DEV_NOTES.md round-2 profile): the XLA decode
step spends ~325 us/token, of which the two matmuls per mixer account for
~110 us at fp32 (already at the ~2.4 TB/s HBM streaming limit) and the rest
is per-op dispatch overhead across the ~15 small ops per layer. Storing the
weights in bf16 SHOULD halve the streaming time, but XLA's small-M bf16
matmul lowering on this target is ~2x SLOWER than fp32 (measured; the cause
of round 1's "bf16 regression"), so the only way to collect the bf16 win is
a hand kernel.

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

_ROWS = 8  # matmul row block (fp32 sublane tile); batch padded up to this
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

    @classmethod
    def create(cls, cfg: MambaConfig, batch: int) -> "DecodeDims":
        assert cfg.ngroups == 1, "fused decode kernel assumes ngroups=1"
        d_in_proj = 2 * cfg.d_inner + 2 * cfg.d_state + cfg.nheads
        d_in_pad = -(-d_in_proj // 128) * 128
        pv = cfg.padded_vocab
        assert pv % (_HEAD_CHUNKS * 128) == 0, pv
        return cls(
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
    # outputs
    logits_ref,  # (_ROWS, head_chunk) f32 chunk
    conv_state_out_ref,
    ssm_state_out_ref,
    # scratch
    x_scr,  # (_ROWS, d_model) f32, persists across grid steps
    *,
    dims: DecodeDims,
):
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
        x = x_scr[:, :]  # (_ROWS, d_model) f32

        zx = _dot(x.astype(jnp.bfloat16), w_in_ref[0])  # (_ROWS, d_in_pad)

        z = zx[:B, 0:di]  # (B, d_inner)
        xbc_new = zx[:B, di : di + dc]  # (B, conv_dim) raw conv input
        dt_raw = zx[:B, di + dc : di + dc + dh]  # (B, nheads)

        # Depthwise causal conv, 4-tap window (ops/ssm.causal_conv1d_step
        # semantics: state rows oldest->newest, tap K-1 hits the newest).
        cw = conv_w_ref[0]  # (4, conv_dim)
        cs = conv_state_ref[0]  # (B, 3, conv_dim)
        y_conv = (
            cs[:, 0, :] * cw[0][None, :]
            + cs[:, 1, :] * cw[1][None, :]
            + cs[:, 2, :] * cw[2][None, :]
            + xbc_new * cw[3][None, :]
            + conv_b_ref[0]
        )  # (B, conv_dim)
        conv_state_out_ref[0, :, 0, :] = cs[:, 1, :]
        conv_state_out_ref[0, :, 1, :] = cs[:, 2, :]
        conv_state_out_ref[0, :, 2, :] = xbc_new

        xbc = y_conv * jax.nn.sigmoid(y_conv)  # silu
        x_ssd = xbc[:, :di]  # (B, d_inner), lanes = h*P+p
        b_vec = xbc[:, di : di + ds]  # (B, N)
        c_vec = xbc[:, di + ds : di + 2 * ds]  # (B, N)

        dt = jax.nn.softplus(dt_raw + dt_bias_ref[0, 0, :dh][None, :])  # (B, H)
        dt_e = _dot(dt, e_ref[:, :])  # (B, d_inner) per-channel dt
        decay_e = jnp.exp(dt_e * a_e_ref[0])  # (B, d_inner)
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

        s = ssm_state_ref[0]  # (d_inner, B*N)
        s_new = s * decay2d + upd
        ssm_state_out_ref[0] = s_new

        y_t = _dot(s_new, c_diag, contract=((1,), (1,)))  # (d_inner, B)
        eye_b = (
            jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        ).astype(f32)
        y = _dot(eye_b, y_t, contract=((1,), (1,)))  # (B, d_inner)
        y = y + x_ssd * d_e_ref[0]  # D residual

        # Gated RMSNorm (models/mamba._rms_norm_gated semantics).
        g = y * (z * jax.nn.sigmoid(z))
        var = jnp.mean(g * g, axis=-1, keepdims=True)
        g = g * jax.lax.rsqrt(var + 1e-5) * norm_w_ref[0, 0][None, :]

        g_rows = jnp.concatenate(
            [g, jnp.zeros((_ROWS - B, di), f32)], axis=0
        )  # (_ROWS, d_inner); zero pad rows keep x_scr pad rows zero
        x_scr[:, :] = _dot(g_rows.astype(jnp.bfloat16), w_out_ref[0])

    @pl.when(i >= L)
    def _head():
        # Final LayerNorm (recomputed per chunk — trivially cheap) + lm_head.
        x = x_scr[:, :]  # (_ROWS, d_model)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
        h = h * ln_ref[0][None, :] + ln_ref[1][None, :]
        logits_ref[:, :] = _dot(h.astype(jnp.bfloat16), lm_w_ref[:, :])


def _clamp_layer(i, L):
    return jnp.minimum(i, L - 1)


@functools.partial(jax.jit, static_argnames=("dims", "interpret"))
def fused_decode_step(
    x0: jax.Array,  # (B, d_model) f32 embedded token
    w_in: jax.Array,  # (L, d_model, d_in_pad) bf16
    w_out: jax.Array,  # (L, d_inner, d_model) bf16
    conv_w: jax.Array,  # (L, 4, conv_dim) f32
    conv_b: jax.Array,  # (L, 1, conv_dim) f32
    dt_bias: jax.Array,  # (L, 1, 128) f32
    a_e: jax.Array,  # (L, 1, d_inner) f32
    d_e: jax.Array,  # (L, 1, d_inner) f32
    e_mat: jax.Array,  # (nheads, d_inner) f32
    norm_w: jax.Array,  # (L, 1, d_inner) f32
    ln: jax.Array,  # (2, d_model) f32
    lm_w: jax.Array,  # (d_model, padded_vocab) bf16
    conv_state: jax.Array,  # (L, B, 3, conv_dim) f32
    ssm_state: jax.Array,  # (L, d_inner, B*N) f32
    dims: DecodeDims,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Advance the whole model by one token. Returns (logits (B, padded_vocab)
    pre-bias, new_conv_state, new_ssm_state)."""
    L = dims.n_layers
    B = dims.batch
    bn = B * dims.d_state
    x_pad = jnp.pad(x0.astype(jnp.float32), ((0, _ROWS - B), (0, 0)))

    kernel = functools.partial(_decode_kernel, dims=dims)
    grid = (L + _HEAD_CHUNKS,)
    lc = functools.partial(_clamp_layer, L=L)
    logits, cs, ss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, dims.d_model), lambda i: (0, 0)),
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
            pl.BlockSpec(
                (dims.d_model, dims.head_chunk),
                lambda i: (0, jnp.maximum(i - L, 0)),
            ),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (_ROWS, dims.head_chunk), lambda i: (0, jnp.maximum(i - L, 0))
            ),
            pl.BlockSpec((1, B, 3, dims.conv_dim), lambda i: (lc(i), 0, 0, 0)),
            pl.BlockSpec((1, dims.d_inner, bn), lambda i: (lc(i), 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_ROWS, dims.padded_vocab), jnp.float32),
            jax.ShapeDtypeStruct(conv_state.shape, jnp.float32),
            jax.ShapeDtypeStruct(ssm_state.shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_ROWS, dims.d_model), jnp.float32)],
        input_output_aliases={12: 1, 13: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x_pad, w_in, w_out, conv_w, conv_b, dt_bias, a_e, d_e, e_mat,
        norm_w, ln, lm_w, conv_state, ssm_state,
    )
    return logits[:B], cs, ss


# ---------------------------------------------------------------------------
# Parameter/state packing
# ---------------------------------------------------------------------------


def build_decode_params(variables: Any, cfg: MambaConfig, batch: int):
    """Stack and pre-process MambaLM flax params for the fused kernel.

    Returns a dict pytree (built once per generation, hoisted out of the
    sampling scan): bf16 matmul weights padded to lane multiples, per-head
    vectors pre-broadcast to channels, plus the fp32 embedding and lm_head
    bias used outside the kernel.
    """
    p = variables["params"]
    dims = DecodeDims.create(cfg, batch)
    L = cfg.n_layers

    w_in, w_out, conv_w, conv_b = [], [], [], []
    dt_bias, a_e, d_e, norm_w = [], [], [], []
    for i in range(L):
        lp = p[f"layer_{i}"]
        k_in = lp["in_proj"]["kernel"]  # (d_model, d_in_proj)
        pad = dims.d_in_pad - dims.d_in_proj
        w_in.append(jnp.pad(k_in, ((0, 0), (0, pad))).astype(jnp.bfloat16))
        w_out.append(lp["out_proj"]["kernel"].astype(jnp.bfloat16))
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

    return {
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
        "lm_w": lm_w.astype(jnp.bfloat16),
        "lm_b": p["lm_head"]["bias"].astype(jnp.float32),
        "embed": p["token_embedding"]["embedding"].astype(jnp.float32),
    }


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
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Full decode step: embed -> fused kernel (mixers + LN + lm_head).

    Semantics match MambaLM.step (bf16 matmul tolerance on logits)."""
    conv_state, ssm_state = carry
    x0 = dp["embed"][token]  # (B, d_model)
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
    )
    logits = logits + dp["lm_b"][None, :]
    return logits[:, : cfg.vocab_size], (conv_state, ssm_state)
