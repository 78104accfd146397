"""Fused full-model Transformer decode step — Pallas TPU kernel.

Round 2 left transformer sampling on the XLA ring-KV step loop
(`TransformerLM.step`: 1,410 tok/s/seq at B=2, BENCHMARKS.md) while Mamba
and xLSTM got fused kernels. This kernel closes the set: ONE `pallas_call`
advances all 8 blocks (rel-pos attention over the ring KV cache + FFN), the
final LayerNorm, the 17,920-lane lm_head and (optionally) the sampler tail
by one token.

Per-token HBM traffic at B=2 (the irreducible cost of exact decode):
  ~201 MB bf16 block weights + ~37 MB bf16 lm_head + ~34 MB bf16 rel
  tables + ~135 MB bf16 KV-cache reads  ->  ~407 MB. quant='int8w' halves
  the weight+lm stream (K-group int8, bf16 math — ops/pallas_decode._w8dot)
  -> ~288 MB. The KV cache is read-only input; the new K/V row leaves the
  kernel as a tiny (L, B, d_model) output and is scattered into the ring by
  XLA (67 KB/token) — aliasing the whole ring in/out would DOUBLE its
  traffic with write-backs.

The rel-position algebra that makes this kernel possible (steady state:
window full, rel_base fixed at block_len+5 — the production streaming
geometry of sample/cache.step_geometry):

  * The 6 metadata slots (always-visible columns, reference
    model_transformer.py:8-16) have CONSTANT rel indices 0..5: their BD
    term is a fixed (8, d_model) table matmul.
  * Ring slot r holds stream token with age (c - r) mod S where
    c = stream_idx mod S is the newest ring position. The BD term
    bd[r] = q . rel_emb[rel_base - age(r)] collapses to
    roll(q @ rel_emb[6:]^T, c + 1) along the slot axis — derivation:
    with R2[u] = rel_emb[u + 6], (q @ R2^T)[(r - c - 1) mod S]
    = q . rel_emb[6 + (r - c - 1 mod S)] = q . rel_emb[rel_base - age(r)].
    The roll is a doubled-buffer dynamic slice; no gather, no per-step
    table rebuild.
  * All S ring slots are visible in steady state (ages 0..S-1 <= rel_base),
    so no mask is needed; the one STALE row (slot c, overwritten by the
    incoming token) is corrected in-register: its score is replaced by
    q . k_new and its V contribution by p[c] * v_new.

Mosaic-layout notes (rank-2 kernel; no lane<->sublane reshapes):
  * KV caches live as (S, H*hd) with lane = h*hd + d; per-(batch b) score
    columns for ALL heads come from one contraction
    K_b (S, dm) . Qmask_b (8, dm) -> (S, 8), where Qmask_b puts batch b's
    per-head query in its own lane block (row h nonzero only in lanes
    h*hd..h*hd+hd) — built by a constant row-select matmul + block mask.
  * The V readout dot(V_b (S, dm), p_b (S, 8)) -> (dm, 8) holds each
    head's readout in its own sublane block; a block-diagonal mask +
    (8,1)-ones matmul collapses it to the (dm, 1) attention column, and
    out_proj contracts the assembled (dm, B) from dim 0 (A^T B form).

Grid = (2*n_layers [attn|ffn alternating] + lm_head N-chunks + optional
tail,). Attention-stage operands (w_qkv, rel tables, KV blocks) and
FFN-stage operands (w_fc, w_out) advance on their own stages, so each
stage's weight DMA double-buffers against the other stage's compute.

Replaces: the no-cache loop at reference scripts/generate.py:26-29 applied
to models/transformer/model_transformer.py:136-168, at weight-stream speed.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NUM_META, TransformerConfig
from .pallas_decode import QUANT_GROUP, _dot, _head_math, _quantize_cols, _tail_math, _w8dot

_ROWS = 8
_T_HEAD_CHUNKS = 10  # lm_head streamed in this many N-chunks (1792 lanes each)


@dataclasses.dataclass(frozen=True)
class TDims:
    n_layers: int  # 8
    batch: int
    d_model: int  # 1024
    n_heads: int  # 8
    head_dim: int  # 128
    d_ff: int  # 4096
    ring: int  # block_len (2048) — ring KV slots
    padded_vocab: int
    head_chunk: int
    vocab_size: int
    dyn_start: int
    length_start: int
    rows: int

    @classmethod
    def create(cls, cfg: TransformerConfig, batch: int) -> "TDims":
        from ..config import VOCAB

        assert cfg.n_heads <= 8, "score columns are packed into 8 lanes"
        assert cfg.n_embd % cfg.n_heads == 0
        assert cfg.block_len % 8 == 0, "ring slots must be a sublane multiple"
        pv = cfg.padded_vocab
        assert pv % (_T_HEAD_CHUNKS * 128) == 0, pv
        return cls(
            n_layers=cfg.n_layer,
            batch=batch,
            d_model=cfg.n_embd,
            n_heads=cfg.n_heads,
            head_dim=cfg.n_embd // cfg.n_heads,
            d_ff=4 * cfg.n_embd,
            ring=cfg.block_len,
            padded_vocab=pv,
            head_chunk=pv // _T_HEAD_CHUNKS,
            vocab_size=cfg.vocab_size,
            dyn_start=VOCAB.dyn_start,
            length_start=VOCAB.length_start,
            rows=max(_ROWS, -(-batch // 8) * 8),
        )


def _w8dot_t(xt, wq, s):
    """Transposed-activation W8A16: xt (K, M) contracted on dim 0 against
    int8 wq (K, N) with (G, N) K-group scales — the A^T B form _w8dot can't
    express. Used for out_proj, whose activations are assembled (dm, B)."""
    g_n, n = s.shape
    k = wq.shape[0]
    gsz = k // g_n
    acc = jnp.zeros((xt.shape[1], n), jnp.float32)
    for g in range(g_n):
        part = _dot(
            xt[g * gsz : (g + 1) * gsz].astype(jnp.bfloat16),
            wq[g * gsz : (g + 1) * gsz].astype(jnp.bfloat16),
            contract=((0,), (0,)),
        )
        acc = acc + part * s[g : g + 1, :]
    return acc


def _layernorm(x, ln):
    """flax nn.LayerNorm (eps 1e-6): ln (2, dm) = scale | bias."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    h = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    return h * ln[0][None, :] + ln[1][None, :]


def _attn_math(
    x,  # (rows, dm) f32
    c,  # scalar int32: newest ring position (stream_idx mod S)
    ln1, w_qkv, qkv_s, w_proj, proj_s, proj_b,
    rel_ring,  # (S, dm) bf16: rel_emb rows 6.. in lane blocks per head
    rel_meta,  # (8, dm) bf16: rel_emb rows 0..5 (rows 6,7 zero)
    k_meta_b, v_meta_b,  # per-batch tuples of (8, dm) bf16
    k_ring_b, v_ring_b,  # per-batch tuples of (S, dm) bf16
    dims: TDims,
    quant: str,
):
    """One attention sub-layer on a single token. Returns
    (x_out (rows, dm) f32 with residual added, k_new, v_new (rows, dm) bf16)."""
    B, dm, hd = dims.batch, dims.d_model, dims.head_dim
    S = dims.ring
    f32 = jnp.float32
    xn = _layernorm(x, ln1)
    if quant == "w8a16":
        zx = _w8dot(xn, w_qkv, qkv_s)
    else:
        zx = _dot(xn.astype(jnp.bfloat16), w_qkv)  # (rows, 3dm)
    q_rows = zx[:, :dm]
    k_rows = zx[:, dm : 2 * dm].astype(jnp.bfloat16)
    v_rows = zx[:, 2 * dm : 3 * dm].astype(jnp.bfloat16)

    sub_s = jax.lax.broadcasted_iota(jnp.int32, (S, 8), 0)
    # Row h of Qmask_b = q_b masked to head h's lane block.
    blockmask8 = (
        jax.lax.broadcasted_iota(jnp.int32, (8, dm), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (8, dm), 1) // hd
    ).astype(f32)
    blockmask_dm = (
        jax.lax.broadcasted_iota(jnp.int32, (dm, 8), 0) // hd
        == jax.lax.broadcasted_iota(jnp.int32, (dm, 8), 1)
    ).astype(f32)
    meta_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0) < NUM_META
    )
    ones81 = jnp.ones((8, 1), f32)
    scale = float(dm) ** -0.5  # reference scales by model width (:67)

    cols = []
    for b in range(B):
        pick_b = (
            jax.lax.broadcasted_iota(jnp.int32, (8, dims.rows), 1) == b
        ).astype(f32)
        q_rep = _dot(pick_b, q_rows)  # (8, dm): every row = q[b]
        qm = (q_rep * blockmask8).astype(jnp.bfloat16)  # (8, dm)

        ac = _dot(k_ring_b[b], qm, contract=((1,), (1,)))  # (S, 8)
        s_self = _dot(k_rows, qm, contract=((1,), (1,)))[b : b + 1]  # (1, 8)
        ac = jnp.where(sub_s == c, s_self, ac)  # fresh K at the stale slot
        y = _dot(rel_ring, qm, contract=((1,), (1,)))  # (S, 8) age-space BD
        bd = pltpu.roll(y, c + 1, 0)  # slot-space BD (module docstring)
        sr = (ac + bd) * scale  # (S, 8)

        sm = _dot(k_meta_b[b], qm, contract=((1,), (1,))) + _dot(
            rel_meta, qm, contract=((1,), (1,))
        )  # (8, 8)
        sm = jnp.where(meta_valid, sm * scale, -1e30)

        m = jnp.maximum(
            jnp.max(sr, axis=0, keepdims=True),
            jnp.max(sm, axis=0, keepdims=True),
        )  # (1, 8)
        er = jnp.exp(sr - m)
        em = jnp.where(meta_valid, jnp.exp(sm - m), 0.0)
        denom = jnp.sum(er, axis=0, keepdims=True) + jnp.sum(
            em, axis=0, keepdims=True
        )
        pr = er / denom  # (S, 8)
        pm = (em / denom).astype(jnp.bfloat16)  # (8, 8)
        at_c = sub_s == c
        p_c = jnp.sum(jnp.where(at_c, pr, 0.0), axis=0, keepdims=True)  # (1,8)
        pr0 = jnp.where(at_c, 0.0, pr).astype(jnp.bfloat16)

        mv = _dot(v_ring_b[b], pr0, contract=((0,), (0,)))  # (dm, 8)
        mv = mv + _dot(v_meta_b[b], pm, contract=((0,), (0,)))
        mv = mv + _dot(
            v_rows[b : b + 1], p_c.astype(jnp.bfloat16), contract=((0,), (0,))
        )  # fresh V at the stale slot
        cols.append(_dot(mv * blockmask_dm, ones81))  # (dm, 1)

    attn_t = jnp.concatenate(cols, axis=1)  # (dm, B)
    if quant == "w8a16":
        o = _w8dot_t(attn_t, w_proj, proj_s)
    else:
        o = _dot(attn_t.astype(jnp.bfloat16), w_proj, contract=((0,), (0,)))
    o = o + proj_b  # (B, dm)
    if dims.rows == B:  # Mosaic rejects the (0, dm) pad operand
        o_rows = o
    else:
        o_rows = jnp.concatenate(
            [o, jnp.zeros((dims.rows - B, dm), f32)], axis=0
        )
    return x + o_rows, k_rows, v_rows


def _ffn_math(x, ln2, w_fc, fc_s, b_fc, w_out, out_s, b_out, quant):
    """relu FFN sub-layer with residual (reference 4x ReLU MLP, :107-121)."""
    xn = _layernorm(x, ln2)
    if quant == "w8a16":
        h1 = jax.nn.relu(_w8dot(xn, w_fc, fc_s) + b_fc)
        h2 = _w8dot(h1, w_out, out_s) + b_out
    else:
        h1 = jax.nn.relu(_dot(xn.astype(jnp.bfloat16), w_fc) + b_fc)
        h2 = _dot(h1.astype(jnp.bfloat16), w_out) + b_out
    return x + h2


def _tdecode_kernel(
    # inputs
    x_in_ref,  # (rows, dm) f32
    cur_ref,  # (1,) int32 SMEM: newest ring position
    w_qkv_ref,  # (1, dm, 3dm) bf16|int8
    w_proj_ref,  # (1, dm, dm)
    proj_b_ref,  # (1, 1, dm) f32
    ln1_ref,  # (1, 2, dm) f32
    ln2_ref,  # (1, 2, dm) f32
    w_fc_ref,  # (1, dm, 4dm)
    b_fc_ref,  # (1, 1, 4dm) f32
    w_out_ref,  # (1, 4dm, dm)
    b_out_ref,  # (1, 1, dm) f32
    rel_ring_ref,  # (1, S, dm) bf16
    rel_meta_ref,  # (1, 8, dm) bf16
    k_meta_ref,  # (1, B, 8, dm) bf16
    v_meta_ref,
    k_ring_ref,  # (1, B, S, dm) bf16
    v_ring_ref,
    ln_f_ref,  # (2, dm) f32
    lm_w_ref,  # (dm, head_chunk) bf16|int8
    # quant adds (qkv_s, proj_s, fc_s, out_s, lm_s); tail adds
    # (lm_b chunk, gram (8, Vp), hist (rows, Vp+128)). Then outputs:
    # [logits | vals+idx], k_new, v_new (1, rows, dm) bf16; scratch x
    # (+ logit scratch in tail mode).
    *rest,
    dims: TDims,
    quant: str = "none",  # 'none' | 'w8a16'
    tail: bool = False,
):
    rest = list(rest)
    if quant != "none":
        qkv_s_ref, proj_s_ref, fc_s_ref, out_s_ref, lm_s_ref = rest[:5]
        del rest[:5]
    if tail:
        (lm_b_ref, gram_ref, hist_ref,
         vals_ref, idx_ref, k_new_ref, v_new_ref, x_scr, logit_scr) = rest
    else:
        (logits_ref, k_new_ref, v_new_ref, x_scr) = rest
    i = pl.program_id(0)
    L, B = dims.n_layers, dims.batch

    @pl.when(i == 0)
    def _():
        x_scr[:, :] = x_in_ref[:, :]

    @pl.when(jnp.logical_and(i < 2 * L, jax.lax.rem(i, 2) == 0))
    def _attn():
        x_out, k_new, v_new = _attn_math(
            x_scr[:, :],
            cur_ref[0],
            ln1_ref[0],
            w_qkv_ref[0],
            qkv_s_ref[0] if quant != "none" else None,
            w_proj_ref[0],
            proj_s_ref[0] if quant != "none" else None,
            proj_b_ref[0],
            rel_ring_ref[0],
            rel_meta_ref[0],
            [k_meta_ref[0, b] for b in range(B)],
            [v_meta_ref[0, b] for b in range(B)],
            [k_ring_ref[0, b] for b in range(B)],
            [v_ring_ref[0, b] for b in range(B)],
            dims,
            quant,
        )
        x_scr[:, :] = x_out
        k_new_ref[0] = k_new
        v_new_ref[0] = v_new

    @pl.when(jnp.logical_and(i < 2 * L, jax.lax.rem(i, 2) == 1))
    def _ffn():
        x_scr[:, :] = _ffn_math(
            x_scr[:, :],
            ln2_ref[0],
            w_fc_ref[0],
            fc_s_ref[0] if quant != "none" else None,
            b_fc_ref[0],
            w_out_ref[0],
            out_s_ref[0] if quant != "none" else None,
            b_out_ref[0],
            quant,
        )

    n_head_end = 2 * L + _T_HEAD_CHUNKS

    @pl.when(jnp.logical_and(i >= 2 * L, i < n_head_end))
    def _head():
        chunk = _head_math(
            x_scr[:, :],
            ln_f_ref[:, :],
            lm_w_ref[:, :],
            lm_s_ref[:, :] if quant != "none" else None,
            "w8a16" if quant != "none" else "none",
        )
        if tail:
            chunk = chunk + lm_b_ref[:, :]
            c0 = (i - 2 * L) * dims.head_chunk
            logit_scr[:, pl.ds(c0, dims.head_chunk)] = chunk
        else:
            logits_ref[:, :] = chunk

    if tail:

        @pl.when(i == n_head_end)
        def _tail():
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


@functools.partial(
    jax.jit, static_argnames=("dims", "interpret", "quant_mode")
)
def fused_transformer_decode(
    x0: jax.Array,  # (B, dm) f32 embedded token
    cur: jax.Array,  # (1,) int32 newest ring position
    tp: dict,  # packed params (build_transformer_decode_params)
    k_meta: jax.Array,  # (L, B, 8, dm) bf16
    v_meta: jax.Array,
    k_ring: jax.Array,  # (L, B, S, dm) bf16
    v_ring: jax.Array,
    dims: TDims,
    interpret: bool = False,
    quant_mode: str = "none",
    tail_inputs: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
) -> Tuple[jax.Array, ...]:
    """Advance the whole model by one token. Returns
    (logits (rows, padded_vocab) pre-bias | (vals, idxs) with tail_inputs,
    k_new (L, rows, dm) bf16, v_new) — caller scatters k/v_new into the ring."""
    L, B, dm, S = dims.n_layers, dims.batch, dims.d_model, dims.ring
    quant = quant_mode
    with_tail = tail_inputs is not None
    x_pad = jnp.pad(x0.astype(jnp.float32), ((0, dims.rows - B), (0, 0)))

    kernel = functools.partial(
        _tdecode_kernel, dims=dims, quant=quant, tail=with_tail
    )
    grid = (2 * L + _T_HEAD_CHUNKS + (1 if with_tail else 0),)
    la = lambda i: jnp.clip(i // 2, 0, L - 1)
    lb = lambda i: jnp.clip((i - 1) // 2, 0, L - 1)
    hc = lambda i: jnp.clip(i - 2 * L, 0, _T_HEAD_CHUNKS - 1)
    in_specs = [
        pl.BlockSpec((dims.rows, dm), lambda i: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, dm, 3 * dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, dm, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, 1, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, 2, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, 2, dm), lambda i: (lb(i), 0, 0)),
        pl.BlockSpec((1, dm, dims.d_ff), lambda i: (lb(i), 0, 0)),
        pl.BlockSpec((1, 1, dims.d_ff), lambda i: (lb(i), 0, 0)),
        pl.BlockSpec((1, dims.d_ff, dm), lambda i: (lb(i), 0, 0)),
        pl.BlockSpec((1, 1, dm), lambda i: (lb(i), 0, 0)),
        pl.BlockSpec((1, S, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, 8, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, B, 8, dm), lambda i: (la(i), 0, 0, 0)),
        pl.BlockSpec((1, B, 8, dm), lambda i: (la(i), 0, 0, 0)),
        pl.BlockSpec((1, B, S, dm), lambda i: (la(i), 0, 0, 0)),
        pl.BlockSpec((1, B, S, dm), lambda i: (la(i), 0, 0, 0)),
        pl.BlockSpec((2, dm), lambda i: (0, 0)),
        pl.BlockSpec((dm, dims.head_chunk), lambda i: (0, hc(i))),
    ]
    operands = [
        x_pad, cur,
        tp["w_qkv"], tp["w_proj"], tp["proj_b"], tp["ln1"], tp["ln2"],
        tp["w_fc"], tp["b_fc"], tp["w_out"], tp["b_out"],
        tp["rel_ring"], tp["rel_meta"], k_meta, v_meta, k_ring, v_ring,
        tp["ln_f"], tp["lm_w"],
    ]
    if quant != "none":
        g1 = tp["qkv_s"].shape[1]
        g2 = tp["out_s"].shape[1]
        g_lm = tp["lm_s"].shape[0]
        in_specs += [
            pl.BlockSpec((1, g1, 3 * dm), lambda i: (la(i), 0, 0)),
            pl.BlockSpec((1, g1, dm), lambda i: (la(i), 0, 0)),
            pl.BlockSpec((1, g1, dims.d_ff), lambda i: (lb(i), 0, 0)),
            pl.BlockSpec((1, g2, dm), lambda i: (lb(i), 0, 0)),
            pl.BlockSpec((g_lm, dims.head_chunk), lambda i: (0, hc(i))),
        ]
        operands += [tp["qkv_s"], tp["proj_s"], tp["fc_s"], tp["out_s"], tp["lm_s"]]
    if with_tail:
        lm_b, gram, hist_oh = tail_inputs
        in_specs += [
            pl.BlockSpec((1, dims.head_chunk), lambda i: (0, hc(i))),
            pl.BlockSpec((8, dims.padded_vocab), lambda i: (0, 0)),
            pl.BlockSpec((dims.rows, dims.padded_vocab + 128), lambda i: (0, 0)),
        ]
        operands += [lm_b, gram, hist_oh]

    kv_out_specs = [
        pl.BlockSpec((1, dims.rows, dm), lambda i: (la(i), 0, 0)),
        pl.BlockSpec((1, dims.rows, dm), lambda i: (la(i), 0, 0)),
    ]
    kv_out_shape = [
        jax.ShapeDtypeStruct((L, dims.rows, dm), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, dims.rows, dm), jnp.bfloat16),
    ]
    if with_tail:
        out_specs = [
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
            pl.BlockSpec((dims.rows, 128), lambda i: (0, 0)),
        ] + kv_out_specs
        out_shape = [
            jax.ShapeDtypeStruct((dims.rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((dims.rows, 128), jnp.int32),
        ] + kv_out_shape
        scratch = [
            pltpu.VMEM((dims.rows, dm), jnp.float32),
            pltpu.VMEM((dims.rows, dims.padded_vocab), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((dims.rows, dims.head_chunk), lambda i: (0, hc(i))),
        ] + kv_out_specs
        out_shape = [
            jax.ShapeDtypeStruct((dims.rows, dims.padded_vocab), jnp.float32),
        ] + kv_out_shape
        scratch = [pltpu.VMEM((dims.rows, dm), jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Parameter/state packing
# ---------------------------------------------------------------------------


def build_transformer_decode_params(
    variables: Any, cfg: TransformerConfig, batch: int, quant: str = "bf16"
):
    """Stack and pre-process TransformerLM flax params for the fused kernel.

    quant='bf16' streams bf16 weights; 'int8w' (W8A16) stores
    w_qkv/w_proj/w_fc/w_out/lm_head int8 with (256-row-group x column)
    scales (ops/pallas_decode._quantize_cols), halving the weight stream.
    The rel tables and KV cache stay bf16 — experiments/int8_ablate.py
    shows quantization noise is amplified by recurrence, not by one-shot
    tables."""
    assert quant in ("bf16", "int8", "int8w"), quant
    qmode = "int8" if quant in ("int8", "int8w") else "bf16"
    p = variables["params"]
    dims = TDims.create(cfg, batch)
    L, dm = cfg.n_layer, cfg.n_embd

    def stack(fn):
        return jnp.stack([fn(p[f"block_{i}"]) for i in range(L)])

    w_qkv = stack(
        lambda bp: jnp.concatenate(
            [bp["attn"][n]["kernel"] for n in ("q", "k", "v")], axis=1
        )
    )  # (L, dm, 3dm)
    w_proj = stack(lambda bp: bp["attn"]["proj"]["kernel"])
    w_fc = stack(lambda bp: bp["mlp"]["fc"]["kernel"])
    w_out = stack(lambda bp: bp["mlp"]["out"]["kernel"])

    def ln_pair(d):
        return jnp.stack(
            [d["scale"].astype(jnp.float32), d["bias"].astype(jnp.float32)]
        )

    # rel_pos_emb (H, seq_len, hd) -> ring table (S, dm) rows 6.. and meta
    # table (8, dm) rows 0..5, lane = h*hd + d.
    def rel_tables(bp):
        r = bp["attn"]["rel_pos_emb"].astype(jnp.float32)  # (H, T, hd)
        rt = r.transpose(1, 0, 2).reshape(r.shape[1], dm)  # (T, dm)
        ring = rt[NUM_META : NUM_META + dims.ring]
        meta = jnp.pad(rt[:NUM_META], ((0, 8 - NUM_META), (0, 0)))
        return ring, meta

    rel = [rel_tables(p[f"block_{i}"]) for i in range(L)]
    out = {
        "proj_b": stack(
            lambda bp: bp["attn"]["proj"]["bias"].astype(jnp.float32)[None, :]
        ),
        "b_fc": stack(
            lambda bp: bp["mlp"]["fc"]["bias"].astype(jnp.float32)[None, :]
        ),
        "b_out": stack(
            lambda bp: bp["mlp"]["out"]["bias"].astype(jnp.float32)[None, :]
        ),
        "ln1": stack(lambda bp: ln_pair(bp["ln1"])),
        "ln2": stack(lambda bp: ln_pair(bp["ln2"])),
        "ln_f": ln_pair(p["ln_f"]),
        "rel_ring": jnp.stack([r[0] for r in rel]).astype(jnp.bfloat16),
        "rel_meta": jnp.stack([r[1] for r in rel]).astype(jnp.bfloat16),
        "lm_b": p["lm_head"]["bias"].astype(jnp.float32),
        "embed": p["token_embedding"]["embedding"].astype(jnp.float32),
    }
    lm_w = p["lm_head"]["kernel"]
    assert lm_w.shape == (dm, dims.padded_vocab), lm_w.shape
    if qmode == "int8":
        for name, w in (("w_qkv", w_qkv), ("w_proj", w_proj),
                        ("w_fc", w_fc), ("w_out", w_out)):
            qs = [_quantize_cols(w[i]) for i in range(L)]
            out[name] = jnp.stack([q for q, _ in qs])
            out[name.replace("w_", "") + "_s"] = jnp.stack([s for _, s in qs])
        q_lm, s_lm = _quantize_cols(lm_w)
        out["lm_w"], out["lm_s"] = q_lm, s_lm
    else:
        out["w_qkv"] = w_qkv.astype(jnp.bfloat16)
        out["w_proj"] = w_proj.astype(jnp.bfloat16)
        out["w_fc"] = w_fc.astype(jnp.bfloat16)
        out["w_out"] = w_out.astype(jnp.bfloat16)
        out["lm_w"] = lm_w.astype(jnp.bfloat16)

    from ..config import VOCAB
    from .grammar import grammar_mask

    g = grammar_mask(VOCAB)
    out["gram8"] = (
        jnp.zeros((8, dims.padded_vocab), jnp.float32)
        .at[:5, : VOCAB.vocab_size]
        .set(g.astype(jnp.float32))
    )
    return out


def stack_transformer_cache(caches, dims: TDims):
    """Per-layer KV dicts from TransformerLM.prefill -> kernel layout.

    caches[l]['k'] is (B, H, seq_len, hd) with slots 0..5 = metadata and
    6..6+ring-1 = the token ring (sample/cache.py). Returns
    (k_meta, v_meta (L, B, 8, dm) bf16, k_ring, v_ring (L, B, S, dm) bf16)."""
    n, S, dm = NUM_META, dims.ring, dims.d_model

    def repack(c, sl):
        x = c[:, :, sl]  # (B, H, s, hd)
        x = x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2], dm)
        return x.astype(jnp.bfloat16)

    k_meta = jnp.stack(
        [jnp.pad(repack(c["k"], slice(0, n)), ((0, 0), (0, 8 - n), (0, 0)))
         for c in caches]
    )
    v_meta = jnp.stack(
        [jnp.pad(repack(c["v"], slice(0, n)), ((0, 0), (0, 8 - n), (0, 0)))
         for c in caches]
    )
    k_ring = jnp.stack([repack(c["k"], slice(n, n + S)) for c in caches])
    v_ring = jnp.stack([repack(c["v"], slice(n, n + S)) for c in caches])
    return k_meta, v_meta, k_ring, v_ring


def _scatter_kv(ring, new, c, batch):
    """Write the (L, rows, dm) fresh K|V rows into ring slot c (67 KB)."""
    upd = new[:, :batch][:, :, None, :]  # (L, B, 1, dm)
    return jax.lax.dynamic_update_slice(ring, upd, (0, 0, c, 0))


def fused_transformer_logits_step(
    tp: dict,
    token: jax.Array,  # (B,) int32
    carry: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    cfg: TransformerConfig,
    dims: TDims,
    stream_idx: jax.Array,
    interpret: bool = False,
    quant: str = "bf16",
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Full decode step: embed -> fused kernel -> KV scatter. Semantics
    match TransformerLM.step in the full-window streaming regime
    (stream_idx + 1 >= block_len; bf16 matmul tolerance on logits)."""
    k_meta, v_meta, k_ring, v_ring = carry
    x0 = tp["embed"][token]
    c = jnp.mod(stream_idx, dims.ring).astype(jnp.int32)
    qmode = "w8a16" if quant in ("int8", "int8w") else "none"
    logits, k_new, v_new = fused_transformer_decode(
        x0, c[None], tp, k_meta, v_meta, k_ring, v_ring, dims,
        interpret=interpret, quant_mode=qmode,
    )
    k_ring = _scatter_kv(k_ring, k_new, c, dims.batch)
    v_ring = _scatter_kv(v_ring, v_new, c, dims.batch)
    logits = logits[: dims.batch] + tp["lm_b"][None, :]
    return logits[:, : cfg.vocab_size], (k_meta, v_meta, k_ring, v_ring)


def fused_transformer_sample_step(
    tp: dict,
    token: jax.Array,
    carry: Tuple[jax.Array, ...],
    hist: jax.Array,  # (B, vocab_size) penalty-window counts
    bucket_oh: jax.Array,  # (B, 8)
    cfg: TransformerConfig,
    dims: TDims,
    stream_idx: jax.Array,
    interpret: bool = False,
    quant: str = "bf16",
) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, ...]]:
    """Decode step WITH the in-kernel sampler tail (grammar/penalty/top-3).
    Returns (vals (B,3), idxs (B,3), new_carry); logits never leave VMEM."""
    k_meta, v_meta, k_ring, v_ring = carry
    x0 = tp["embed"][token]
    c = jnp.mod(stream_idx, dims.ring).astype(jnp.int32)
    qmode = "w8a16" if quant in ("int8", "int8w") else "none"
    vp, v, b = dims.padded_vocab, dims.vocab_size, token.shape[0]
    hist_oh = jnp.zeros((dims.rows, vp + 128), jnp.float32)
    hist_oh = hist_oh.at[:b, :v].set(hist.astype(jnp.float32))
    hist_oh = hist_oh.at[:b, vp : vp + 8].set(bucket_oh.astype(jnp.float32))
    vals, idxs, k_new, v_new = fused_transformer_decode(
        x0, c[None], tp, k_meta, v_meta, k_ring, v_ring, dims,
        interpret=interpret, quant_mode=qmode,
        tail_inputs=(tp["lm_b"][None, :], tp["gram8"], hist_oh),
    )
    k_ring = _scatter_kv(k_ring, k_new, c, dims.batch)
    v_ring = _scatter_kv(v_ring, v_new, c, dims.batch)
    return vals[:b, :3], idxs[:b, :3], (k_meta, v_meta, k_ring, v_ring)


def fused_vmem_bytes(
    variables: Any,
    cfg: TransformerConfig,
    batch: int,
    quant: str = "bf16",
    tail: bool = True,
) -> int:
    """Estimate the fused kernel's scoped-VMEM requirement at this batch.

    Same model as ops/pallas_xlstm_decode.fused_vmem_bytes: Mosaic holds one
    double-buffered persistent window per operand for the whole grid, so the
    requirement is the SUM over operands of 2 x window_bytes. The dominant
    B-scaling operands here are the ring KV caches — window (B, S, d_model)
    bf16 for each of k_ring/v_ring (fused_transformer_decode in_specs): at
    B=2/S=2048/dm=1024 that is 2 x 2 x 16.8 MiB = 33.6 MiB of the budget;
    at B=4 it doubles to 67.1 MiB and the kernel exceeded the 128 MiB chip
    ceiling (152.38M used — experiments/r4/fidelity_transformer.log, the
    compile crash that killed the round-4 fidelity campaign). Weight windows
    are per-layer slices and do not scale with B.

    Shapes come from jax.eval_shape over build_transformer_decode_params
    (zero FLOPs) plus the in_specs/out_specs windows, so the estimate tracks
    the kernel's operand list by construction. It underestimates the
    measured Mosaic dump ~10% (spill/revectorization slack), which the
    conservative ceiling below absorbs.
    """
    dims = TDims.create(cfg, batch)
    qmode = "int8" if quant in ("int8", "int8w") else "bf16"
    pack = jax.eval_shape(
        lambda v: build_transformer_decode_params(v, cfg, batch, quant=qmode),
        variables,
    )
    bf16, f32 = jnp.bfloat16, jnp.float32

    def win(shape, dtype, bufs=2):
        n = 1
        for s in shape:
            n *= s
        return bufs * n * jnp.dtype(dtype).itemsize

    dm, S, B = dims.d_model, dims.ring, dims.batch
    total = win((dims.rows, dm), f32)  # x_in
    for k in ("w_qkv", "w_proj", "proj_b", "ln1", "ln2",
              "w_fc", "b_fc", "w_out", "b_out", "rel_ring", "rel_meta"):
        a = pack[k]  # (L, ...) stacks: window = one layer's slice
        total += win(a.shape[1:], a.dtype)
    total += 2 * win((B, 8, dm), bf16)  # k_meta + v_meta
    total += 2 * win((B, S, dm), bf16)  # k_ring + v_ring — the B-scaling giants
    total += win(pack["ln_f"].shape, f32)
    total += win((dm, dims.head_chunk), pack["lm_w"].dtype)
    if qmode == "int8":
        for k in ("qkv_s", "proj_s", "fc_s", "out_s"):
            a = pack[k]
            total += win(a.shape[1:], a.dtype)
        total += win((pack["lm_s"].shape[0], dims.head_chunk), f32)
    total += 2 * win((dims.rows, dm), bf16)  # k_new + v_new outputs
    if tail:
        total += win((1, dims.head_chunk), f32)  # lm_b
        total += win((8, dims.padded_vocab), f32)  # gram8
        total += win((dims.rows, dims.padded_vocab + 128), f32)  # hist_oh
        total += 2 * win((dims.rows, 128), f32)  # vals + idx outputs
        total += win((dims.rows, dims.padded_vocab), f32, bufs=1)  # scratch
    else:
        total += win((dims.rows, dims.head_chunk), f32)  # logits out
    total += win((dims.rows, dm), f32, bufs=1)  # x_scr
    return total


# Fit ceiling for auto-selection. The kernel requests vmem_limit_bytes =
# 116 MiB; the estimator runs ~15% under the measured Mosaic dump (B=4
# bf16 tail: 130.3 MiB estimated vs 152.38M reported), so admission uses
# a 99 MiB ceiling — B=2 (the measured-good geometry, 98.2 MiB est,
# 1,802 tok/s int8w) admits; B>=3 bf16 and B>=4 int8w reject and take
# the XLA step path instead of crashing the CLI at compile time
# (the round-4 fidelity-campaign failure). A wrong admission is still
# recoverable: sample.generate catches the Mosaic compile OOM and
# rebuilds around the XLA step, like serve.BatchScheduler._run_chunk.
FUSED_VMEM_CEILING = 99 * 1024 * 1024


def fused_vmem_fits(variables, cfg, batch, quant="bf16",
                    tail: bool = True) -> bool:
    return fused_vmem_bytes(variables, cfg, batch, quant, tail) <= FUSED_VMEM_CEILING
