"""Whole-generation fused Mamba decode — ONE pallas_call generates N tokens.

Round 2's fused decode kernel (ops/pallas_decode) made the per-token step
DMA-bound at the HBM roofline, but between kernel calls the recurrent state
still round-trips HBM (~21 MB/token r+w) and the sampler's pick/penalty
feedback runs as XLA ops (~70 us/token of scan-body overhead e2e,
BENCHMARKS.md: 230 us bare step vs 291 us e2e).

This kernel removes both: the grid is (num_tokens, stages) and EVERYTHING
that changes per token — conv/SSM states, the penalty window (hist + tick
ring), the top-3 candidates, the picked token — lives in VMEM scratch that
persists across grid steps. Per token, the only HBM traffic is the weight
stream itself (plus one embedding row in, one token out), which is the
irreducible cost of exact full-vocab sampling. The sampler tail (grammar
filter, tick-window repetition penalty, per-field top-k, categorical pick)
runs in-kernel; the random numbers are jax.random uniforms precomputed
outside and streamed in (4 KB/token).

Semantics: sample_tokens(mode='combined') / fused_sample_step, with two
documented deviations:
  * the k-choice and top-k pick invert their distributions by CDF from
    streamed uniforms rather than jax.random.categorical's Gumbel trick —
    identical distributions, different streams. greedy=True involves no
    randomness and is bit-comparable to the XLA sampler (the parity
    vehicle, tests/test_pallas_generate.py).
  * token picks happen at stage 0 of each grid row, so the token emitted at
    row t is the pick AFTER t model steps — the same stream order as
    sample_tokens_fused_tail (seeded by the prefill top-3).

Stage layout per token row t (grid dim 1):
  s == 0          pick token_t from the top-3 scratch (RNG/greedy), push it
                  into the penalty window, write it to the output block,
                  DMA its embedding row from HBM, then run mixer layer 0
  s in [1, L)     mixer layer s (weights streamed, state in VMEM)
  s in [L, L+C)   lm_head N-chunk s-L into the logits scratch
  s == L+C        sampler tail: grammar/penalty/top-3 -> candidates scratch

Replaces: scripts/generate.py:14-95 applied to models/mamba/mamba.py
(reference's no-cache host loop) — at weight-stream speed-of-light.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MambaConfig, VOCAB
from .pallas_decode import (
    _HEAD_CHUNKS,
    DecodeDims,
    _head_math,
    _mixer_math,
    _tail_math,
)

WINDOW_TICKS = 64 * 16  # sample/sampler.py WINDOW_TICKS (generate.py:42)


def _generate_kernel(
    # --- inputs ---
    w_in_ref,  # (1, d_model, d_in_pad) bf16|int8, layer-indexed
    w_out_ref,  # (1, d_inner, d_model)
    conv_w_ref,  # (1, 4, conv_dim) f32
    conv_b_ref,  # (1, 1, conv_dim) f32
    dt_bias_ref,  # (1, 1, 128) f32
    a_e_ref,  # (1, 1, d_inner) f32
    d_e_ref,  # (1, 1, d_inner) f32
    e_ref,  # (nheads, d_inner) f32
    norm_w_ref,  # (1, 1, d_inner) f32
    ln_ref,  # (2, d_model) f32
    lm_w_ref,  # (d_model, head_chunk) chunk
    lm_b_ref,  # (1, head_chunk) f32 chunk
    gram_ref,  # (8, Vp) f32 grammar table (rows 5-7 zero)
    u_ref,  # (1, rows, 128) f32 uniforms for token t (lane0 k, lane1 pick)
    embed_hbm,  # (Vp//8, 8, d_model) f32, memory_space=ANY: manual row DMA
    conv0_ref,  # (1, B, 3, conv_dim) f32 init conv state (layer-indexed @t0)
    ssm0_ref,  # (1, d_inner, B*N) f32 init SSM state (layer-indexed @t0)
    init_cand_ref,  # (rows, 128) f32: prefill top-3 vals lanes 0-2
    init_cidx_ref,  # (rows, 128) i32: prefill top-3 idxs lanes 0-2
    init_last_ref,  # (rows, 128) i32: last prompt token at lane 0
    init_hist_ref,  # (rows, Vp) f32: penalty window counts
    init_ring_tok_ref,  # (rows, W) i32
    init_ring_c_ref,  # (rows, W) i32
    init_meta_ref,  # (rows, 128) i32: lane0 start, lane1 head, lane2 wsum
    # quant != 'none' inserts 3 scale INPUTS here (w_in_s (1,G,K),
    # w_out_s (1,G,K), lm_s (G,chunk)); then outputs, then scratch:
    #   outputs: toks_ref (rows, 128) i32 block t//128;
    #            conv_out_ref (1, B, 3, conv_dim); ssm_out_ref (1, d_inner,
    #            B*N) — both layer-indexed on the last token row only
    #   scratch: x_scr (rows, d_model) f32; logit_scr (rows, Vp) f32;
    #            cand_scr/cidx_scr (rows, 128) top-3 vals/idxs;
    #            last_scr (rows, 128) i32 token at lane 0;
    #            hist_scr (rows, Vp) f32; ring_tok/ring_c (rows, W) i32;
    #            meta_scr (rows, 128) i32 start/head/wsum lanes 0-2;
    #            conv_scr (L, B, 3, conv_dim); ssm_scr (L, d_inner, B*N);
    #            emb_scr (8, d_model) landing pad; dma_sem
    *rest,
    dims: DecodeDims,
    quant: str,
    greedy: bool,
    ring: int,
):
    rest = list(rest)
    if quant != "none":
        scale_refs = rest[:3]
        del rest[:3]
    else:
        scale_refs = []
    (toks_ref, conv_out_ref, ssm_out_ref,
     x_scr, logit_scr, cand_scr, cidx_scr, last_scr, hist_scr,
     ring_tok_scr, ring_c_scr, meta_scr, conv_scr, ssm_scr,
     emb_scr, dma_sem) = rest
    t = pl.program_id(0)
    s = pl.program_id(1)
    L = dims.n_layers
    B = dims.batch
    rows = dims.rows
    vp = dims.padded_vocab
    f32 = jnp.float32
    i32 = jnp.int32
    n_tail = L + _HEAD_CHUNKS

    lane128 = jax.lax.broadcasted_iota(i32, (rows, 128), 1)
    lane_w = jax.lax.broadcasted_iota(i32, (rows, ring), 1)
    ids_v = jax.lax.broadcasted_iota(i32, (rows, vp), 1)

    @pl.when(jnp.logical_and(t == 0, s == 0))
    def _init():
        cand_scr[:, :] = init_cand_ref[:, :]
        cidx_scr[:, :] = init_cidx_ref[:, :]
        last_scr[:, :] = init_last_ref[:, :]
        hist_scr[:, :] = init_hist_ref[:, :]
        ring_tok_scr[:, :] = init_ring_tok_ref[:, :]
        ring_c_scr[:, :] = init_ring_c_ref[:, :]
        meta_scr[:, :] = init_meta_ref[:, :]
        x_scr[:, :] = jnp.zeros((rows, dims.d_model), f32)

    # Load this layer's initial state into scratch on the first token row.
    @pl.when(jnp.logical_and(t == 0, s < L))
    def _load_state():
        conv_scr[s] = conv0_ref[0]
        ssm_scr[s] = ssm0_ref[0]

    @pl.when(s == 0)
    def _pick_and_embed():
        last = last_scr[:, 0:1]  # (rows, 1) token consumed last step
        # Per-field random top-k (sample/sampler._sample_k distributions):
        # bucket: 0 pitch, 1 dyn, 2 length, 3 time, 4 tempo.
        bucket = (
            (last >= dims.dyn_start).astype(i32)
            + (last >= dims.length_start).astype(i32)
            + (last >= VOCAB.time_start).astype(i32)
            + (last >= VOCAB.tempo_start).astype(i32)
        )  # (rows, 1)
        if greedy:
            token = cidx_scr[:, 0:1]  # (rows, 1)
        else:
            u_k = u_ref[0][:, 0:1]
            u_p = u_ref[0][:, 1:2]
            # P(k=1), P(k=2) per bucket (len/time fixed k=1).
            p1 = jnp.where(
                bucket == 4, jnp.float32(0.6),
                jnp.where(bucket <= 1, jnp.float32(0.5), jnp.float32(1.0)),
            )
            p2 = jnp.where(
                bucket == 0, jnp.float32(0.5),
                jnp.where(bucket == 4, jnp.float32(0.4), jnp.float32(0.0)),
            )
            k = 1 + (u_k >= p1).astype(i32) + (u_k >= p1 + p2).astype(i32)
            v0 = cand_scr[:, 0:1]
            v1 = jnp.where(k >= 2, cand_scr[:, 1:2], 0.0)
            v2 = jnp.where(k >= 3, cand_scr[:, 2:3], 0.0)
            r = u_p * (v0 + v1 + v2)
            choice = (r >= v0).astype(i32) + (r >= v0 + v1).astype(i32)
            token = jnp.where(
                choice == 0,
                cidx_scr[:, 0:1],
                jnp.where(choice == 1, cidx_scr[:, 1:2], cidx_scr[:, 2:3]),
            )
        last_scr[:, :] = jnp.where(lane128 == 0, token, 0)

        # Emit token_t into the output block (zero the block's first write).
        col = jnp.mod(t, 128)
        base = jnp.where(col == 0, 0, toks_ref[:, :])
        toks_ref[:, :] = jnp.where(lane128 == col, token, base)

        # Penalty push (sample/sampler.push_token semantics).
        is_time = jnp.logical_and(
            token >= VOCAB.time_start, token < VOCAB.tempo_start
        )
        c_new = jnp.where(is_time, token - VOCAB.time_start, 0).astype(i32)
        head = meta_scr[:, 1:2]
        slot = jnp.mod(head, ring)  # (rows, 1)
        ring_tok_scr[:, :] = jnp.where(lane_w == slot, token, ring_tok_scr[:, :])
        ring_c_scr[:, :] = jnp.where(lane_w == slot, c_new, ring_c_scr[:, :])
        hist_scr[:, :] = hist_scr[:, :] + (ids_v == token).astype(f32)
        wsum = meta_scr[:, 2:3] + c_new
        start = meta_scr[:, 0:1]

        rtok = ring_tok_scr[:, :]
        rc = ring_c_scr[:, :]

        def cond(carry):
            start, wsum = carry
            return jnp.any(wsum >= WINDOW_TICKS)

        def body(carry):
            start, wsum = carry
            advance = wsum >= WINDOW_TICKS  # (rows, 1)
            sslot = jnp.mod(start, ring)
            sel = (lane_w == sslot).astype(i32)
            evict_tok = jnp.sum(rtok * sel, axis=1, keepdims=True)
            evict_c = jnp.sum(rc * sel, axis=1, keepdims=True)
            hist_scr[:, :] = hist_scr[:, :] - jnp.where(
                jnp.logical_and(ids_v == evict_tok, advance), 1.0, 0.0
            )
            wsum = jnp.where(advance, wsum - evict_c, wsum)
            start = jnp.where(advance, start + 1, start)
            return start, wsum

        start, wsum = jax.lax.while_loop(cond, body, (start, wsum))
        meta = jnp.where(lane128 == 0, start, meta_scr[:, :])
        meta = jnp.where(lane128 == 1, head + 1, meta)
        meta_scr[:, :] = jnp.where(lane128 == 2, wsum, meta)

        # Embedding rows: one aligned 8-row DMA per batch row (HBM gather).
        # Mosaic requires tiled-dim slices to be 8-row-aligned, so the
        # table is shipped as (Vp//8, 8, d_model) and we fetch the whole
        # sublane group containing the token, then mask-select its row
        # (32 KB/row vs 4 KB — noise next to the weight stream).
        row8 = jax.lax.broadcasted_iota(i32, (8, dims.d_model), 0)
        x_new = jnp.zeros((rows, dims.d_model), f32)
        row_of = jax.lax.broadcasted_iota(i32, (rows, dims.d_model), 0)
        for b in range(B):
            tok_b = token[b, 0]
            cp = pltpu.make_async_copy(
                embed_hbm.at[tok_b // 8],
                emb_scr,
                dma_sem,
            )
            cp.start()
            cp.wait()
            emb_row = jnp.sum(
                jnp.where(row8 == jnp.mod(tok_b, 8), emb_scr[:, :], 0.0),
                axis=0,
                keepdims=True,
            )  # (1, d_model)
            x_new = jnp.where(row_of == b, emb_row, x_new)
        x_scr[:, :] = x_new

    @pl.when(s < L)
    def _mixer():
        x_out, cs_new, s_new = _mixer_math(
            x_scr[:, :],
            w_in_ref[0],
            scale_refs[0][0] if quant != "none" else None,
            w_out_ref[0],
            scale_refs[1][0] if quant != "none" else None,
            conv_w_ref[0],
            conv_b_ref[0],
            dt_bias_ref[0],
            a_e_ref[0],
            d_e_ref[0],
            e_ref[:, :],
            norm_w_ref[0],
            conv_scr[s],
            ssm_scr[s],
            dims,
            quant,
        )
        conv_scr[s] = cs_new
        ssm_scr[s] = s_new
        # Final states surface through the outputs only on the LAST token
        # row: the out index map pins to block 0 for t < T-1, so no HBM
        # write-back traffic happens during the loop (~10 MB/token saved),
        # and at t == T-1 each layer's block is written once.
        @pl.when(t == pl.num_programs(0) - 1)
        def _store_final():
            conv_out_ref[0] = cs_new
            ssm_out_ref[0] = s_new

        x_scr[:, :] = x_out

    @pl.when(jnp.logical_and(s >= L, s < n_tail))
    def _head():
        chunk_logits = _head_math(
            x_scr[:, :],
            ln_ref[:, :],
            lm_w_ref[:, :],
            scale_refs[2][:, :] if quant != "none" else None,
            quant,
        )
        chunk_logits = chunk_logits + lm_b_ref[:, :]
        c0 = (s - L) * dims.head_chunk
        logit_scr[:, pl.ds(c0, dims.head_chunk)] = chunk_logits

    @pl.when(s == n_tail)
    def _tail():
        token = last_scr[:, 0:1]
        bucket = (
            (token >= dims.dyn_start).astype(i32)
            + (token >= dims.length_start).astype(i32)
            + (token >= VOCAB.time_start).astype(i32)
            + (token >= VOCAB.tempo_start).astype(i32)
        )
        b8 = jax.lax.broadcasted_iota(i32, (rows, 8), 1)
        bucket_oh = (b8 == bucket).astype(f32)
        vals, idxs = _tail_math(
            logit_scr[:, :], gram_ref[:, :], hist_scr[:, :], bucket_oh, dims
        )
        cand_scr[:, :] = vals
        cidx_scr[:, :] = idxs


@functools.partial(
    jax.jit,
    static_argnames=("dims", "num_tokens", "greedy", "interpret", "quant_mode", "ring"),
)
def fused_generate(
    dp: dict,  # packed params from pallas_decode.build_decode_params
    init_cand: jax.Array,  # (B, 3) f32 prefill top-3 vals
    init_cidx: jax.Array,  # (B, 3) i32 prefill top-3 idxs
    init_last: jax.Array,  # (B,) i32 last prompt token
    conv_state: jax.Array,  # (L, B, 3, conv_dim) f32
    ssm_state: jax.Array,  # (L, d_inner, B*N) f32
    hist: jax.Array,  # (B, vocab_size) i32 penalty counts
    ring_tok: jax.Array,  # (B, W) i32
    ring_c: jax.Array,  # (B, W) i32
    start: jax.Array,  # (B,) i32
    head: jax.Array,  # (B,) i32
    wsum: jax.Array,  # (B,) i32
    rng: jax.Array,  # jax.random key for the pick/k uniforms
    dims: DecodeDims,
    num_tokens: int,
    greedy: bool = False,
    interpret: bool = False,
    quant_mode: str = "w8a8",
    ring: int = 2048,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Generate num_tokens tokens in one kernel launch.

    Returns (tokens (B, num_tokens) i32, final_conv_state, final_ssm_state).
    """
    L = dims.n_layers
    B = dims.batch
    rows = dims.rows
    vp = dims.padded_vocab
    bn = B * dims.d_state
    quant = quant_mode if "w_in_s" in dp else "none"
    n_pad = -(-num_tokens // 128) * 128

    def pad_rows(x, fill=0):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)), constant_values=fill)

    def lanes128(x, dtype):
        out = jnp.zeros((rows, 128), dtype)
        return out.at[: x.shape[0], : x.shape[1]].set(x.astype(dtype))

    init_cand_p = lanes128(init_cand, jnp.float32)
    init_cidx_p = lanes128(init_cidx, jnp.int32)
    init_last_p = lanes128(init_last[:, None], jnp.int32)
    init_hist = jnp.zeros((rows, vp), jnp.float32).at[:B, : hist.shape[1]].set(
        hist.astype(jnp.float32)
    )
    init_ring_tok = pad_rows(ring_tok.astype(jnp.int32))
    init_ring_c = pad_rows(ring_c.astype(jnp.int32))
    meta = jnp.stack([start, head, wsum], axis=1).astype(jnp.int32)  # (B, 3)
    init_meta = lanes128(meta, jnp.int32)
    assert ring_tok.shape[1] == ring, (ring_tok.shape, ring)

    # Streamed uniforms: lane 0 drives the k-choice, lane 1 the top-k pick
    # (4 KB/token DMA; greedy needs none).
    if greedy:
        uniforms = jnp.zeros((num_tokens, rows, 128), jnp.float32)
    else:
        u = jax.random.uniform(rng, (num_tokens, B, 2), jnp.float32)
        uniforms = jnp.zeros((num_tokens, rows, 128), jnp.float32).at[
            :, :B, :2
        ].set(u)

    n_stages = L + _HEAD_CHUNKS + 1
    grid = (num_tokens, n_stages)

    def lc(t, s, *_):
        return jnp.minimum(s, L - 1)

    def hc(t, s, *_):
        return jnp.clip(s - L, 0, _HEAD_CHUNKS - 1)

    def state_ix(t, s, *_):
        # Fetch each layer's init state once (t==0); pin afterwards.
        return (jnp.where(t == 0, jnp.minimum(s, L - 1), 0), 0, 0)

    def state_ix4(t, s, *_):
        i, a, b_ = state_ix(t, s)
        return (i, a, b_, 0)

    const2 = lambda t, s, *_: (0, 0)
    const3 = lambda t, s, *_: (0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, dims.d_model, dims.d_in_pad), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, dims.d_inner, dims.d_model), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, 4, dims.conv_dim), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, 1, dims.conv_dim), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, 1, 128), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, 1, dims.d_inner), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((1, 1, dims.d_inner), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((dims.nheads, dims.d_inner), const2),
        pl.BlockSpec((1, 1, dims.d_inner), lambda t, s, *_: (lc(t, s), 0, 0)),
        pl.BlockSpec((2, dims.d_model), const2),
        pl.BlockSpec((dims.d_model, dims.head_chunk), lambda t, s, *_: (0, hc(t, s))),
        pl.BlockSpec((1, dims.head_chunk), lambda t, s, *_: (0, hc(t, s))),
        pl.BlockSpec((8, vp), const2),
        pl.BlockSpec((1, rows, 128), lambda t, s, *_: (t, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # embed stays in HBM
        pl.BlockSpec((1, B, 3, dims.conv_dim), state_ix4),
        pl.BlockSpec((1, dims.d_inner, bn), state_ix),
        pl.BlockSpec((rows, 128), const2),
        pl.BlockSpec((rows, 128), const2),
        pl.BlockSpec((rows, 128), const2),
        pl.BlockSpec((rows, vp), const2),
        pl.BlockSpec((rows, ring), const2),
        pl.BlockSpec((rows, ring), const2),
        pl.BlockSpec((rows, 128), const2),
    ]
    operands = [
        dp["w_in"], dp["w_out"], dp["conv_w"], dp["conv_b"], dp["dt_bias"],
        dp["a_e"], dp["d_e"], dp["e_mat"], dp["norm_w"], dp["ln"],
        dp["lm_w"], dp["lm_b"][None, :], dp["gram8"],
        uniforms,
        jnp.pad(
            dp["embed"], ((0, vp - dp["embed"].shape[0]), (0, 0))
        ).reshape(vp // 8, 8, dims.d_model),
        conv_state, ssm_state,
        init_cand_p, init_cidx_p, init_last_p, init_hist,
        init_ring_tok, init_ring_c, init_meta,
    ]
    if quant != "none":
        g_in = dp["w_in_s"].shape[-2]
        g_out = dp["w_out_s"].shape[-2]
        g_lm = dp["lm_s"].shape[-2]
        in_specs += [
            pl.BlockSpec((1, g_in, dims.d_in_pad), lambda t, s, *_: (lc(t, s), 0, 0)),
            pl.BlockSpec((1, g_out, dims.d_model), lambda t, s, *_: (lc(t, s), 0, 0)),
            pl.BlockSpec((g_lm, dims.head_chunk), lambda t, s, *_: (0, hc(t, s))),
        ]
        operands += [dp["w_in_s"], dp["w_out_s"], dp["lm_s"]]

    last_t = num_tokens - 1

    def out_state_ix(t, s, *_):
        # Pin to block 0 until the last token row: the buffer is only
        # copied back to HBM when this index CHANGES, so intermediate
        # states never touch HBM; on t == T-1 the map walks the layers.
        return jnp.where(t == last_t, jnp.minimum(s, L - 1), 0)

    out_specs = [
        pl.BlockSpec((rows, 128), lambda t, s, *_: (0, t // 128)),
        pl.BlockSpec(
            (1, B, 3, dims.conv_dim), lambda t, s, *_: (out_state_ix(t, s), 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, dims.d_inner, bn), lambda t, s, *_: (out_state_ix(t, s), 0, 0)
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, n_pad), jnp.int32),
        jax.ShapeDtypeStruct(conv_state.shape, jnp.float32),
        jax.ShapeDtypeStruct(ssm_state.shape, jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((rows, dims.d_model), jnp.float32),  # x
        pltpu.VMEM((rows, vp), jnp.float32),  # logits
        pltpu.VMEM((rows, 128), jnp.float32),  # cand vals
        pltpu.VMEM((rows, 128), jnp.int32),  # cand idxs
        pltpu.VMEM((rows, 128), jnp.int32),  # last token
        pltpu.VMEM((rows, vp), jnp.float32),  # hist
        pltpu.VMEM((rows, ring), jnp.int32),  # ring tok
        pltpu.VMEM((rows, ring), jnp.int32),  # ring c
        pltpu.VMEM((rows, 128), jnp.int32),  # start/head/wsum
        pltpu.VMEM((L, B, 3, dims.conv_dim), jnp.float32),
        pltpu.VMEM((L, dims.d_inner, bn), jnp.float32),
        pltpu.VMEM((8, dims.d_model), jnp.float32),  # embedding landing pad
        pltpu.SemaphoreType.DMA,
    ]
    kernel = functools.partial(
        _generate_kernel, dims=dims, quant=quant, greedy=greedy, ring=ring
    )
    toks, conv_f, ssm_f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return toks[:B, :num_tokens], conv_f, ssm_f


def generate_resident(
    dp: dict,
    init_logits: jax.Array,  # (B, V) prefill logits at the last prompt pos
    init_model_state: Any,  # stacked (conv, ssm)
    prompt: jax.Array,  # (B, P) i32
    num_tokens: int,
    model_cfg: MambaConfig,
    dims: DecodeDims,
    rng: jax.Array,
    greedy: bool = False,
    interpret: bool = False,
    quant: str = "bf16",
    ring: int = 2048,
) -> jax.Array:
    """Drop-in for sample_tokens_fused_tail running the WHOLE loop in one
    kernel. Returns (B, P + num_tokens) streams (prompt prepended)."""
    from ..sample.sampler import (
        _iter_top_k,
        filtered_logits,
        init_penalty_state,
        penalty_divisor,
    )

    conv_state, ssm_state = init_model_state
    last0 = prompt[:, -1]
    pen0 = init_penalty_state(prompt, ring, VOCAB)
    w0 = filtered_logits(last0, init_logits, VOCAB)
    w0 = w0 / penalty_divisor(pen0.hist, VOCAB)
    vals0, idxs0 = _iter_top_k(w0, 3)
    toks, _, _ = fused_generate(
        dp, vals0, idxs0, last0, conv_state, ssm_state,
        pen0.hist, pen0.ring_tok, pen0.ring_c, pen0.start, pen0.head,
        pen0.wsum, rng, dims, num_tokens,
        greedy=greedy, interpret=interpret,
        quant_mode="w8a16" if quant == "int8w" else "w8a8", ring=ring,
    )
    return jnp.concatenate([prompt, toks], axis=1)
