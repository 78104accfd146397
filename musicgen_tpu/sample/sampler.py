"""Grammar-constrained, repetition-penalized autoregressive sampler.

Reproduces the reference sampler's semantics (scripts/generate.py:14-95)
as a fully on-device `jax.lax.scan` over cached model state — replacing the
reference's per-token host loop, which re-forwards the whole 2048-token
window, walks the generated history in Python, and syncs device->host for
every sequence at every token (the O(T^2) + sync bottleneck that caps it at
~26 tok/s; BASELINE.md).

Per generated token (reference logic, in order):
  1. w = filtered_logits(prev, logits)[:, -1]      (grammar weighting; the
     positive -log_softmax * mask values ARE the sampling weights)
  2. Repetition penalty over the "recent" window: the token suffix after the
     last position where cumulative time-delta ticks reach 64*16 = 1024
     (generate.py:36-45). Counts c of each token id in the window divide w:
     pitch tokens by min(1.01^c, 1.2), dynamic tokens by min(1.02^c, 1.2)
     (generate.py:59-71).
  3. Per-field random top-k: prev in tempo -> k ~ {1,1,1,2,2};
     dyn -> {1,3}; pitch -> {1,2}; length/time -> 1 (generate.py:47-56).
  4. top-k renormalize + multinomial (generate.py:76-81). greedy=True forces
     k=1 (deterministic argmax — the bit-exactness vehicle, SURVEY.md §7).

The penalty window is maintained incrementally with a ring buffer + two
pointers (O(1) amortized per token, exact vs the reference's backward walk
for windows up to `ring_size` tokens).
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import VOCAB, VocabLayout
from ..ops.grammar import field_bucket, filtered_logits

WINDOW_TICKS = 64 * 16  # generate.py:42


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_tokens: int = 1000
    ring_size: int = 2048
    greedy: bool = False
    max_topk: int = 3
    # lax.scan unroll factor: >1 amortizes per-step dispatch overhead (the
    # decode loop is latency-bound, DEV_NOTES.md) at the cost of compile time.
    unroll: int = 1
    # Sampling mode, matching the three reference generation entry points:
    #   'combined' — tick-window penalty + per-field random top-k multinomial
    #                (scripts/generate.py:14-95, the primary sampler)
    #   'many'     — 100-token count-penalty table + argmax
    #                (scripts/generate_midi_many.py:13-56)
    #   'top5'     — plain top-5 renormalized multinomial, no penalty
    #                (scripts/generate_midi.py:34-62)
    mode: str = "combined"


COUNT_WINDOW = 100  # generate_midi_many.py:26 (`generated[-100:]`)


class CountWindowState(NamedTuple):
    """Fixed 100-token repetition window (generate_midi_many.py:25-48)."""

    hist: jax.Array  # (B, V) int32 counts over the last <=100 stream tokens
    ring: jax.Array  # (B, 100) int32 tokens by stream_idx % 100
    head: jax.Array  # () int32: stream length so far (shared across batch)


def init_count_window(
    prompt: jax.Array, layout: VocabLayout = VOCAB
) -> CountWindowState:
    """Counts over the last <=100 prompt tokens (the reference seeds
    `generated` with the full prompt before the loop, so the first step's
    window is the prompt tail)."""
    b, p = prompt.shape
    v = layout.vocab_size
    n_keep = min(p, COUNT_WINDOW)
    tail = prompt[:, -n_keep:]
    hist = jax.vmap(
        lambda toks: jnp.zeros((v,), jnp.int32).at[toks].add(1)
    )(tail)
    ring = jnp.zeros((b, COUNT_WINDOW), jnp.int32)
    slots = jnp.mod(jnp.arange(p - n_keep, p), COUNT_WINDOW)
    ring = ring.at[:, slots].set(tail)
    return CountWindowState(hist, ring, jnp.int32(p))


def push_count_window(
    state: CountWindowState, token: jax.Array
) -> CountWindowState:
    """Append token (B,); evict the token falling out of the 100-window."""
    b = token.shape[0]
    rows = jnp.arange(b)
    slot = jnp.mod(state.head, COUNT_WINDOW)
    evict = state.ring[:, slot]
    full = state.head >= COUNT_WINDOW
    hist = state.hist.at[rows, evict].add(jnp.where(full, -1, 0))
    hist = hist.at[rows, token].add(1)
    ring = state.ring.at[:, slot].set(token)
    return CountWindowState(hist, ring, state.head + 1)


def count_penalty_divisor(
    hist: jax.Array, layout: VocabLayout = VOCAB
) -> jax.Array:
    """(B, V) divisors from 100-window counts (generate_midi_many.py:28-48).

    Per token class, with c = window count:
      pitch  -> min(1.04^c, 1.25)
      dyn    -> 1 (skipped)
      length -> min(1.015^c, 1.08)
      time   -> 1.1*c if c >= 10 else 1
      tempo  -> 1 (skipped)
    """
    ids = jnp.arange(layout.vocab_size)
    c = hist.astype(jnp.float32)
    pitch_pen = jnp.minimum(jnp.float32(1.04) ** c, 1.25)
    length_pen = jnp.minimum(jnp.float32(1.015) ** c, 1.08)
    time_pen = jnp.where(c >= 10, 1.1 * c, 1.0)
    is_pitch = ids < layout.dyn_start
    is_length = (ids >= layout.length_start) & (ids < layout.time_start)
    is_time = (ids >= layout.time_start) & (ids < layout.tempo_start)
    div = jnp.where(is_pitch[None, :], pitch_pen, 1.0)
    div = jnp.where(is_length[None, :], length_pen, div)
    div = jnp.where(is_time[None, :], time_pen, div)
    return div


class PenaltyState(NamedTuple):
    """Ring-buffered repetition-penalty window (per batch element)."""

    hist: jax.Array  # (B, V) int32 counts over the current window
    ring_tok: jax.Array  # (B, W) int32 stream tokens by stream_idx % W
    ring_c: jax.Array  # (B, W) int32 time-tick contribution of each token
    start: jax.Array  # (B,) int32 stream index of the window start
    head: jax.Array  # (B,) int32 stream index AFTER the newest token
    wsum: jax.Array  # (B,) int32 sum of contributions in [start, head)


def _contribution(tokens: jax.Array, layout: VocabLayout = VOCAB) -> jax.Array:
    """Time-delta tick value of a token (0 for non-time tokens)."""
    is_time = (tokens >= layout.time_start) & (tokens < layout.tempo_start)
    return jnp.where(is_time, tokens - layout.time_start, 0).astype(jnp.int32)


def init_penalty_state(
    prompt: jax.Array, ring_size: int, layout: VocabLayout = VOCAB
) -> PenaltyState:
    """Vectorized construction of the window state over the prompt.

    Mirrors the reference's backward walk (generate.py:36-45): the window
    starts after the LAST index t* whose suffix tick-sum reaches 1024; when
    no suffix reaches it, the first token is still excluded.
    """
    b, p = prompt.shape
    v = layout.vocab_size
    c = _contribution(prompt, layout)  # (B, P)
    # suffix[i] = sum(c[i:])
    suffix = jnp.cumsum(c[:, ::-1], axis=1)[:, ::-1]
    qualifies = suffix >= WINDOW_TICKS
    idx = jnp.arange(p)
    t_star = jnp.max(jnp.where(qualifies, idx, -1), axis=1)  # (B,), -1 if none
    start = jnp.maximum(t_star + 1, 1)  # reference always drops token 0
    start = jnp.maximum(start, p - ring_size + 1)  # ring capacity guard

    in_window = idx[None, :] >= start[:, None]
    hist = jax.vmap(
        lambda toks, m: jnp.zeros((v,), jnp.int32).at[toks].add(m.astype(jnp.int32))
    )(prompt, in_window)

    w = ring_size
    ring_tok = jnp.zeros((b, w), jnp.int32)
    ring_c = jnp.zeros((b, w), jnp.int32)
    n_keep = min(p, w)
    tail_tokens = prompt[:, -n_keep:]
    tail_c = c[:, -n_keep:]
    slots = jnp.mod(jnp.arange(p - n_keep, p), w)
    ring_tok = ring_tok.at[:, slots].set(tail_tokens)
    ring_c = ring_c.at[:, slots].set(tail_c)

    wsum = jnp.sum(jnp.where(in_window, c, 0), axis=1).astype(jnp.int32)
    head = jnp.full((b,), p, jnp.int32)
    return PenaltyState(hist, ring_tok, ring_c, start.astype(jnp.int32), head, wsum)


def push_token(
    state: PenaltyState, token: jax.Array, layout: VocabLayout = VOCAB
) -> PenaltyState:
    """Append `token` (B,) to the window and advance the start pointer."""
    w = state.ring_tok.shape[1]
    b = token.shape[0]
    c_new = _contribution(token, layout)
    slot = jnp.mod(state.head, w)
    ring_tok = state.ring_tok.at[jnp.arange(b), slot].set(token)
    ring_c = state.ring_c.at[jnp.arange(b), slot].set(c_new)
    hist = state.hist.at[jnp.arange(b), token].add(1)
    wsum = state.wsum + c_new
    head = state.head + 1

    def cond(carry):
        hist, start, wsum = carry
        return jnp.any(wsum >= WINDOW_TICKS)

    def body(carry):
        hist, start, wsum = carry
        advance = wsum >= WINDOW_TICKS
        sslot = jnp.mod(start, w)
        evict_tok = ring_tok[jnp.arange(b), sslot]
        evict_c = ring_c[jnp.arange(b), sslot]
        hist = hist.at[jnp.arange(b), evict_tok].add(
            jnp.where(advance, -1, 0)
        )
        wsum = jnp.where(advance, wsum - evict_c, wsum)
        start = jnp.where(advance, start + 1, start)
        return hist, start, wsum

    hist, start, wsum = jax.lax.while_loop(
        cond, body, (hist, state.start, wsum)
    )
    return PenaltyState(hist, ring_tok, ring_c, start, head, wsum)


def penalty_divisor(
    hist: jax.Array, layout: VocabLayout = VOCAB
) -> jax.Array:
    """(B, V) divisors from window counts (generate.py:59-71)."""
    v = layout.vocab_size
    ids = jnp.arange(v)
    base = jnp.where(
        ids < layout.dyn_start,
        jnp.float32(1.01),  # pitch tokens
        jnp.where(ids < layout.length_start, jnp.float32(1.02), jnp.float32(1.0)),
    )
    pen = jnp.minimum(base[None, :] ** hist.astype(jnp.float32), 1.2)
    return jnp.where(base[None, :] > 1.0, pen, 1.0)


def _sample_k(prev: jax.Array, key: jax.Array, layout: VocabLayout = VOCAB):
    """Per-field random top-k (generate.py:47-56). Returns (B,) int32 in 1..3."""
    bucket = field_bucket(prev, layout)  # 0 pitch,1 dyn,2 len,3 time,4 tempo
    # Choice tables as probabilities over k in {1,2,3}.
    table = jnp.asarray(
        [
            [0.5, 0.5, 0.0],  # prev pitch: {1,2}
            [0.5, 0.0, 0.5],  # prev dyn: {1,3}
            [1.0, 0.0, 0.0],  # prev length: 1
            [1.0, 0.0, 0.0],  # prev time: 1
            [0.6, 0.4, 0.0],  # prev tempo: {1,1,1,2,2}
        ],
        jnp.float32,
    )
    probs = table[bucket]  # (B, 3)
    choice = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
    return (choice + 1).astype(jnp.int32)


def _pick_from_topk(
    vals: jax.Array,  # (B, K)
    idxs: jax.Array,  # (B, K)
    k: jax.Array,  # (B,)
    key: jax.Array,
    greedy: bool,
) -> jax.Array:
    if greedy:
        return idxs[:, 0].astype(jnp.int32)
    mask = jnp.arange(vals.shape[1])[None, :] < k[:, None]
    probs = jnp.where(mask, vals, 0.0)
    choice = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
    return jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0].astype(jnp.int32)


def _iter_top_k(w: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via k argmax+mask passes.

    For the tiny k used here (<=5) this is much faster on TPU than
    jax.lax.top_k's sort-based lowering over the 17914-wide vocab (the
    dominant cost of the XLA sampler tail, BENCHMARKS.md). Ties resolve to
    the lowest index first, matching top_k's ordering."""
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(w, axis=-1)  # (B,) first-lowest on ties
        v = jnp.take_along_axis(w, i[:, None], axis=1)[:, 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        w = jnp.where(
            jnp.arange(w.shape[-1])[None, :] == i[:, None], -jnp.inf, w
        )
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _pick_next(
    w: jax.Array,  # (B, V) nonneg sampling weights
    k: jax.Array,  # (B,) in 1..max_topk
    key: jax.Array,
    max_topk: int,
    greedy: bool,
) -> jax.Array:
    if greedy:
        return jnp.argmax(w, axis=-1).astype(jnp.int32)
    vals, idxs = _iter_top_k(w, max_topk)  # (B, K)
    mask = jnp.arange(max_topk)[None, :] < k[:, None]
    probs = jnp.where(mask, vals, 0.0)
    logits = jnp.log(probs + 1e-30)
    choice = jax.random.categorical(key, logits, axis=-1)  # (B,)
    return jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Main sampling loop
# ---------------------------------------------------------------------------

StepFn = Callable[[Any, jax.Array, Any, jax.Array], Tuple[jax.Array, Any]]
# step_fn(params, token (B,), model_state, stream_idx) -> (logits (B,V), state)


def sample_tokens(
    step_fn: StepFn,
    params: Any,
    init_logits: jax.Array,  # (B, V) logits predicting the first new token
    init_model_state: Any,
    prompt: jax.Array,  # (B, P) int32
    cfg: SamplerConfig,
    rng: jax.Array,
    layout: VocabLayout = VOCAB,
) -> jax.Array:
    """Generate cfg.num_tokens tokens. Returns (B, num_tokens) int32.

    `init_logits` are the model's logits at the last prompt position (from
    prefill); `step_fn` advances the cached model by one token.
    """
    b, p = prompt.shape
    last0 = prompt[:, -1]
    if cfg.mode == "many":
        pen0 = init_count_window(prompt, layout)
    else:
        pen0 = init_penalty_state(prompt, cfg.ring_size, layout)

    def body(carry, step_key):
        logits, model_state, pen, last, stream_idx = carry
        k_key, pick_key = jax.random.split(step_key)
        if cfg.mode == "many":
            w = filtered_logits(last, logits, layout)
            w = w / count_penalty_divisor(pen.hist, layout)
            next_tok = jnp.argmax(w, axis=-1).astype(jnp.int32)
            pen = push_count_window(pen, next_tok)
        elif cfg.mode == "top5":
            w = filtered_logits(last, logits, layout)
            k = jnp.full((b,), 5, jnp.int32)
            next_tok = _pick_next(w, k, pick_key, 5, cfg.greedy)
            # no repetition penalty in this mode; window state left untouched
        else:
            k = _sample_k(last, k_key, layout)
            w = filtered_logits(last, logits, layout)  # (B, V)
            w = w / penalty_divisor(pen.hist, layout)
            next_tok = _pick_next(w, k, pick_key, cfg.max_topk, cfg.greedy)
            pen = push_token(pen, next_tok, layout)
        logits, model_state = step_fn(params, next_tok, model_state, stream_idx)
        return (
            (logits, model_state, pen, next_tok, stream_idx + 1),
            next_tok,
        )

    keys = jax.random.split(rng, cfg.num_tokens)
    carry0 = (init_logits, init_model_state, pen0, last0, jnp.int32(p))
    _, toks = jax.lax.scan(body, carry0, keys, unroll=cfg.unroll)
    return toks.transpose(1, 0)  # (B, num_tokens)


def sample_tokens_fused_tail(
    dp: Any,  # packed params from ops.pallas_decode.build_decode_params
    init_logits: jax.Array,  # (B, V) logits at the last prompt position
    init_model_state: Any,  # stacked (conv, ssm) states
    prompt: jax.Array,  # (B, P) int32
    cfg: SamplerConfig,
    rng: jax.Array,
    model_cfg,
    dims,
    layout: VocabLayout = VOCAB,
    interpret: bool = False,
    quant: str = "bf16",
    fused_step=None,
) -> jax.Array:
    """'combined'-mode sampling with the grammar/penalty/top-3 tail fused
    INTO the decode kernel (ops/pallas_decode fused_sample_step, or
    `fused_step` for other model families — ops/pallas_xlstm_decode): the
    (B, 17914) logits never leave VMEM. XLA keeps only the O(3) categorical
    pick, the k-choice, and the penalty-window bookkeeping.

    Matches `sample_tokens(mode='combined')` semantics (same RNG stream,
    same tie-breaking; logits at Pallas-kernel tolerance)."""
    if fused_step is None:
        from ..ops.pallas_decode import fused_sample_step

        def fused_step(pack, token, state, hist, bucket_oh, stream_idx):
            return fused_sample_step(
                pack, token, state, hist, bucket_oh, model_cfg, dims,
                interpret=interpret,
                quant_mode="w8a16" if quant == "int8w" else "w8a8",
            )

    # The in-kernel tail computes exactly 3 candidates (top-3 argmax
    # passes); a larger max_topk would silently truncate the candidate set
    # relative to sample_tokens(mode='combined').
    assert cfg.max_topk <= 3, (
        f"fused tail hard-codes top-3; got max_topk={cfg.max_topk}"
    )
    b, p = prompt.shape
    last0 = prompt[:, -1]
    pen0 = init_penalty_state(prompt, cfg.ring_size, layout)
    # First pick comes from prefill logits via the XLA tail (one step).
    w0 = filtered_logits(last0, init_logits, layout)
    w0 = w0 / penalty_divisor(pen0.hist, layout)
    vals0, idxs0 = _iter_top_k(w0, 3)

    def body(carry, step_key):
        vals, idxs, model_state, pen, last, stream_idx = carry
        k_key, pick_key = jax.random.split(step_key)
        k = _sample_k(last, k_key, layout)
        next_tok = _pick_from_topk(vals, idxs, k, pick_key, cfg.greedy)
        pen = push_token(pen, next_tok, layout)
        bucket_oh = jax.nn.one_hot(field_bucket(next_tok, layout), 8)
        vals, idxs, model_state = fused_step(
            dp, next_tok, model_state, pen.hist, bucket_oh, stream_idx
        )
        return (
            (vals, idxs, model_state, pen, next_tok, stream_idx + 1),
            next_tok,
        )

    keys = jax.random.split(rng, cfg.num_tokens)
    carry0 = (vals0, idxs0, init_model_state, pen0, last0, jnp.int32(p))
    _, toks = jax.lax.scan(body, carry0, keys, unroll=cfg.unroll)
    return toks.transpose(1, 0)  # (B, num_tokens)


# ---------------------------------------------------------------------------
# Model adapters
# ---------------------------------------------------------------------------

def make_sampler(
    model,
    kind: str,
    block_len: int,
    fused_decode: bool = False,
    cfg=None,
    batch: int | None = None,
    interpret: bool = False,
    quant: str = "bf16",
    state_bf16: bool = False,
):
    """Returns (prefill_fn, step_fn) for `sample_tokens`.

    kind: 'transformer' | 'mamba' | 'xlstm'. The transformer step threads the
    ring-KV geometry (sample.cache); recurrent models carry pure state.

    fused_decode=True (mamba only) routes the step through the fused
    multi-layer Pallas kernel (ops/pallas_decode). The step_fn then expects
    the PACKED params from `build_decode_params` (same quant) as its params
    argument (build once, outside the scan); prefill still takes the flax
    params. Requires cfg (the MambaConfig) and batch. quant='int8' selects
    the W8A8 variant (halved HBM stream, ~8-bit logit noise).

    Params are EXPLICIT arguments (not closed over): closed-over arrays get
    inlined as dense HLO constants, which breaks this environment's
    size-limited remote-compile path and bloats compile time.
    """
    from .cache import step_geometry, token_slot  # local import, no cycle

    if kind == "transformer":
        from ..models.transformer import TransformerLM

        if fused_decode:
            # Full-window steady-state kernel (ops/pallas_transformer_decode):
            # generate() gates on prompt_len == block_len == cfg.block_len.
            assert cfg is not None and batch is not None
            from ..ops.pallas_transformer_decode import (
                TDims,
                build_transformer_decode_params,
                fused_transformer_logits_step,
                stack_transformer_cache,
            )

            tdims = TDims.create(cfg, batch)

            def prefill(params, tokens, meta):
                logits, caches = model.apply(
                    params, tokens, meta, method=TransformerLM.prefill
                )
                return logits[:, -1, :], stack_transformer_cache(caches, tdims)

            def step(tp, token, carry, stream_idx):
                return fused_transformer_logits_step(
                    tp, token, carry, cfg, tdims, stream_idx,
                    interpret=interpret, quant=quant,
                )

            return prefill, step

        def prefill(params, tokens, meta):
            logits, caches = model.apply(
                params, tokens, meta, method=TransformerLM.prefill
            )
            return logits[:, -1, :], caches

        # The physical KV cache is padded to the MODEL's trained context
        # (cfg.seq_len); when sampling with a shorter window (--block-len,
        # the reference's generate_midi_testing study) the ring spans only
        # block_len+6 slots — mask the rest with age -1.
        phys_slots = model.cfg.seq_len

        def step(params, token, caches, stream_idx):
            total = stream_idx + 1
            ages, rel_base = step_geometry(total, block_len)
            if ages.shape[0] < phys_slots:
                ages = jnp.pad(
                    ages, (0, phys_slots - ages.shape[0]), constant_values=-1
                )
            slot = token_slot(stream_idx, block_len)
            return model.apply(
                params, token, caches, slot, ages, rel_base,
                method=TransformerLM.step,
            )

        return prefill, step

    if kind == "mamba":
        from ..models.mamba import MambaLM

        if fused_decode:
            assert cfg is not None and batch is not None
            from ..ops.pallas_decode import (
                DecodeDims,
                fused_logits_step,
                stack_states,
            )

            dims = DecodeDims.create(cfg, batch)

            def prefill(params, tokens, meta):
                logits, states = model.apply(
                    params, tokens, meta, method=MambaLM.prefill
                )
                return logits[:, -1, :], stack_states(states)

            qmode = "w8a16" if quant == "int8w" else "w8a8"

            def step(dp, token, carry, stream_idx):
                return fused_logits_step(
                    dp, token, carry, cfg, dims, interpret=interpret,
                    quant_mode=qmode,
                )

            return prefill, step

        def prefill(params, tokens, meta):
            logits, states = model.apply(params, tokens, meta, method=MambaLM.prefill)
            return logits[:, -1, :], states

        def step(params, token, states, stream_idx):
            return model.apply(params, token, states, method=MambaLM.step)

        return prefill, step

    if kind == "xlstm":
        from ..models.xlstm import XLSTMLM

        if fused_decode:
            assert cfg is not None and batch is not None
            from ..ops.pallas_xlstm_decode import (
                XDims,
                fused_xlstm_logits_step,
                stack_xlstm_states,
            )

            xdims = XDims.create(cfg, batch)

            def prefill(params, tokens, meta):
                logits, states = model.apply(
                    params, tokens, meta, method=XLSTMLM.prefill
                )
                return logits[:, -1, :], stack_xlstm_states(
                    states, cfg, batch,
                    state_dtype=jnp.bfloat16 if state_bf16 else jnp.float32,
                )

            def step(wp, token, carry, stream_idx):
                return fused_xlstm_logits_step(
                    wp, token, carry, cfg, xdims, interpret=interpret
                )

            return prefill, step

        def prefill(params, tokens, meta):
            logits, states = model.apply(params, tokens, meta, method=XLSTMLM.prefill)
            return logits[:, -1, :], states

        def step(params, token, states, stream_idx):
            return model.apply(params, token, states, method=XLSTMLM.step)

        return prefill, step

    raise ValueError(f"unknown model kind: {kind}")


def generate(
    model,
    params,
    kind: str,
    prompt: jax.Array,
    meta: jax.Array,
    num_tokens: int,
    block_len: int,
    rng: jax.Array,
    greedy: bool = False,
    jit: bool = True,
    mode: str = "combined",
    fused: bool | None = None,
    quant: str = "bf16",
    resident: bool = False,
    decode_pack: Any = None,
) -> jax.Array:
    """End-to-end conditioned generation (reference scripts/generate.py
    `generate` equivalent). Returns (B, P + num_tokens) full streams.

    decode_pack: a prebuilt fused-kernel param pack (the matching model
    family's build_*_decode_params output) used instead of packing inside
    the jitted runner — required for packs that cannot be built under
    tracing, e.g. GPTQ-calibrated int8 (ops/gptq.py: host-side solver).

    fused=None auto-selects the fused multi-layer Pallas decode kernel
    (ops/pallas_decode) for Mamba on accelerators (with the sampler tail
    fused in-kernel for mode='combined'); quant='int8' additionally selects
    the W8A8 weight-quantized variant (~2x decode, ~8-bit logit noise).
    For xLSTM, quant may carry an '-sb16' suffix ('bf16-sb16',
    'int8w-sb16'): the mLSTM matrix memory is STORED bf16 (f32 math),
    halving its ~113 MB/token HBM stream — the dominant term once weights
    are int8.
    resident=True (mamba, mode='combined') runs the ENTIRE token loop in
    one pallas_call with all recurrent + sampler state VMEM-resident
    (ops/pallas_generate): per-token HBM traffic is the weight stream only.
    Greedy streams are identical to the fused-tail path; stochastic picks
    use CDF inversion on streamed uniforms (same distributions, different
    stream than jax.random.categorical).

    The jitted runner is cached on (model, shapes, sampling options), so
    repeated calls — e.g. the CLI's per-composer loop — compile once."""
    # quant may carry an '-sb16' suffix (xLSTM only): store the mLSTM
    # matrix memory bf16, halving its ~113 MB/token HBM stream
    # (ops/pallas_xlstm_decode docstring). Math stays f32 in-kernel.
    state_bf16 = False
    if quant.endswith("-sb16"):
        assert kind == "xlstm", "'-sb16' state storage is an xLSTM option"
        state_bf16, quant = True, quant[: -len("-sb16")]
    auto_fused = fused is None
    if fused is None:
        # Auto-select only configs where the kernels WIN: the mamba kernel
        # bakes in the reference's no-residual stack (DecodeDims.create
        # asserts; residual=True configs take the XLA step path). xLSTM is
        # fused only for int8-weight decode — at bf16 the step is bound by
        # the 345 MB/token weight+matrix-state stream and the XLA loop
        # already runs at ~96% of the HBM roofline (2,278 vs 2,032 tok/s/seq
        # fused; experiments/bench_xlstm_sampling.py), so fusion only pays
        # when it halves the weight bytes.
        fused = jax.default_backend() != "cpu" and (
            (
                kind == "mamba"
                and not getattr(getattr(model, "cfg", None), "residual", False)
            )
            # The xLSTM kernel pays only when it halves the weight bytes
            # (int8w): at bf16 its XLA step loop already runs at ~96% of the
            # HBM roofline (2,262 vs 2,031 tok/s/seq fused). The transformer
            # kernel wins at bf16 too (1,536 vs 1,415; KV-cache reads ride
            # the fused weight stream) — BENCHMARKS.md round-3 table.
            or (kind == "xlstm" and (quant in ("int8", "int8w") or state_bf16))
            or kind == "transformer"
        )
    fused = fused and kind in ("mamba", "xlstm", "transformer")
    if kind in ("xlstm", "transformer") and quant == "int8":
        quant = "int8w"  # these kernels implement W8A16 only
    if kind == "transformer" and fused:
        # The fused kernel is the steady-state (window always full) program:
        # it needs a full-window prompt and the model's trained ring size.
        mc = getattr(model, "cfg", None)
        fused = (
            mc is not None
            and block_len == mc.block_len
            and int(prompt.shape[1]) == block_len
        )
    if auto_fused and fused and kind in ("xlstm", "transformer"):
        # VMEM admission (VERDICT r4 weak #2): the fused kernels hold one
        # double-buffered persistent window per operand, and the B-scaling
        # operands (transformer ring KV, xLSTM mLSTM matrix memory) blow the
        # ~128 MiB chip VMEM at batch >= 3-4 — a COMPILE-TIME Mosaic OOM
        # that used to hard-crash the CLI (experiments/r4/
        # fidelity_transformer.log). The serve scheduler got this gate in
        # round 4 (serve/scheduler.py:504); this is the second call site.
        # Explicit fused=True bypasses the estimate entirely (trust the
        # caller); the runtime fallback below still catches the OOM.
        mc = getattr(model, "cfg", None)
        if mc is not None:
            if kind == "transformer":
                from ..ops.pallas_transformer_decode import fused_vmem_fits

                fused = fused_vmem_fits(
                    params, mc, int(prompt.shape[0]), quant,
                    tail=(mode == "combined"),
                )
            else:
                from ..ops.pallas_xlstm_decode import fused_vmem_fits

                fused = fused_vmem_fits(
                    params, mc, int(prompt.shape[0]), quant,
                    state_dtype=jnp.bfloat16 if state_bf16 else jnp.float32,
                    tail=(mode == "combined"),
                )
    resident = resident and kind == "mamba" and mode == "combined"
    if resident:
        fused = True
    if decode_pack is not None:
        assert fused, "decode_pack requires the fused decode path"

    def _run(fused_now):
        run = _make_generate_runner(
            model, kind, int(prompt.shape[0]), num_tokens, block_len,
            greedy, mode, fused_now, quant, jit, resident and fused_now,
            has_pack=decode_pack is not None, state_bf16=state_bf16,
        )
        if decode_pack is not None:
            return run(params, prompt, meta, rng, decode_pack)
        return run(params, prompt, meta, rng)

    if not (auto_fused and fused):
        return _run(fused)
    try:
        return _run(True)
    except Exception as e:  # noqa: BLE001 — gated on the OOM signature
        msg = str(e)
        oom = (
            "memory space vmem" in msg
            or "Ran out of memory" in msg
            or "RESOURCE_EXHAUSTED" in msg
        )
        if not oom or decode_pack is not None:
            raise
        # The admission estimate was wrong (it carries ~15% slack but
        # Mosaic's allocator is the ground truth). Auto-selected fused
        # paths degrade to the XLA step loop instead of crashing — same
        # recovery as serve.BatchScheduler._run_chunk.
        warnings.warn(
            f"fused decode kernel exceeded VMEM at batch "
            f"{int(prompt.shape[0])}; falling back to the XLA step path "
            f"({msg:.200s})"
        )
        return _run(False)


@functools.lru_cache(maxsize=64)
def _make_generate_runner(
    model, kind, batch, num_tokens, block_len, greedy, mode, fused, quant,
    jit, resident=False, has_pack=False, state_bf16=False,
):
    """Build (and cache) the jitted end-to-end generation function.

    flax Modules are frozen dataclasses, so `model` is a valid cache key;
    jax.jit then caches traces per (param/prompt shapes)."""
    model_cfg = getattr(model, "cfg", None)
    interp = jax.default_backend() == "cpu"
    prefill, step = make_sampler(
        model, kind, block_len,
        fused_decode=fused, cfg=model_cfg, batch=batch,
        interpret=interp, quant=quant, state_bf16=state_bf16,
    )
    cfg = SamplerConfig(num_tokens=num_tokens, ring_size=max(block_len, 2048),
                        greedy=greedy, mode=mode)

    # With the fused decode kernel, 'combined' mode also fuses the sampler
    # tail (grammar/penalty/top-3) into the kernel — same semantics, logits
    # never leave VMEM.
    fused_tail = fused and mode == "combined"

    def run(params, prompt, meta, rng, decode_pack=None):
        init_logits, state = prefill(params, prompt, meta)
        if fused and kind == "xlstm":
            from ..ops.pallas_xlstm_decode import (
                XDims,
                build_xlstm_decode_params,
                fused_xlstm_sample_step,
            )

            step_params = decode_pack if decode_pack is not None else (
                build_xlstm_decode_params(
                    params, model_cfg, prompt.shape[0], quant=quant
                )
            )
            if fused_tail:
                xdims = XDims.create(model_cfg, prompt.shape[0])

                def xlstm_step(pack, token, st, hist, bucket_oh, stream_idx):
                    return fused_xlstm_sample_step(
                        pack, token, st, hist, bucket_oh, model_cfg, xdims,
                        interpret=interp,
                    )

                toks = sample_tokens_fused_tail(
                    step_params, init_logits, state, prompt, cfg, rng,
                    model_cfg, xdims, interpret=interp, quant=quant,
                    fused_step=xlstm_step,
                )
                return jnp.concatenate([prompt, toks], axis=1)
        elif fused and kind == "transformer":
            from ..ops.pallas_transformer_decode import (
                TDims,
                build_transformer_decode_params,
                fused_transformer_sample_step,
            )

            step_params = decode_pack if decode_pack is not None else (
                build_transformer_decode_params(
                    params, model_cfg, prompt.shape[0], quant=quant
                )
            )
            if fused_tail:
                tdims = TDims.create(model_cfg, prompt.shape[0])

                def tf_step(pack, token, st, hist, bucket_oh, stream_idx):
                    return fused_transformer_sample_step(
                        pack, token, st, hist, bucket_oh, model_cfg, tdims,
                        stream_idx, interpret=interp, quant=quant,
                    )

                toks = sample_tokens_fused_tail(
                    step_params, init_logits, state, prompt, cfg, rng,
                    model_cfg, tdims, interpret=interp, quant=quant,
                    fused_step=tf_step,
                )
                return jnp.concatenate([prompt, toks], axis=1)
        elif fused:
            from ..ops.pallas_decode import DecodeDims, build_decode_params

            step_params = decode_pack if decode_pack is not None else (
                build_decode_params(
                    params, model_cfg, prompt.shape[0], quant=quant
                )
            )
            if resident:
                from ..ops.pallas_generate import generate_resident

                dims = DecodeDims.create(model_cfg, prompt.shape[0])
                return generate_resident(
                    step_params, init_logits, state, prompt, num_tokens,
                    model_cfg, dims, rng, greedy=greedy, interpret=interp,
                    quant=quant, ring=cfg.ring_size,
                )
            if fused_tail:
                dims = DecodeDims.create(model_cfg, prompt.shape[0])
                toks = sample_tokens_fused_tail(
                    step_params, init_logits, state, prompt, cfg, rng,
                    model_cfg, dims, interpret=interp, quant=quant,
                )
                return jnp.concatenate([prompt, toks], axis=1)
        else:
            step_params = params
        toks = sample_tokens(step, step_params, init_logits, state, prompt, cfg, rng)
        return jnp.concatenate([prompt, toks], axis=1)

    return jax.jit(run) if jit else run


def reference_windowed_generate(
    model,
    params,
    prompt: jax.Array,
    meta: jax.Array,
    num_tokens: int,
    block_len: int,
    rng: jax.Array,
    greedy: bool = True,
    layout: VocabLayout = VOCAB,
    mode: str = "combined",
) -> jax.Array:
    """Validation-mode sampler: full re-forward of the slid window per token,
    token-for-token the reference's semantics (scripts/generate.py:26-89;
    mode='many' -> generate_midi_many.py:13-56; 'top5' ->
    generate_midi.py:34-62) including window truncation. O(window) per
    token — use for parity checks, not production.

    Single compiled shape (VERDICT round-2 item 6): the window lives in a
    fixed (B, block_len) RIGHT-padded buffer — causal models cannot see
    positions >= n, so the logits at column n-1 equal the short-window
    forward — and the whole token loop is one `lax.scan`. Large windowed
    sweeps compile once instead of once per window length."""
    b, p = prompt.shape
    if mode == "many":
        pen0 = init_count_window(prompt, layout)
    else:
        pen0 = init_penalty_state(prompt, max(block_len, 2048), layout)

    if p >= block_len:
        buf0 = prompt[:, -block_len:]
        n0 = jnp.int32(block_len)
    else:
        buf0 = jnp.pad(prompt, ((0, 0), (0, block_len - p)))
        n0 = jnp.int32(p)

    def step(carry, key):
        buf, n, last, pen = carry
        logits_all = model.apply(params, buf, meta)  # (B, block_len, V)
        logits = jnp.take_along_axis(
            logits_all, jnp.full((b, 1, 1), n - 1), axis=1
        )[:, 0, :]
        w = filtered_logits(last, logits, layout)
        k_key, pick_key = jax.random.split(key)
        if mode == "many":
            w = w / count_penalty_divisor(pen.hist, layout)
            next_tok = jnp.argmax(w, axis=-1).astype(jnp.int32)
            pen = push_count_window(pen, next_tok)
        elif mode == "top5":
            k = jnp.full((b,), 5, jnp.int32)
            next_tok = _pick_next(w, k, pick_key, 5, greedy)
        else:
            w = w / penalty_divisor(pen.hist, layout)
            k = _sample_k(last, k_key, layout)
            next_tok = _pick_next(w, k, pick_key, 3, greedy)
            pen = push_token(pen, next_tok, layout)
        # Append into the fixed buffer: write at column n while filling,
        # slide-left-by-one and write the last column once full.
        full = n >= block_len
        slid = jnp.concatenate([buf[:, 1:], next_tok[:, None]], axis=1)
        grown = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_slice(row, t[None], (n,))
        )(buf, next_tok)
        buf = jnp.where(full, slid, grown)
        n = jnp.minimum(n + 1, block_len)
        return (buf, n, next_tok, pen), next_tok

    keys = jax.random.split(rng, num_tokens)
    last0 = prompt[:, -1]
    (_, _, _, _), toks = jax.lax.scan(step, (buf0, n0, last0, pen0), keys)
    return jnp.concatenate([prompt, toks.transpose(1, 0)], axis=1)
