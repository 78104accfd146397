"""Sampler tests: penalty-window semantics vs a literal reimplementation of
the reference's backward walk, grammar adherence of sampled streams, greedy
determinism, and cached-vs-reference-windowed equality for recurrent models
in the non-truncating regime."""
import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.grammar import field_bucket
from musicgen_tpu.sample.sampler import (
    SamplerConfig,
    WINDOW_TICKS,
    init_penalty_state,
    make_sampler,
    penalty_divisor,
    push_token,
    reference_windowed_generate,
    sample_tokens,
)

SMALL = MambaConfig(
    d_model=32, n_layers=2, d_state=8, d_conv=4, expand=2, headdim=8,
    chunk_size=8, vocab_size=VOCAB.vocab_size,
    metadata_vocab_size=9,
)


def _reference_window_counts(stream):
    """Literal reimplementation of generate.py:36-45 + Counter(recent)."""
    val = 0
    j = 0
    for j, token in enumerate(reversed(stream)):
        if VOCAB.time_start <= token < VOCAB.tempo_start:
            val += token - VOCAB.time_start
        if val >= WINDOW_TICKS:
            break
    recent = stream[-j:] if j > 0 else []
    counts = {}
    for t in recent:
        counts[t] = counts.get(t, 0) + 1
    return counts


def _random_stream(rng, n):
    """Realistic token stream: cycles pitch,dyn,len,(time),tempo."""
    out = []
    while len(out) < n:
        out.append(int(rng.integers(0, VOCAB.dyn_start)))
        out.append(int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)))
        out.append(int(rng.integers(VOCAB.length_start, VOCAB.time_start)))
        if rng.random() < 0.7:
            out.append(int(rng.integers(VOCAB.time_start, VOCAB.time_start + 64)))
        out.append(int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)))
    return out[:n]


def test_penalty_window_matches_reference_walk():
    rng = np.random.default_rng(0)
    stream = _random_stream(rng, 300)
    prompt = jnp.asarray([stream[:150]], jnp.int32)
    state = init_penalty_state(prompt, ring_size=2048)

    for tok in stream[150:]:
        # Compare BEFORE pushing: reference computes counts over the stream
        # so far at the moment of sampling.
        hist = np.asarray(state.hist[0])
        expected = _reference_window_counts(stream[: int(state.head[0])])
        got = {i: int(hist[i]) for i in np.nonzero(hist)[0]}
        assert got == expected, f"at head={int(state.head[0])}"
        state = push_token(state, jnp.asarray([tok], jnp.int32))


def test_penalty_divisor_values():
    hist = jnp.zeros((1, VOCAB.vocab_size), jnp.int32)
    hist = hist.at[0, 100].set(5)  # pitch token, 1.01^5
    hist = hist.at[0, VOCAB.dyn_start + 3].set(40)  # dyn token, capped
    hist = hist.at[0, VOCAB.length_start + 2].set(50)  # length: no penalty
    pen = np.asarray(penalty_divisor(hist))[0]
    assert np.isclose(pen[100], 1.01 ** 5)
    assert np.isclose(pen[VOCAB.dyn_start + 3], 1.2)  # min(1.02^40, 1.2)
    assert pen[VOCAB.length_start + 2] == 1.0
    assert pen[0] == 1.0


def _mamba_setup(prompt_len=24, batch=2):
    model = MambaLM(SMALL)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        np.array([_random_stream(rng, prompt_len) for _ in range(batch)]), jnp.int32
    )
    meta = jnp.asarray(rng.integers(0, SMALL.metadata_vocab_size, (batch, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)
    return model, params, prompt, meta


def test_greedy_sampling_deterministic_and_grammatical():
    model, params, prompt, meta = _mamba_setup()
    prefill, step = make_sampler(model, "mamba", block_len=64)
    cfg = SamplerConfig(num_tokens=40, greedy=True)

    init_logits, state = prefill(params, prompt, meta)
    toks1 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(1))
    init_logits, state = prefill(params, prompt, meta)
    toks2 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(2))
    # Greedy is deterministic: different RNG seeds give identical streams.
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))

    # Grammar adherence: each token's field follows the allowed transition
    # of its predecessor (pitch->dyn, dyn->len, len->time|tempo,
    # time->tempo, tempo->pitch).
    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    stream = np.concatenate([np.asarray(prompt), np.asarray(toks1)], axis=1)
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for b in range(stream.shape[0]):
        for t in range(prompt.shape[1], stream.shape[1]):
            prev_b, cur_b = buckets[b, t - 1], buckets[b, t]
            assert cur_b in allowed[prev_b], (
                f"batch {b} pos {t}: {prev_b} -> {cur_b}"
            )


def test_stochastic_sampling_reproducible_and_grammatical():
    model, params, prompt, meta = _mamba_setup()
    prefill, step = make_sampler(model, "mamba", block_len=64)
    cfg = SamplerConfig(num_tokens=30, greedy=False)
    init_logits, state = prefill(params, prompt, meta)
    t1 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(7))
    init_logits, state = prefill(params, prompt, meta)
    t2 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))  # same seed

    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    stream = np.concatenate([np.asarray(prompt), np.asarray(t1)], axis=1)
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for b in range(stream.shape[0]):
        for t in range(prompt.shape[1], stream.shape[1]):
            assert buckets[b, t] in allowed[buckets[b, t - 1]]


def test_cached_equals_reference_windowed_before_truncation():
    """For a recurrent model with the window longer than the total stream,
    the cached sampler and the reference re-forward sampler produce the
    IDENTICAL greedy token stream."""
    model, params, prompt, meta = _mamba_setup(prompt_len=16)
    n_new = 12
    block_len = 64  # window never truncates: 16 + 12 < 64

    prefill, step = make_sampler(model, "mamba", block_len=block_len)
    cfg = SamplerConfig(num_tokens=n_new, greedy=True)
    init_logits, state = prefill(params, prompt, meta)
    fast = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(0))
    fast_stream = np.concatenate([np.asarray(prompt), np.asarray(fast)], axis=1)

    ref_stream = np.asarray(
        reference_windowed_generate(
            model, params, prompt, meta, n_new, block_len, jax.random.PRNGKey(0),
            greedy=True,
        )
    )
    np.testing.assert_array_equal(fast_stream, ref_stream)


def test_transformer_sampling_across_ring_wraparound():
    """Generate past the window size with the transformer: the ring-KV slots
    wrap and evict; streams must stay deterministic and grammatical."""
    from musicgen_tpu.config import TransformerConfig
    from musicgen_tpu.models.transformer import TransformerLM

    L = 16
    cfg = TransformerConfig(
        n_embd=32, n_heads=4, n_layer=2, block_len=L, dropout=0.0,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
    )
    model = TransformerLM(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray([_random_stream(rng, L), _random_stream(rng, L)], jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)

    prefill, step = make_sampler(model, "transformer", block_len=L)
    n_new = 3 * L  # wraps the ring twice
    cfg_s = SamplerConfig(num_tokens=n_new, greedy=True, ring_size=2048)
    init_logits, state = prefill(params, prompt, meta)
    t1 = sample_tokens(step, params, init_logits, state, prompt, cfg_s,
                       jax.random.PRNGKey(1))
    init_logits, state = prefill(params, prompt, meta)
    t2 = sample_tokens(step, params, init_logits, state, prompt, cfg_s,
                       jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))  # greedy det.

    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    stream = np.concatenate([np.asarray(prompt), np.asarray(t1)], axis=1)
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for b in range(2):
        for t in range(L, stream.shape[1]):
            assert buckets[b, t] in allowed[buckets[b, t - 1]], f"pos {t}"


def test_xlstm_sampling_grammatical():
    """Sampler-level coverage for the xlstm adapter kind."""
    from musicgen_tpu.config import XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMLM

    cfg = XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=22, vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
    )
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray([_random_stream(rng, 16)], jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (1, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)

    prefill, step = make_sampler(model, "xlstm", block_len=16)
    cfg_s = SamplerConfig(num_tokens=20, greedy=True)
    init_logits, state = prefill(params, prompt, meta)
    toks = sample_tokens(step, params, init_logits, state, prompt, cfg_s,
                         jax.random.PRNGKey(3))
    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    stream = np.concatenate([np.asarray(prompt), np.asarray(toks)], axis=1)
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for t in range(16, stream.shape[1]):
        assert buckets[0, t] in allowed[buckets[0, t - 1]]


def test_generate_wrapper_jit():
    """The end-user generate() wrapper under jit (the production path)."""
    import jax as _jax
    from musicgen_tpu.sample.sampler import generate

    model, params, prompt, meta = _mamba_setup(prompt_len=16)
    streams = generate(
        model, params, "mamba", prompt, meta, num_tokens=10, block_len=16,
        rng=_jax.random.PRNGKey(0), greedy=True, jit=True,
    )
    assert streams.shape == (2, 26)
    np.testing.assert_array_equal(np.asarray(streams[:, :16]), np.asarray(prompt))


# ---------------------------------------------------------------------------
# Alternate sampler modes (reference generate_midi_many.py / generate_midi.py)
# ---------------------------------------------------------------------------

def test_count_window_matches_counter():
    """hist tracks Counter(stream[-100:]) exactly across pushes/evictions."""
    from collections import Counter

    from musicgen_tpu.sample.sampler import (
        COUNT_WINDOW,
        init_count_window,
        push_count_window,
    )

    rng = np.random.default_rng(3)
    stream = _random_stream(rng, 400)
    prompt = jnp.asarray([stream[:150]], jnp.int32)
    state = init_count_window(prompt)
    for i, tok in enumerate(stream[150:]):
        hist = np.asarray(state.hist[0])
        expected = Counter(stream[: 150 + i][-COUNT_WINDOW:])
        got = {t: int(hist[t]) for t in np.nonzero(hist)[0]}
        assert got == dict(expected), f"at stream pos {150 + i}"
        state = push_count_window(state, jnp.asarray([tok], jnp.int32))


def test_count_penalty_divisor_table():
    """Per-class table of generate_midi_many.py:28-43."""
    from musicgen_tpu.sample.sampler import count_penalty_divisor

    hist = jnp.zeros((1, VOCAB.vocab_size), jnp.int32)
    hist = hist.at[0, 7].set(3)  # pitch: 1.04^3
    hist = hist.at[0, 11].set(90)  # pitch: capped at 1.25
    hist = hist.at[0, VOCAB.dyn_start + 1].set(50)  # dyn: skipped
    hist = hist.at[0, VOCAB.length_start + 4].set(4)  # length: 1.015^4
    hist = hist.at[0, VOCAB.length_start + 5].set(99)  # length: capped 1.08
    hist = hist.at[0, VOCAB.time_start + 2].set(9)  # time: below threshold
    hist = hist.at[0, VOCAB.time_start + 3].set(12)  # time: 1.1*12
    hist = hist.at[0, VOCAB.tempo_start + 1].set(60)  # tempo: skipped
    d = np.asarray(count_penalty_divisor(hist))[0]
    assert np.isclose(d[7], 1.04 ** 3)
    assert np.isclose(d[11], 1.25)
    assert d[VOCAB.dyn_start + 1] == 1.0
    assert np.isclose(d[VOCAB.length_start + 4], 1.015 ** 4)
    assert np.isclose(d[VOCAB.length_start + 5], 1.08)
    assert d[VOCAB.time_start + 2] == 1.0
    assert np.isclose(d[VOCAB.time_start + 3], 1.1 * 12)
    assert d[VOCAB.tempo_start + 1] == 1.0


def _naive_many_oracle(model, params, prompt, meta, num_tokens, block_len):
    """Literal host-loop transliteration of generate_midi_many.py:13-56:
    full re-forward per token, Counter over the last 100 stream tokens,
    per-class divisor table, argmax."""
    from collections import Counter

    from musicgen_tpu.ops.grammar import filtered_logits

    stream = [int(t) for t in np.asarray(prompt)[0]]
    token_ids = prompt
    out = []
    for _ in range(num_tokens):
        logits = model.apply(params, token_ids, meta)[:, -1, :]
        prev = jnp.asarray([stream[-1]], jnp.int32)
        w = np.array(filtered_logits(prev, logits))[0]
        for token, count in Counter(stream[-100:]).items():
            if VOCAB.tempo_start <= token:
                continue
            elif VOCAB.time_start <= token:
                penalty = 1.1 * count if count >= 10 else 1.0
            elif VOCAB.length_start <= token:
                penalty = min(1.015 ** count, 1.08)
            elif VOCAB.dyn_start <= token:
                continue
            else:
                penalty = min(1.04 ** count, 1.25)
            w[token] /= penalty
        nxt = int(np.argmax(w))
        out.append(nxt)
        stream.append(nxt)
        token_ids = jnp.concatenate(
            [token_ids, jnp.asarray([[nxt]], jnp.int32)], axis=1
        )[:, -block_len:]
    return out


def test_many_mode_matches_literal_counter_oracle():
    """Cached scan 'many' mode == a literal Counter/argmax transliteration
    of generate_midi_many.py (in the non-truncating regime)."""
    model, params, prompt, meta = _mamba_setup(prompt_len=16, batch=1)
    block_len = 128  # > prompt + num_tokens: no window truncation
    num_tokens = 12  # each oracle step re-traces a new shape; keep it small

    prefill, step = make_sampler(model, "mamba", block_len=block_len)
    cfg = SamplerConfig(num_tokens=num_tokens, mode="many")
    init_logits, state = prefill(params, prompt, meta)
    toks = sample_tokens(
        step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(0)
    )
    expected = _naive_many_oracle(model, params, prompt, meta, num_tokens,
                                  block_len)
    np.testing.assert_array_equal(np.asarray(toks)[0], np.asarray(expected))


def test_top5_mode_reproducible_and_grammatical():
    model, params, prompt, meta = _mamba_setup(prompt_len=24, batch=2)
    prefill, step = make_sampler(model, "mamba", block_len=64)
    cfg = SamplerConfig(num_tokens=40, mode="top5")

    init_logits, state = prefill(params, prompt, meta)
    t1 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(7))
    init_logits, state = prefill(params, prompt, meta)
    t2 = sample_tokens(step, params, init_logits, state, prompt, cfg, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    stream = np.concatenate([np.asarray(prompt), np.asarray(t1)], axis=1)
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for b in range(stream.shape[0]):
        for t in range(prompt.shape[1], stream.shape[1]):
            assert buckets[b, t] in allowed[buckets[b, t - 1]]


def test_empirical_length_weights():
    from musicgen_tpu.ops.grammar import grammar_mask
    from musicgen_tpu.ops.length_distribution import (
        EMPIRICAL_LENGTH_TENSOR,
        empirical_length_weights,
    )

    assert len(EMPIRICAL_LENGTH_TENSOR) == 499  # artifact length, verbatim
    w = np.asarray(empirical_length_weights(511))
    assert w.shape == (511,)
    assert np.isclose(w[0], 1.0013)
    assert np.isclose(w[498], 1.0014)
    assert np.all(w[499:] == 1.0)  # right-padded

    m_lin = np.asarray(grammar_mask())
    m_emp = np.asarray(grammar_mask(length_weights="empirical"))
    # Only the length row (row 1, dyn->length transition) differs.
    for r in (0, 2, 3, 4):
        np.testing.assert_array_equal(m_lin[r], m_emp[r])
    ls = VOCAB.length_start
    assert np.isclose(m_emp[1, ls], 1.0013)
    assert np.isclose(m_emp[1, ls + 498], 1.0014)
    assert m_emp[1, VOCAB.time_start - 1] == 0.0  # last length token excluded


def test_transformer_sampling_shorter_window_than_model():
    """--block-len shorter than the model's trained context (the reference's
    generate_midi_testing study): the physical KV cache keeps the model's
    slot count; ring ages must mask the unused tail (regression: shape
    mismatch (B,H,model_seq) vs (B,H,window+6))."""
    from musicgen_tpu.config import TransformerConfig
    from musicgen_tpu.models.transformer import TransformerLM

    cfg = TransformerConfig(
        n_embd=32, n_heads=4, n_layer=2, block_len=32, dropout=0.0,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
    )
    model = TransformerLM(cfg)
    rng = np.random.default_rng(7)
    b, window = 2, 16  # sample with half the trained window
    prompt = jnp.asarray(
        [_random_stream(rng, window) for _ in range(b)], jnp.int32
    )
    meta = jnp.asarray(rng.integers(0, 9, (b, 6)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)

    from musicgen_tpu.sample.sampler import generate

    streams = generate(
        model, params, "transformer", prompt, meta, 10, window,
        jax.random.PRNGKey(1), greedy=True,
    )
    assert streams.shape == (b, window + 10)
    new = np.asarray(streams[:, window:])
    assert (new >= 0).all() and (new < VOCAB.vocab_size).all()

    # First generated token must equal the exact reference-windowed sampler
    # (identical visible context; later tokens can drift on argmax near-ties
    # between the cached and re-forward float paths, and once the window
    # slides the ring keeps full left context by design — sample/cache.py).
    ref = reference_windowed_generate(
        model, params, prompt, meta, 1, window, jax.random.PRNGKey(1),
        greedy=True,
    )
    np.testing.assert_array_equal(
        np.asarray(streams[:, : window + 1]), np.asarray(ref)
    )
