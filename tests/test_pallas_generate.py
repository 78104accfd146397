"""Whole-generation resident-state kernel vs the per-step fused sampler.

Greedy mode must reproduce sample_tokens_fused_tail's token streams exactly
(same prefill seed, same penalty semantics, no RNG involved). Stochastic
mode uses the TPU PRNG (a different stream than jax.random by design) — its
output is checked for grammaticality and in-vocab bounds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims,
    build_decode_params,
    stack_states,
)
from musicgen_tpu.ops.pallas_generate import generate_resident

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def setup():
    cfg = MambaConfig(d_model=256, n_layers=3)
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    b, p = 2, 64
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
    dims = DecodeDims.create(cfg, b)
    dp = build_decode_params(params, cfg, b)
    return cfg, model, params, prompt, meta, logits0[:, -1, :], states, dims, dp


def test_resident_greedy_matches_fused_tail(setup):
    from musicgen_tpu.sample.sampler import SamplerConfig, sample_tokens_fused_tail

    cfg, model, params, prompt, meta, init_logits, states, dims, dp = setup
    n = 16
    scfg = SamplerConfig(num_tokens=n, greedy=True, ring_size=2048)
    ref = sample_tokens_fused_tail(
        dp, init_logits, stack_states(states), prompt, scfg,
        jax.random.PRNGKey(5), cfg, dims, interpret=INTERPRET,
    )
    out = generate_resident(
        dp, init_logits, stack_states(states), prompt, n, cfg, dims,
        jax.random.PRNGKey(5), greedy=True, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(
        np.asarray(out[:, prompt.shape[1]:]), np.asarray(ref)
    )


def test_resident_stochastic_grammatical(setup):
    from musicgen_tpu.ops.grammar import field_bucket

    cfg, model, params, prompt, meta, init_logits, states, dims, dp = setup
    n = 24
    out = generate_resident(
        dp, init_logits, stack_states(states), prompt, n, cfg, dims,
        jax.random.PRNGKey(9), greedy=False, interpret=INTERPRET,
    )
    new = np.asarray(out[:, prompt.shape[1]:])
    assert (new >= 0).all() and (new < cfg.vocab_size).all()
    stream = np.concatenate([np.asarray(prompt[:, -1:]), new], axis=1)
    allowed = {0: {1}, 1: {2}, 2: {3, 4}, 3: {4}, 4: {0}}
    buckets = np.asarray(field_bucket(jnp.asarray(stream)))
    for row in buckets:
        for a, b_ in zip(row[:-1], row[1:]):
            assert b_ in allowed[a], (row.tolist(), a, b_)
    # two seeds should usually differ (stochastic picks)
    out2 = generate_resident(
        dp, init_logits, stack_states(states), prompt, n, cfg, dims,
        jax.random.PRNGKey(10), greedy=False, interpret=INTERPRET,
    )
    assert not np.array_equal(np.asarray(out2), np.asarray(out))


def test_resident_final_state_matches_stepwise(setup):
    """The kernel's final conv/SSM states equal stepping the XLA model over
    the emitted greedy stream."""
    from musicgen_tpu.ops.pallas_generate import fused_generate
    from musicgen_tpu.sample.sampler import (
        _iter_top_k,
        filtered_logits,
        init_penalty_state,
        penalty_divisor,
    )

    cfg, model, params, prompt, meta, init_logits, states, dims, dp = setup
    n = 8
    conv0, ssm0 = stack_states(states)
    pen0 = init_penalty_state(prompt, 2048)
    w0 = filtered_logits(prompt[:, -1], init_logits) / penalty_divisor(pen0.hist)
    vals0, idxs0 = _iter_top_k(w0, 3)
    toks, conv_f, ssm_f = fused_generate(
        dp, vals0, idxs0, prompt[:, -1], conv0, ssm0,
        pen0.hist, pen0.ring_tok, pen0.ring_c, pen0.start, pen0.head,
        pen0.wsum, jax.random.PRNGKey(0), dims, n, greedy=True, interpret=INTERPRET,
    )
    # Step the XLA oracle over the same tokens.
    xla_states = states
    for t in range(n):
        _, xla_states = model.apply(
            params, toks[:, t], xla_states, method=MambaLM.step
        )
    ref_conv, ref_ssm = stack_states(xla_states)
    np.testing.assert_allclose(
        np.asarray(conv_f), np.asarray(ref_conv), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(ssm_f), np.asarray(ref_ssm), rtol=0.05, atol=0.05
    )
