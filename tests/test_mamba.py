"""Mamba-2 SSD op and MambaLM tests: chunked scan vs sequential oracle,
causal conv semantics, cached decode equivalence, and exact parameter-count
parity with the reference (101,972,666 — scripts/Test Accuracy.ipynb cell 1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.ssm import (
    causal_conv1d,
    causal_conv1d_step,
    ssd_chunked,
    ssd_reference,
    ssd_step,
)

SMALL = MambaConfig(
    d_model=32, n_layers=2, d_state=8, d_conv=4, expand=2, headdim=8,
    chunk_size=8, vocab_size=59, metadata_vocab_size=7,
)


def _random_ssd_inputs(rng, b=2, t=32, h=4, p=8, g=1, n=8):
    x = jnp.asarray(rng.standard_normal((b, t, h, p)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.5, (b, t, h)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.5, 4.0, (h,)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    return x, dt, A, B, C


def test_ssd_chunked_matches_sequential():
    rng = np.random.default_rng(0)
    x, dt, A, B, C = _random_ssd_inputs(rng)
    for chunk in (8, 16, 32):
        y_c, s_c = ssd_chunked(x, dt, A, B, C, chunk=chunk)
        y_r, s_r = ssd_reference(x, dt, A, B, C)
        np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_r), rtol=1e-4, atol=1e-4)


def test_ssd_chunked_multihead_groups():
    rng = np.random.default_rng(3)
    x, dt, A, B, C = _random_ssd_inputs(rng, h=6, g=2, n=4, p=4)
    y_c, s_c = ssd_chunked(x, dt, A, B, C, chunk=8)
    y_r, s_r = ssd_reference(x, dt, A, B, C)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_r), rtol=1e-4, atol=1e-4)


def test_ssd_initial_state_resume():
    """Splitting a sequence at an arbitrary point and resuming from the
    carried state must equal one continuous scan."""
    rng = np.random.default_rng(1)
    x, dt, A, B, C = _random_ssd_inputs(rng, t=48)
    y_full, s_full = ssd_chunked(x, dt, A, B, C, chunk=16)
    y1, s1 = ssd_chunked(x[:, :16], dt[:, :16], A, B[:, :16], C[:, :16], chunk=16)
    y2, s2 = ssd_chunked(
        x[:, 16:], dt[:, 16:], A, B[:, 16:], C[:, 16:], chunk=16, initial_state=s1
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_full[:, :16]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, 16:]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_full), rtol=1e-4, atol=1e-4)


def test_causal_conv1d_vs_numpy():
    rng = np.random.default_rng(2)
    b, t, c, k = 2, 20, 5, 4
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    w = rng.standard_normal((k, c)).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)
    y = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)))
    expected = np.zeros_like(x)
    for tt in range(t):
        acc = np.tile(bias, (b, 1))
        for kk in range(k):
            src = tt - (k - 1) + kk
            if src >= 0:
                acc += w[kk][None, :] * x[:, src, :]
        expected[:, tt, :] = acc
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_step_matches_full():
    rng = np.random.default_rng(4)
    b, t, c, k = 2, 12, 5, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    full = np.asarray(causal_conv1d(x, w, bias))
    state = jnp.zeros((b, k - 1, c), jnp.float32)
    for tt in range(t):
        y, state = causal_conv1d_step(x[:, tt], state, w, bias)
        np.testing.assert_allclose(np.asarray(y), full[:, tt], rtol=1e-5, atol=1e-5)


def test_mamba_param_count_full_config():
    """Exact parameter parity with the reference Mamba stack (vocab padding
    disabled; padding exists only for MXU tiling / TP divisibility)."""
    model = MambaLM(MambaConfig(vocab_pad_multiple=1))
    tokens = jnp.zeros((1, 8), jnp.int32)
    meta = jnp.zeros((1, NUM_META), jnp.int32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), tokens, meta)
    )
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert n == 101_972_666


def test_mamba_forward_shapes_and_no_residual():
    model = MambaLM(SMALL)
    tokens = jnp.ones((2, 16), jnp.int32)
    meta = jnp.ones((2, NUM_META), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, meta)
    logits = model.apply(params, tokens, meta)
    assert logits.shape == (2, 16, SMALL.vocab_size)


def test_mamba_cached_decode_matches_full_forward():
    """prefill+step on a growing stream == full forward over the stream
    (exact streaming equivalence; recurrent state carries all context)."""
    model = MambaLM(SMALL)
    rng = np.random.default_rng(0)
    P = 12
    prompt = jnp.asarray(rng.integers(0, SMALL.vocab_size, (2, P)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, SMALL.metadata_vocab_size, (2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)

    logits_pre, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(model.apply(params, prompt, meta)),
        rtol=2e-4, atol=2e-4,
    )

    stream = np.asarray(prompt)
    for j in range(6):
        full_logits = model.apply(params, jnp.asarray(stream), meta)
        next_tok = jnp.argmax(full_logits[:, -1, :], axis=-1).astype(jnp.int32)
        step_logits, states = model.apply(params, next_tok, states, method=MambaLM.step)
        stream = np.concatenate([stream, np.asarray(next_tok)[:, None]], axis=1)
        ref = model.apply(params, jnp.asarray(stream), meta)[:, -1, :]
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(ref), rtol=5e-4, atol=5e-4,
            err_msg=f"step {j}",
        )
