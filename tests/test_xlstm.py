"""xLSTM op and model tests: mLSTM parallel==sequential, sLSTM recurrence,
prefill-state correctness, cached decode equivalence, classifier shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, ClassifierConfig, XLSTMConfig
from musicgen_tpu.models.xlstm import XLSTMClassifier, XLSTMLM
from musicgen_tpu.ops.mlstm import (
    mlstm_init_state,
    mlstm_parallel,
    mlstm_sequential,
    mlstm_step,
)
from musicgen_tpu.ops.slstm import slstm_init_state, slstm_sequential, slstm_step

SMALL = XLSTMConfig(
    embedding_dim=32, num_blocks=4, slstm_at=(1, 3), num_heads=4,
    conv1d_kernel_size=4, qkv_proj_blocksize=4, context_length=22,
    vocab_size=61, metadata_vocab_size=9,
)


def _mlstm_inputs(rng, b=2, t=24, h=3, dh=8):
    q = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, dh)), jnp.float32)
    ig = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    fg = jnp.asarray(rng.standard_normal((b, t, h)) + 2.0, jnp.float32)
    return q, k, v, ig, fg


def test_mlstm_parallel_matches_sequential():
    rng = np.random.default_rng(0)
    q, k, v, ig, fg = _mlstm_inputs(rng)
    y_p = mlstm_parallel(q, k, v, ig, fg)
    y_s = mlstm_sequential(q, k, v, ig, fg)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s), rtol=1e-4, atol=1e-4)


def test_mlstm_step_chains():
    rng = np.random.default_rng(1)
    q, k, v, ig, fg = _mlstm_inputs(rng, t=10)
    y_p = mlstm_parallel(q, k, v, ig, fg)
    state = mlstm_init_state(2, 3, 8)
    for t in range(10):
        y_t, state = mlstm_step(q[:, t], k[:, t], v[:, t], ig[:, t], fg[:, t], state)
        np.testing.assert_allclose(
            np.asarray(y_t), np.asarray(y_p[:, t]), rtol=1e-4, atol=1e-4,
            err_msg=f"t={t}",
        )


def test_slstm_step_matches_sequential():
    rng = np.random.default_rng(2)
    b, t, h, dh = 2, 12, 4, 8
    wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)
    hs, final = slstm_sequential(wx, r, bias)
    state = slstm_init_state(b, h, dh)
    for tt in range(t):
        h_t, state = slstm_step(wx[:, tt], r, bias, state)
        np.testing.assert_allclose(
            np.asarray(h_t), np.asarray(hs[:, tt]), rtol=1e-5, atol=1e-5
        )
    for a, bb in zip(state, final):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-5)


def test_slstm_initial_state_resume():
    rng = np.random.default_rng(3)
    b, t, h, dh = 1, 16, 2, 4
    wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)
    h_full, s_full = slstm_sequential(wx, r, bias)
    h1, s1 = slstm_sequential(wx[:, :7], r, bias)
    h2, s2 = slstm_sequential(wx[:, 7:], r, bias, initial_state=s1)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full[:, 7:]), rtol=1e-5, atol=1e-5)


def test_xlstm_forward_shapes():
    model = XLSTMLM(SMALL)
    tokens = jnp.ones((2, 16), jnp.int32)
    meta = jnp.ones((2, NUM_META), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, meta)
    logits = model.apply(params, tokens, meta)
    assert logits.shape == (2, 16, SMALL.vocab_size)


def test_xlstm_cached_decode_matches_full_forward():
    model = XLSTMLM(SMALL)
    rng = np.random.default_rng(0)
    P = 9
    prompt = jnp.asarray(rng.integers(0, SMALL.vocab_size, (2, P)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, SMALL.metadata_vocab_size, (2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt, meta)

    logits_pre, states = model.apply(params, prompt, meta, method=XLSTMLM.prefill)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(model.apply(params, prompt, meta)),
        rtol=2e-4, atol=2e-4,
    )

    stream = np.asarray(prompt)
    for j in range(5):
        full_logits = model.apply(params, jnp.asarray(stream), meta)
        next_tok = jnp.argmax(full_logits[:, -1, :], axis=-1).astype(jnp.int32)
        step_logits, states = model.apply(params, next_tok, states, method=XLSTMLM.step)
        stream = np.concatenate([stream, np.asarray(next_tok)[:, None]], axis=1)
        ref = model.apply(params, jnp.asarray(stream), meta)[:, -1, :]
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(ref), rtol=5e-4, atol=5e-4,
            err_msg=f"step {j}",
        )


def test_classifier_shapes():
    cfg = ClassifierConfig(
        embedding_dim=32, num_blocks=3, slstm_at=(1,), num_heads=4,
        context_length=16, vocab_size=61, metadata_vocab_size=9,
    )
    model = XLSTMClassifier(cfg)
    tokens = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    out = model.apply(params, tokens)
    assert out.shape == (2, 9)


def test_mlstm_chunkwise_matches_sequential():
    from musicgen_tpu.ops.mlstm import mlstm_chunkwise

    rng = np.random.default_rng(5)
    q, k, v, ig, fg = _mlstm_inputs(rng, b=2, t=48, h=3, dh=8)
    y_ref = mlstm_sequential(q, k, v, ig, fg)
    for chunk in (8, 16, 48):
        y_c, state = mlstm_chunkwise(q, k, v, ig, fg, chunk=chunk)
        np.testing.assert_allclose(
            np.asarray(y_c), np.asarray(y_ref), rtol=2e-4, atol=2e-4,
            err_msg=f"chunk={chunk}",
        )


def test_mlstm_chunkwise_state_resume():
    from musicgen_tpu.ops.mlstm import mlstm_chunkwise

    rng = np.random.default_rng(6)
    q, k, v, ig, fg = _mlstm_inputs(rng, b=1, t=32, h=2, dh=8)
    y_full, s_full = mlstm_chunkwise(q, k, v, ig, fg, chunk=8)
    y1, s1 = mlstm_chunkwise(q[:, :16], k[:, :16], v[:, :16], ig[:, :16], fg[:, :16], chunk=8)
    y2, s2 = mlstm_chunkwise(
        q[:, 16:], k[:, 16:], v[:, 16:], ig[:, 16:], fg[:, 16:], chunk=8,
        initial_state=s1,
    )
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_full[:, 16:]), rtol=2e-4, atol=2e-4)
    for a, b_ in zip(s2, s_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)
