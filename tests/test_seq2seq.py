"""Seq2seq tutorial transformer (models/seq2seq.py vs reference
models/transformer/simple_transformer.py — the encoder-decoder tutorial
model; dead code in the reference but part of its surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.models.seq2seq import (
    Seq2SeqConfig,
    Seq2SeqTransformer,
    TutorialLayerNorm,
    _sinusoid_table,
)


@pytest.fixture(scope="module")
def setup():
    cfg = Seq2SeqConfig(
        embed_dim=64,
        num_blocks=2,
        num_heads=4,
        encoder_vocab_size=100,
        output_vocab_size=120,
        max_len=64,
    )
    model = Seq2SeqTransformer(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 100, (2, 12)), jnp.int32)
    out = jnp.asarray(rng.integers(0, 120, (2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, out)
    return cfg, model, src, out, params


def test_shapes_and_logprobs(setup):
    cfg, model, src, out, params = setup
    lp = model.apply(params, src, out)
    # Decoder queries only the last output position
    # (simple_transformer.py:209) -> one next-token distribution.
    assert lp.shape == (2, 1, cfg.output_vocab_size)
    # log_softmax head (simple_transformer.py:124): rows sum to 1 in prob.
    np.testing.assert_allclose(
        np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5
    )


def test_encode_decode_split_matches_call(setup):
    cfg, model, src, out, params = setup
    memory = model.apply(params, src, method=Seq2SeqTransformer.encode)
    lp2 = model.apply(
        params, memory, out, method=Seq2SeqTransformer.decode
    )
    lp1 = model.apply(params, src, out)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-6)


def test_autoregressive_greedy_loop(setup):
    """The reference usage pattern: encode once, repeatedly decode the
    growing output prefix and append the argmax token."""
    cfg, model, src, out, params = setup
    memory = model.apply(params, src, method=Seq2SeqTransformer.encode)
    seq = out[:, :1]
    for _ in range(4):
        lp = model.apply(
            params, memory, seq, method=Seq2SeqTransformer.decode
        )
        nxt = jnp.argmax(lp[:, -1, :], -1).astype(jnp.int32)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    assert seq.shape == (2, 5)
    assert int(seq.max()) < cfg.output_vocab_size


def test_tutorial_layernorm_shift_in_divisor():
    """The Annotated-Transformer variant puts the learned shift in the
    DIVISOR (simple_transformer.py:74-78): with shift=1 the output shrinks
    instead of translating."""
    ln = TutorialLayerNorm(8)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 8)),
                    jnp.float32)
    params = ln.init(jax.random.PRNGKey(0), x)
    base = ln.apply(params, x)
    shifted = ln.apply(
        {"params": {"scale": params["params"]["scale"],
                    "shift": params["params"]["shift"] + 1.0}}, x
    )
    # torch x.std(-1): Bessel-corrected — check against numpy ddof=1.
    std = np.asarray(x).std(-1, ddof=1, keepdims=True)
    mean = np.asarray(x).mean(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(base), (np.asarray(x) - mean) / (std + 1e-6),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(shifted), (np.asarray(x) - mean) / (std + 1e-6 + 1.0),
        rtol=1e-4, atol=1e-5,
    )


def test_sinusoid_table_reference_exponent():
    """simple_transformer.py:148-156 uses 10000^(i/d) as a MULTIPLIER of
    the position (the tutorial's inverted exponent) — pin that quirk."""
    pe = np.asarray(_sinusoid_table(16, 8))
    pos, i = 3.0, 2
    expected = np.sin(pos * (10000.0 ** (i / 8)))
    np.testing.assert_allclose(pe[3, i], expected, rtol=1e-5)


def test_grad_flows(setup):
    cfg, model, src, out, params = setup

    def loss(p):
        lp = model.apply(p, src, out, deterministic=True)
        return -lp[:, 0, 0].mean()

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)
