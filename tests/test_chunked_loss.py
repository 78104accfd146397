"""chunked_filtered_cross_entropy must exactly reproduce the standard
grammar-filtered CE (loss AND gradients) for every generator — it is the
memory-optimized path (-10x vocab-sized temps), not a different loss."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import (
    NUM_META,
    VOCAB,
    MambaConfig,
    TransformerConfig,
    XLSTMConfig,
)
from musicgen_tpu.train.loss import (
    chunked_filtered_cross_entropy,
    filtered_cross_entropy,
)
from musicgen_tpu.train.trainer import make_lm_train_step, make_optimizer

T = 24  # deliberately NOT a multiple of chunk=7 -> exercises padding


def _model(kind):
    if kind == "mamba":
        from musicgen_tpu.models.mamba import MambaLM

        return MambaLM(MambaConfig(
            d_model=32, n_layers=2, d_state=8, headdim=8, chunk_size=8,
            metadata_vocab_size=9,
        ))
    if kind == "transformer":
        from musicgen_tpu.models.transformer import TransformerLM

        return TransformerLM(TransformerConfig(
            n_embd=32, n_heads=4, n_layer=2, block_len=T, dropout=0.0,
            metadata_vocab_size=9,
        ))
    from musicgen_tpu.models.xlstm import XLSTMLM

    return XLSTMLM(XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=T + NUM_META, metadata_vocab_size=9,
    ))


@pytest.mark.parametrize("kind", ["mamba", "transformer", "xlstm"])
@pytest.mark.parametrize("chunk", [7, 24])
def test_chunked_loss_matches(kind, chunk):
    model = _model(kind)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, meta)

    def ref_loss(p):
        return filtered_cross_entropy(src, model.apply(p, src, meta), trg)

    def chk_loss(p):
        hid = model.apply(p, src, meta, method="hidden")
        head = p["params"]["lm_head"]
        return chunked_filtered_cross_entropy(
            src, hid, head["kernel"], head["bias"], trg,
            model.cfg.vocab_size, chunk=chunk,
        )

    l0, g0 = jax.value_and_grad(ref_loss)(params)
    l1, g1 = jax.value_and_grad(chk_loss)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=f"{kind} grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_train_step_with_loss_chunk_matches():
    """One full train step (Adam update included) must produce the same
    params with and without loss chunking."""
    model = _model("mamba")
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (2, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    opt = make_optimizer()
    key = jax.random.PRNGKey(7)

    s0 = make_lm_train_step(model, opt, donate=False)
    s1 = make_lm_train_step(model, opt, donate=False, loss_chunk=8)
    p0, _, l0 = s0(params, opt.init(params), src, trg, meta, key)
    p1, _, l1 = s1(params, opt.init(params), src, trg, meta, key)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    # Adam normalizes by sqrt(v)+eps, amplifying f32 rounding in tiny grads;
    # a handful of elements land ~2e-5 rel apart.
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
