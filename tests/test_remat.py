"""remat (gradient checkpointing) must be a pure memory/FLOP trade: same
params tree, same loss, same gradients as the plain model."""
import dataclasses

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
from musicgen_tpu.train.loss import filtered_cross_entropy

T = 24


def _models(kind):
    if kind == "mamba":
        from musicgen_tpu.models.mamba import MambaLM

        cfg = MambaConfig(
            d_model=32, n_layers=2, d_state=8, headdim=8, chunk_size=8,
            metadata_vocab_size=9,
        )
        return MambaLM(cfg), MambaLM(dataclasses.replace(cfg, remat=True))
    if kind == "transformer":
        from musicgen_tpu.models.transformer import TransformerLM

        cfg = TransformerConfig(
            n_embd=32, n_heads=4, n_layer=2, block_len=T, dropout=0.0,
            metadata_vocab_size=9,
        )
        return (
            TransformerLM(cfg),
            TransformerLM(dataclasses.replace(cfg, remat=True)),
        )
    from musicgen_tpu.models.xlstm import XLSTMLM

    cfg = XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=T + NUM_META, metadata_vocab_size=9,
    )
    return XLSTMLM(cfg), XLSTMLM(dataclasses.replace(cfg, remat=True))


@pytest.mark.parametrize("kind", ["mamba", "transformer", "xlstm"])
def test_remat_same_loss_and_grads(kind):
    plain, remat = _models(kind)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (2, NUM_META)), jnp.int32)
    params = plain.init(jax.random.PRNGKey(0), src, meta)
    # Same parameter structure: remat-wrapped modules keep names.
    r_params = remat.init(jax.random.PRNGKey(0), src, meta)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(r_params)

    def loss(model):
        return lambda p: filtered_cross_entropy(
            src, model.apply(p, src, meta), trg
        )

    l0, g0 = jax.value_and_grad(loss(plain))(params)
    l1, g1 = jax.value_and_grad(loss(remat))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
