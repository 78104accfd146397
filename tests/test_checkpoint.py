"""Checkpoint/resume: orbax round trip restores params AND optimizer state
(the reference loses Adam moments on resume — SURVEY.md §5.4)."""
import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, TransformerConfig, TrainValues, VOCAB
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.train.trainer import (
    TrainState,
    load_checkpoint,
    make_lm_train_step,
    make_optimizer,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    cfg = TransformerConfig(
        n_embd=32, n_heads=4, n_layer=1, block_len=8, dropout=0.0,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=11,
    )
    model = TransformerLM(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, 8)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, 8)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 11, (2, NUM_META)), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), src, meta)
    optimizer = make_optimizer(TrainValues(learning_rate=1e-3))
    opt_state = optimizer.init(params)
    step = make_lm_train_step(model, optimizer, donate=False)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, src, trg, meta,
                                       jax.random.PRNGKey(1))

    state = TrainState(params, opt_state, 3)
    path = save_checkpoint(str(tmp_path / "ckpt"), state, float(loss))
    assert "loss_" in path and "_time_" in path  # reference naming scheme

    template = TrainState(
        model.init(jax.random.PRNGKey(42), src, meta),
        optimizer.init(model.init(jax.random.PRNGKey(42), src, meta)),
        0,
    )
    restored = load_checkpoint(path, template)
    assert restored.step == 3

    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state (Adam moments) restored exactly.
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed training continues deterministically.
    p1, o1, l1 = step(state.params, state.opt_state, src, trg, meta,
                      jax.random.PRNGKey(2))
    p2, o2, l2 = step(restored.params, restored.opt_state, src, trg, meta,
                      jax.random.PRNGKey(2))
    assert float(l1) == float(l2)
