"""Sequence-parallel Mamba TRAINING path (parallel/sp_train.py): the full
time-sharded step must reproduce the single-device loss and gradients and
actually descend — VERDICT r2 item 9's trainable long-context mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.parallel.sp_train import make_sp_train_step, sp_loss
from musicgen_tpu.train.loss import filtered_cross_entropy
from musicgen_tpu.train.trainer import make_optimizer

CFG = MambaConfig(
    d_model=32, n_layers=2, d_state=8, d_conv=4, expand=2, headdim=8,
    chunk_size=8, vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
)
T = 58  # + NUM_META = 64 -> 8 per shard on the 8-device mesh


def _setup():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (2, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (2, NUM_META)), jnp.int32)
    model = MambaLM(CFG)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    return model, params, src, trg, meta, mesh


def test_sp_loss_matches_single_device():
    model, params, src, trg, meta, mesh = _setup()
    ref = filtered_cross_entropy(src, model.apply(params, src, meta), trg)
    got = jax.jit(
        lambda p: sp_loss(p, src, trg, meta, CFG, mesh, chunk=8)
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_sp_gradients_match_single_device():
    model, params, src, trg, meta, mesh = _setup()
    g_ref = jax.grad(
        lambda p: filtered_cross_entropy(src, model.apply(p, src, meta), trg)
    )(params)
    g_sp = jax.jit(jax.grad(
        lambda p: sp_loss(p, src, trg, meta, CFG, mesh, chunk=8)
    ))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    assert len(flat_ref) == len(flat_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_sp_training_descends():
    model, params, src, trg, meta, mesh = _setup()
    opt = make_optimizer()
    step = make_sp_train_step(model, opt, mesh, chunk=8)
    state = opt.init(params)
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, src, trg, meta)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # Adam lr 5e-5 (the reference setting): small but strictly monotone
    # descent over 6 steps on a fixed batch.
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.05, losses


def test_sp_rejects_bad_stream_length():
    model, params, src, trg, meta, mesh = _setup()
    with pytest.raises(ValueError, match="must divide"):
        sp_loss(params, src[:, :-1], trg[:, :-1], meta, CFG, mesh)
