"""Pipeline-parallel Mamba training (parallel/pipeline.py): the GPipe
layer-sharded step must reproduce the single-device loss and gradients and
actually descend — including crossed with data parallelism (DP x PP).

The reference's only multi-device mode replicates the full model per GPU
(train_parallel.py:143-235); this is the missing scale axis."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.parallel.pipeline import make_pp_train_step, pp_loss
from musicgen_tpu.train.loss import filtered_cross_entropy
from musicgen_tpu.train.trainer import make_optimizer

CFG = MambaConfig(
    d_model=32, n_layers=4, d_state=8, d_conv=4, expand=2, headdim=8,
    chunk_size=8, vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
)
T = 26  # + NUM_META = 32


def _setup(batch=4):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (batch, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (batch, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (batch, NUM_META)), jnp.int32)
    model = MambaLM(CFG)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    return model, params, src, trg, meta


def _pipe_mesh(stages=4):
    return Mesh(np.asarray(jax.devices()[:stages]), ("pipe",))


def _ref_loss(model, params, src, trg, meta):
    return filtered_cross_entropy(src, model.apply(params, src, meta), trg)


def test_pp_loss_matches_single_device():
    model, params, src, trg, meta = _setup()
    ref = _ref_loss(model, params, src, trg, meta)
    got = jax.jit(
        lambda p: pp_loss(p, src, trg, meta, CFG, _pipe_mesh())
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pp_loss_matches_with_fewer_microbatches():
    # M != S (2 microbatches over 4 stages) exercises the clamp/mask edges
    # of the schedule.
    model, params, src, trg, meta = _setup()
    ref = _ref_loss(model, params, src, trg, meta)
    got = jax.jit(
        lambda p: pp_loss(
            p, src, trg, meta, CFG, _pipe_mesh(), microbatches=2
        )
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pp_gradients_match_single_device():
    model, params, src, trg, meta = _setup()
    g_ref = jax.grad(
        lambda p: _ref_loss(model, p, src, trg, meta)
    )(params)
    g_pp = jax.jit(jax.grad(
        lambda p: pp_loss(p, src, trg, meta, CFG, _pipe_mesh())
    ))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        # Tolerance accommodates fp32 reduction-order noise from the
        # microbatch split + psum (loss parity holds at rtol 1e-5; the
        # worst grad element differs ~3e-6 abs / 9e-4 rel on CPU).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_dp_crossed_mesh_matches():
    # 2-way DP x 4-stage PP on the 8-device mesh: microbatches split over
    # 'data', layers over 'pipe'.
    model, params, src, trg, meta = _setup(batch=8)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    ref = _ref_loss(model, params, src, trg, meta)
    got = jax.jit(
        lambda p: pp_loss(
            p, src, trg, meta, CFG, mesh, microbatches=4, data_axis="data"
        )
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pp_training_descends():
    model, params, src, trg, meta = _setup()
    opt = make_optimizer()
    step = make_pp_train_step(model, opt, _pipe_mesh())
    state = opt.init(params)
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, src, trg, meta)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.05, losses


def test_pp_rejects_bad_shapes():
    import dataclasses

    model, params, src, trg, meta = _setup()
    with pytest.raises(ValueError, match="microbatches"):
        pp_loss(params, src, trg, meta, CFG, _pipe_mesh(), microbatches=3)
    with pytest.raises(ValueError, match="divide"):
        pp_loss(
            params, src, trg, meta,
            dataclasses.replace(CFG, n_layers=3), _pipe_mesh(),
        )
