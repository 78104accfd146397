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
from musicgen_tpu.parallel.pipeline import (
    default_microbatches,
    make_pp_train_step,
    pp_format,
    pp_init,
    pp_loss,
    pp_opt_state_unformat,
    pp_unformat,
)
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


def test_pp_training_descends_with_sharded_state():
    model, params, src, trg, meta = _setup()
    opt = make_optimizer()
    mesh = _pipe_mesh()
    ppp, opt_state, shard, opt_shard = pp_init(params, opt, mesh, CFG)

    # Persistent state is sharded at rest: each device holds L/S layers
    # and 1/S of each vocab-sized matrix (+ the matching Adam moments).
    lay0 = jax.tree.leaves(ppp["layers"])[0]
    assert lay0.addressable_shards[0].data.shape[0] == CFG.n_layers // 4
    tok_rows = ppp["tok_emb"].shape[0]
    assert ppp["tok_emb"].addressable_shards[0].data.shape[0] <= -(-tok_rows // 4)
    hk_cols = ppp["head_kernel"].shape[1]
    assert ppp["head_kernel"].addressable_shards[0].data.shape[1] <= -(-hk_cols // 4)
    mu = jax.tree.leaves(opt_state[0].mu["layers"])[0]
    assert mu.addressable_shards[0].data.shape[0] == CFG.n_layers // 4

    step = make_pp_train_step(
        model, opt, mesh, shardings=shard, opt_shardings=opt_shard
    )
    losses = []
    for _ in range(6):
        ppp, opt_state, loss = step(ppp, opt_state, src, trg, meta)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert losses[-1] < losses[0] - 0.05, losses

    # The step preserves the stage placement (donation keeps 1/S steady
    # state) and the updated params round-trip to model format.
    assert ppp["tok_emb"].sharding.spec == shard["tok_emb"].spec
    back = pp_unformat(jax.device_get(ppp), CFG)
    ref = _ref_loss(model, back, src, trg, meta)
    got = jax.jit(
        lambda p: pp_loss(p, src, trg, meta, CFG, mesh)
    )(back)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    st = pp_opt_state_unformat(jax.device_get(opt_state), CFG)
    tmpl = opt.init(params)
    assert jax.tree.structure(st) == jax.tree.structure(tmpl)


def test_pp_format_roundtrip():
    model, params, src, trg, meta = _setup()
    back = pp_unformat(pp_format(params, CFG), CFG)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree.leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_microbatches():
    assert default_microbatches(4, 4) == 4
    assert default_microbatches(64, 4) == 16   # 4*S for the bubble
    assert default_microbatches(64, 8) == 32
    assert default_microbatches(6, 4) == 6
    assert default_microbatches(2, 4) == 2
    assert default_microbatches(7, 4) == 7     # prime batch: per-example


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


# ---------------------------------------------------------------------------
# Transformer pipeline parallelism (VERDICT r4 #7: second family)
# ---------------------------------------------------------------------------

from musicgen_tpu.config import TransformerConfig
from musicgen_tpu.models.transformer import TransformerLM

TCFG = TransformerConfig(
    n_embd=32, n_heads=4, n_layer=4, block_len=T, dropout=0.0,
    vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
)


def _tsetup(batch=4):
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (batch, T)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, VOCAB.vocab_size, (batch, T)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 9, (batch, NUM_META)), jnp.int32)
    model = TransformerLM(TCFG)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    return model, params, src, trg, meta


def test_pp_transformer_loss_matches_single_device():
    model, params, src, trg, meta = _tsetup()
    ref = _ref_loss(model, params, src, trg, meta)
    got = jax.jit(
        lambda p: pp_loss(p, src, trg, meta, TCFG, _pipe_mesh())
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pp_transformer_gradients_match_single_device():
    model, params, src, trg, meta = _tsetup()
    g_ref = jax.grad(lambda p: _ref_loss(model, p, src, trg, meta))(params)
    g_pp = jax.jit(jax.grad(
        lambda p: pp_loss(p, src, trg, meta, TCFG, _pipe_mesh())
    ))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pp_transformer_training_descends_with_sharded_state():
    model, params, src, trg, meta = _tsetup()
    opt = make_optimizer()
    mesh = _pipe_mesh()
    ppp, opt_state, shard, opt_shard = pp_init(params, opt, mesh, TCFG)
    lay0 = jax.tree.leaves(ppp["layers"])[0]
    assert lay0.addressable_shards[0].data.shape[0] == TCFG.n_layer // 4
    step = make_pp_train_step(
        model, opt, mesh, shardings=shard, opt_shardings=opt_shard
    )
    losses = []
    for _ in range(6):
        ppp, opt_state, loss = step(ppp, opt_state, src, trg, meta)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses
    back = pp_unformat(jax.device_get(ppp), TCFG)
    ref = _ref_loss(model, back, src, trg, meta)
    got = jax.jit(lambda p: pp_loss(p, src, trg, meta, TCFG, mesh))(back)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_pp_transformer_format_roundtrip():
    model, params, *_ = _tsetup()
    back = pp_unformat(pp_format(params, TCFG), TCFG)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree.leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
