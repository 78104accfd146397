"""Diffusion subsystem tests: schedule math, jump schedule validity,
respacing, q/p consistency, training step decreases loss, RePaint
inpainting preserves the known region, canvas codec round trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.diffusion import (
    DiffusionDefaults,
    DiffusionSchedule,
    GaussianDiffusion,
    MeanType,
    RandomSnippet,
    RePaintConf,
    SpacedDiffusion,
    UNetConfig,
    UNetModel,
    VarType,
    canvas_to_notes,
    create_canvas,
    denormalize_canvas,
    get_schedule_jump,
    normalize_canvas,
    space_timesteps,
)
from musicgen_tpu.diffusion.trainer import make_diffusion_train_step
from musicgen_tpu.midi import MidiNote, adjust_note_time
import optax


def test_linear_schedule_values():
    s = DiffusionSchedule.named("linear", 1000)
    assert s.betas[0] == pytest.approx(1e-4)
    assert s.betas[-1] == pytest.approx(0.02)
    assert np.all(s.posterior_variance >= 0)
    # T=100 rescales endpoints by 10x
    s2 = DiffusionSchedule.named("linear", 100)
    assert s2.betas[0] == pytest.approx(1e-3)


def test_jump_schedule_valid():
    times = get_schedule_jump(t_T=50, n_sample=1, jump_length=10, jump_n_sample=3)
    # check_times runs inside; also verify resampling actually happens
    ups = sum(1 for a, b in zip(times[:-1], times[1:]) if b > a)
    assert ups > 0
    assert times[-1] == -1


def test_space_timesteps():
    sel = space_timesteps(1000, "ddim50")
    assert len(sel) == 50
    sel2 = space_timesteps(100, [10])
    assert len(sel2) == 10
    assert 0 in sel2 and 99 in sel2


def test_respaced_chain_marginals():
    """Respaced chain must preserve the cumulative alphas at kept steps."""
    sd = SpacedDiffusion.create(num_timesteps=100, timestep_respacing="ddim10")
    base = DiffusionSchedule.named("linear", 100)
    kept = sd.timestep_map
    np.testing.assert_allclose(
        sd.base.schedule.alphas_cumprod,
        base.alphas_cumprod[kept],
        rtol=1e-10,
    )


def test_q_sample_snr():
    s = DiffusionSchedule.named("linear", 100)
    d = GaussianDiffusion(s, var_type=VarType.FIXED_SMALL)
    x0 = jnp.ones((2, 1, 4, 4))
    noise = jnp.zeros_like(x0)
    # zero noise -> pure signal scaling
    xt = d.q_sample(x0, jnp.asarray([0, 99]), noise)
    assert float(xt[0].mean()) > float(xt[1].mean())


class TinyUNet(UNetModel):
    pass


def _tiny_model_and_diffusion():
    cfg = UNetConfig(
        in_channels=2, model_channels=8, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
    )
    model = UNetModel(cfg, dtype=jnp.float32)
    sd = SpacedDiffusion.create(num_timesteps=100, timestep_respacing="ddim25")
    return model, sd


def test_unet_shapes():
    model, _ = _tiny_model_and_diffusion()
    x = jnp.zeros((2, 2, 16, 16))
    t = jnp.asarray([0, 5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 4, 16, 16)


def test_diffusion_training_step_decreases_loss():
    model, sd = _tiny_model_and_diffusion()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 2, 16, 16)) * 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,), jnp.int32))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_diffusion_train_step(model, sd, optimizer, ema_rate=0.5)
    ema = jax.tree.map(jnp.array, params)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(10):
        params, ema, opt_state, loss, _ = step(params, ema, opt_state, x, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    # EMA trails the live params (rate 0.5 over 10 steps: close but not equal)
    pl = jax.tree_util.tree_leaves(params)
    el = jax.tree_util.tree_leaves(ema)
    total = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(pl, el))
    assert total > 0.0


def test_repaint_inpainting_preserves_known_region():
    model, sd = _tiny_model_and_diffusion()
    x = jnp.zeros((1, 2, 16, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    model_fn = lambda xx, tt: model.apply(params, xx, tt)

    gt = jnp.ones((1, 2, 16, 16)) * 0.8
    mask = jnp.zeros((1, 2, 16, 16)).at[:, :, :8, :].set(1.0)
    conf = RePaintConf(schedule_jump_params=dict(
        t_T=sd.num_timesteps, n_sample=1, jump_length=5, jump_n_sample=2))
    assert sd.num_timesteps == 25
    out = sd.p_sample_loop(
        model_fn, (1, 2, 16, 16), jax.random.PRNGKey(2),
        gt=gt, gt_keep_mask=mask, times=conf.jump_times(),
    )
    out = np.asarray(out)
    known = out[:, :, :8, :]
    # Known region must be close to ground truth (final step injects
    # near-noiseless gt); unknown region is whatever the model dreams.
    assert np.abs(known - 0.8).mean() < 0.25
    assert np.isfinite(out).all()


def test_canvas_roundtrip():
    tempo = 120
    res = 60.0 / tempo / 64
    notes = [
        MidiNote(pitch=60, time_start=0.0, time_end=16 * res, dynamic=90, channel=0, tempo=tempo),
        MidiNote(pitch=64, time_start=8 * res, time_end=24 * res, dynamic=70, channel=2, tempo=tempo),
        MidiNote(pitch=60, time_start=16 * res, time_end=32 * res, dynamic=90, channel=0, tempo=tempo),
    ]
    canvas = create_canvas([MidiNote(**vars(n)) for n in notes])
    assert canvas.shape[0] == 4 and canvas.shape[1] == 128
    # normalize/denormalize round trip
    back = denormalize_canvas(normalize_canvas(canvas))
    np.testing.assert_allclose(back[1], canvas[1], atol=0.51)

    recovered = canvas_to_notes(canvas)
    grid = [MidiNote(**vars(n)) for n in recovered]
    adjust_note_time(grid)
    keys = sorted((n.pitch, n.time_start, n.time_end, n.dynamic, n.channel) for n in grid)
    orig = [MidiNote(**vars(n)) for n in notes]
    adjust_note_time(orig)
    expected = sorted((n.pitch, n.time_start, n.time_end, n.dynamic, n.channel) for n in orig)
    assert keys == expected


def test_random_snippet():
    c = np.random.default_rng(0).standard_normal((4, 128, 50)).astype(np.float32)
    rs = RandomSnippet([c], width=16)
    batch = rs.sample(3)
    assert batch.shape == (3, 4, 128, 16)


def test_superres_and_encoder_unet_shapes():
    from musicgen_tpu.diffusion import SuperResModel, EncoderUNetModel

    cfg = UNetConfig(
        in_channels=2, model_channels=8, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
    )
    sr = SuperResModel(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 2, 16, 16))
    low = jnp.zeros((1, 2, 8, 8))
    t = jnp.asarray([3])
    params = sr.init(jax.random.PRNGKey(0), x, t, low)
    out = sr.apply(params, x, t, low)
    assert out.shape == (1, 4, 16, 16)

    enc = EncoderUNetModel(cfg, num_classes=7, dtype=jnp.float32)
    p2 = enc.init(jax.random.PRNGKey(0), x, t)
    logits = enc.apply(p2, x, t)
    assert logits.shape == (1, 7)


def test_encoder_unet_pool_variants():
    """All four reference pooling heads (unet.py:841-871) produce (B, K)."""
    from musicgen_tpu.diffusion import EncoderUNetModel
    import dataclasses

    base = UNetConfig(
        in_channels=2, model_channels=8, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
    )
    x = jnp.zeros((2, 2, 16, 16))
    t = jnp.asarray([3, 7])
    for pool in ("adaptive", "attention", "spatial", "spatial_v2"):
        cfg = base
        if pool == "attention":
            cfg = dataclasses.replace(base, num_head_channels=4)
        enc = EncoderUNetModel(cfg, num_classes=5, pool=pool, dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x, t)
        logits = enc.apply(params, x, t)
        assert logits.shape == (2, 5), pool
        assert np.isfinite(np.asarray(logits)).all(), pool


def test_attention_pool2d_permutation_behavior():
    """AttentionPool2d pools over spatial positions: permuting the spatial
    layout changes only via the positional embedding; with pos emb zeroed it
    must be permutation-invariant (a pure attention pool)."""
    from musicgen_tpu.diffusion.unet import AttentionPool2d
    import flax

    pool = AttentionPool2d(num_head_channels=4, output_dim=6, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    params = pool.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(params)
    params["params"]["positional_embedding"] = jnp.zeros_like(
        params["params"]["positional_embedding"]
    )
    params = flax.core.freeze(params)
    out1 = pool.apply(params, x)
    perm = rng.permutation(16)
    xp = x.reshape(1, 16, 8)[:, perm].reshape(1, 4, 4, 8)
    out2 = pool.apply(params, xp)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    assert out1.shape == (1, 6)


def test_update_ema():
    from musicgen_tpu.diffusion.trainer import update_ema

    ema = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    new = {"w": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = update_ema(ema, new, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.1)


def test_unet_remat_matches_plain():
    """use_checkpoint (flax remat) must not change values or gradients."""
    import dataclasses

    model, _ = _tiny_model_and_diffusion()
    cfg_remat = dataclasses.replace(model.cfg, use_checkpoint=True)
    model_r = UNetModel(cfg_remat, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 16, 16)),
                    jnp.float32)
    t = jnp.asarray([5])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out_a = model.apply(params, x, t)
    out_b = model_r.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(model_r.apply(p, x, t) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_p_sample_loop_scan_matches_python_loop():
    """The one-dispatch scan trajectory equals the per-timestep Python loop
    bit-for-bit (same RNG splitting order), including RePaint jumps."""
    from musicgen_tpu.diffusion import RePaintConf

    model, sd = _tiny_model_and_diffusion()
    x = jnp.zeros((1, 2, 16, 16))
    t = jnp.asarray([0])
    params = model.init(jax.random.PRNGKey(0), x, t)
    model_fn = lambda xx, tt: model.apply(params, xx, tt)

    conf = RePaintConf(schedule_jump_params=dict(
        t_T=sd.num_timesteps, n_sample=1, jump_length=3, jump_n_sample=2,
    ))
    times = conf.jump_times()
    gt = jnp.zeros((1, 2, 16, 16))
    keep = jnp.ones((1, 2, 16, 16)).at[:, :, :, 8:].set(0.0)

    a = sd.p_sample_loop(model_fn, (1, 2, 16, 16), jax.random.PRNGKey(3),
                         gt=gt, gt_keep_mask=keep, times=times)
    b = sd.p_sample_loop_scan(model_fn, (1, 2, 16, 16), jax.random.PRNGKey(3),
                              gt=gt, gt_keep_mask=keep, times=times)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
