"""GPTQ calibrated int8 (ops/gptq.py): format parity with the RTN packer,
functional-error win over RTN on correlated inputs, and end-to-end
consumption by build_decode_params(quantizer=...)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.config import MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.models.registry import init_params
from musicgen_tpu.ops.gptq import (
    collect_hessians,
    gptq_quantize,
    make_gptq_quantizer,
)
from musicgen_tpu.ops.pallas_decode import _quantize_cols


def _dequant(q, s, group):
    k = q.shape[0]
    g = s.shape[0]
    grp = k // g
    return (q.reshape(g, grp, -1).astype(np.float64) * np.asarray(s, np.float64)[:, None, :]).reshape(q.shape)


def _correlated_problem(seed, k=256, n=96, nx=2048, rank=16):
    rng = np.random.default_rng(seed)
    # Low-rank-dominated inputs — the correlation structure of real
    # activations, which is exactly what GPTQ's compensation exploits.
    basis = rng.standard_normal((rank, k))
    x = rng.standard_normal((nx, rank)) @ basis
    x += 0.05 * rng.standard_normal((nx, k))
    w = rng.standard_normal((k, n)) / np.sqrt(k)
    # A few outlier rows so the K-group scales matter.
    w[rng.integers(0, k, 4), :] *= 8.0
    h = x.T @ x / nx
    return x, w, h


def test_format_matches_rtn_packer():
    _, w, h = _correlated_problem(0, k=128, n=32)
    q, s = gptq_quantize(w, h, group=64)
    q0, s0 = _quantize_cols(jnp.asarray(w), group=64)
    assert q.shape == q0.shape and q.dtype == np.int8
    assert s.shape == np.asarray(s0).shape and s.dtype == np.float32
    # The FIRST group's scale is set before any compensation shifts weights,
    # so it matches RTN's exactly.
    np.testing.assert_allclose(s[0], np.asarray(s0)[0], rtol=1e-6)


@pytest.mark.parametrize("group", [64, 256])
def test_gptq_beats_rtn_functional_error(group):
    x, w, h = _correlated_problem(1, k=256, n=96)

    def rtn(maxq):
        k = w.shape[0]
        g = k // group
        wg = w.reshape(g, group, -1)
        s = np.maximum(np.max(np.abs(wg), axis=1) / maxq, 1e-20)
        q = np.clip(np.round(wg / s[:, None, :]), -maxq, maxq)
        return (q * s[:, None, :]).reshape(w.shape)

    # The margin must hold at int8 itself (the kernel's format) — verified
    # equivalent to exact greedy OBQ, and ~4x under RTN on this problem.
    q_g8, s_g8 = gptq_quantize(w, h, group=group)
    err_gptq8 = np.linalg.norm(x @ (w - _dequant(q_g8, s_g8, group)))
    err_rtn8 = np.linalg.norm(x @ (w - rtn(127.0)))
    assert err_gptq8 < 0.5 * err_rtn8, (err_gptq8, err_rtn8)

    # And at 3-bit, where compensation dominates completely.
    q_g, s_g = gptq_quantize(w, h, group=group, maxq=7.0)
    err_gptq = np.linalg.norm(x @ (w - _dequant(q_g, s_g, group)))
    err_rtn = np.linalg.norm(x @ (w - rtn(7.0)))
    assert err_gptq < 0.5 * err_rtn, (err_gptq, err_rtn)


def test_identity_hessian_is_near_rtn():
    # With uncorrelated inputs there is nothing to exploit; GPTQ should not
    # be (much) worse than RTN in plain weight error.
    rng = np.random.default_rng(2)
    w = rng.standard_normal((128, 48))
    q_g, s_g = gptq_quantize(w, np.eye(128), group=128)
    q_r, s_r = _quantize_cols(jnp.asarray(w), group=128)
    e_g = np.linalg.norm(w - _dequant(q_g, s_g, 128))
    e_r = np.linalg.norm(w - _dequant(np.asarray(q_r), np.asarray(s_r), 128))
    assert e_g < 1.1 * e_r


def _tiny_cfg():
    return MambaConfig(
        d_model=64, n_layers=2, d_state=16, headdim=16, d_conv=4, expand=2
    )


def test_collect_hessians_and_build():
    cfg = _tiny_cfg()
    model = MambaLM(cfg)
    params = init_params(model, "mamba", block_len=32)
    key = jax.random.PRNGKey(0)
    toks = jax.random.randint(key, (2, 32), 0, cfg.vocab_size)
    meta = jnp.zeros((2, 6), jnp.int32)
    hs = collect_hessians(model, params, [(toks, meta)])
    assert "lm_head" in hs and "layer_0/in_proj" in hs and "layer_1/out_proj" in hs
    assert hs["lm_head"].shape == (cfg.d_model, cfg.d_model)
    # Moments are PSD with positive diagonal (live inputs).
    assert np.all(np.diag(hs["layer_0/in_proj"]) > 0)

    from musicgen_tpu.ops.pallas_decode import build_decode_params

    dp_rtn = build_decode_params(params, cfg, batch=2, quant="int8w")
    dp_gptq = build_decode_params(
        params, cfg, batch=2, quant="int8w",
        quantizer=make_gptq_quantizer(hs),
    )
    assert dp_gptq["w_in"].shape == dp_rtn["w_in"].shape
    assert dp_gptq["w_in"].dtype == jnp.int8
    assert dp_gptq["lm_s"].shape == dp_rtn["lm_s"].shape
    # Calibration changed the pack (compensation is active)...
    assert not np.array_equal(np.asarray(dp_gptq["w_in"]), np.asarray(dp_rtn["w_in"]))
    # ...but the packs dequantize to nearby weights (sanity: same scale law).
    g = dp_rtn["w_in_s"].shape[1]
    for dp in (dp_rtn, dp_gptq):
        w0 = _dequant(
            np.asarray(dp["w_in"][0]), np.asarray(dp["w_in_s"][0]),
            dp["w_in"].shape[1] // g,
        )
        ref = np.asarray(params["params"]["layer_0"]["in_proj"]["kernel"])
        assert np.abs(w0[:, : ref.shape[1]] - ref).max() < 0.15


def test_generate_with_gptq_pack():
    """End-to-end: GPTQ pack through the fused decode kernel (interpret)."""
    from musicgen_tpu.ops.grammar import field_bucket
    from musicgen_tpu.ops.pallas_decode import build_decode_params
    from musicgen_tpu.sample.sampler import generate

    cfg = MambaConfig(d_model=256, n_layers=2)
    model = MambaLM(cfg)
    params = init_params(model, "mamba", block_len=32)
    key = jax.random.PRNGKey(1)
    prompt = jax.random.randint(key, (2, 32), 0, cfg.vocab_size).astype(jnp.int32)
    meta = jnp.zeros((2, 6), jnp.int32)
    hs = collect_hessians(model, params, [(prompt, meta)])
    pack = build_decode_params(
        params, cfg, 2, quant="int8w", quantizer=make_gptq_quantizer(hs)
    )
    streams = generate(
        model, params, "mamba", prompt, meta, 6, 32,
        jax.random.PRNGKey(0), fused=True, quant="int8w", decode_pack=pack,
    )
    assert streams.shape == (2, 38)
    new = np.asarray(streams[:, 32:])
    assert (new >= 0).all() and (new < cfg.vocab_size).all()
    prev = np.asarray(prompt[:, -1])
    for t in range(new.shape[1]):
        pb = field_bucket(jnp.asarray(prev))
        nb = field_bucket(jnp.asarray(new[:, t]))
        for b_ in range(new.shape[0]):
            allowed = {0: [1], 1: [2], 2: [3, 4], 3: [4], 4: [0]}[int(pb[b_])]
            assert int(nb[b_]) in allowed
        prev = new[:, t]


def test_xlstm_gptq_pack_generate():
    """xLSTM: calibrate at XLSTM_CALIB_SITES, build the GPTQ int8w pack,
    and decode end-to-end through the fused kernel (interpret)."""
    from musicgen_tpu.config import NUM_META, XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMLM
    from musicgen_tpu.ops.gptq import XLSTM_CALIB_SITES
    from musicgen_tpu.ops.pallas_xlstm_decode import build_xlstm_decode_params
    from musicgen_tpu.sample.sampler import generate

    cfg = XLSTMConfig(embedding_dim=256, num_blocks=3, slstm_at=(1,))
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (2, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    hs = collect_hessians(model, params, [(prompt, meta)], sites=XLSTM_CALIB_SITES)
    assert "stack/block_0/mlstm/up_proj" in hs
    assert "stack/block_1/slstm/w_i" in hs and "stack/block_1/slstm/w_z" in hs
    assert "stack/block_1/ffn/up" in hs and "lm_head" in hs
    pack_rtn = build_xlstm_decode_params(params, cfg, 2, quant="int8w")
    pack = build_xlstm_decode_params(
        params, cfg, 2, quant="int8w", quantizer=make_gptq_quantizer(hs)
    )
    assert pack["s_w_if"].dtype == jnp.int8
    assert not np.array_equal(np.asarray(pack["m_w_up"]), np.asarray(pack_rtn["m_w_up"]))
    streams = generate(
        model, params, "xlstm", prompt, meta, 6, 32,
        jax.random.PRNGKey(0), fused=True, quant="int8w", decode_pack=pack,
    )
    assert streams.shape == (2, 38)
    new = np.asarray(streams[:, 32:])
    assert (new >= 0).all() and (new < cfg.vocab_size).all()
