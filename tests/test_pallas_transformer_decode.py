"""Fused full-model transformer decode kernel vs the XLA ring-KV oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicgen_tpu.config import NUM_META, TransformerConfig
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.ops.pallas_transformer_decode import (
    TDims,
    build_transformer_decode_params,
    fused_transformer_logits_step,
    fused_transformer_sample_step,
    stack_transformer_cache,
)
from musicgen_tpu.sample.cache import step_geometry, token_slot

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def small_setup():
    # Full-window regime: prompt length == block_len (the fused kernel's
    # steady-state precondition; generate() gates on it).
    cfg = TransformerConfig(
        n_embd=256, n_heads=4, n_layer=3, block_len=32, attention_impl="xla"
    )
    model = TransformerLM(cfg)
    rng = np.random.default_rng(0)
    b, p = 2, cfg.block_len
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, p)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    logits0, caches = model.apply(
        params, prompt, meta, method=TransformerLM.prefill
    )
    return cfg, model, params, prompt, meta, logits0, caches


def _xla_step(model, cfg, params, tok, caches, stream_idx):
    total = stream_idx + 1
    ages, rel_base = step_geometry(total, cfg.block_len)
    slot = token_slot(jnp.int32(stream_idx), cfg.block_len)
    return model.apply(
        params, tok, caches, slot, ages, rel_base, method=TransformerLM.step
    )


@pytest.mark.parametrize("quant", ["bf16", "int8w"])
def test_fused_transformer_step_matches_xla_step(small_setup, quant):
    cfg, model, params, prompt, meta, logits0, caches = small_setup
    b, p = prompt.shape
    dims = TDims.create(cfg, b)
    tp = build_transformer_decode_params(params, cfg, b, quant=quant)
    carry = stack_transformer_cache(caches, dims)

    tol = 0.05 if quant == "bf16" else 0.12
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    xla_caches = caches
    # Drive past one full ring wrap to exercise every slot position.
    for step in range(p + 4):
        stream_idx = jnp.int32(p + step)
        ref_logits, xla_caches = _xla_step(
            model, cfg, params, tok, xla_caches, stream_idx
        )
        fused_logits, carry = fused_transformer_logits_step(
            tp, tok, carry, cfg, dims, stream_idx,
            interpret=INTERPRET, quant=quant,
        )
        np.testing.assert_allclose(
            np.asarray(fused_logits),
            np.asarray(ref_logits),
            rtol=tol,
            atol=tol * float(jnp.abs(ref_logits).max()),
            err_msg=f"step {step} ({quant})",
        )
        tok = jnp.argmax(ref_logits, -1).astype(jnp.int32)


def test_fused_tail_matches_xla_tail(small_setup):
    from musicgen_tpu.ops.grammar import filtered_logits
    from musicgen_tpu.sample.sampler import (
        _iter_top_k,
        field_bucket,
        penalty_divisor,
    )

    cfg, model, params, prompt, meta, logits0, caches = small_setup
    b, p = prompt.shape
    dims = TDims.create(cfg, b)
    tp = build_transformer_decode_params(params, cfg, b, quant="bf16")
    carry = stack_transformer_cache(caches, dims)
    rng = np.random.default_rng(3)
    hist = jnp.zeros((b, cfg.vocab_size), jnp.int32)
    hist = hist.at[
        jnp.arange(b)[:, None],
        jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 40))),
    ].add(1)
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    bucket_oh = jax.nn.one_hot(field_bucket(tok), 8)

    stream_idx = jnp.int32(p)
    ref_logits, _ = _xla_step(model, cfg, params, tok, caches, stream_idx)
    w = filtered_logits(tok, ref_logits) / penalty_divisor(hist)
    ref_vals, ref_idxs = _iter_top_k(w, 3)

    vals, idxs, _ = fused_transformer_sample_step(
        tp, tok, carry, hist, bucket_oh, cfg, dims, stream_idx,
        interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idxs))
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=0.05, atol=1e-3
    )


def test_generate_fused_matches_xla_greedy(small_setup):
    """End-to-end greedy parity: generate(fused=True) == generate(fused=False)."""
    from musicgen_tpu.sample.sampler import generate

    cfg, model, params, prompt, meta, logits0, caches = small_setup
    rng = jax.random.PRNGKey(7)
    kw = dict(
        kind="transformer", prompt=prompt, meta=meta, num_tokens=12,
        block_len=cfg.block_len, rng=rng, greedy=True, jit=True,
    )
    ref = generate(model, params, fused=False, **kw)
    got = generate(model, params, fused=True, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_vmem_admission_full_size():
    """VMEM admission regression (r4 fidelity-campaign crash): at the FULL
    production geometry the estimator must admit the measured-good batch 2
    and reject batch 4 bf16 (Mosaic dump 152.38M vs the 128M chip ceiling,
    experiments/r4/fidelity_transformer.log)."""
    from musicgen_tpu.config import TransformerConfig
    from musicgen_tpu.models.registry import init_params
    from musicgen_tpu.models.transformer import TransformerLM
    from musicgen_tpu.ops.pallas_transformer_decode import (
        FUSED_VMEM_CEILING,
        fused_vmem_bytes,
        fused_vmem_fits,
    )

    cfg = TransformerConfig()
    params = init_params(TransformerLM(cfg), "transformer", block_len=64)
    assert fused_vmem_fits(params, cfg, 2, "bf16", tail=True)
    assert fused_vmem_fits(params, cfg, 2, "int8w", tail=True)
    assert not fused_vmem_fits(params, cfg, 4, "bf16", tail=True)
    assert not fused_vmem_fits(params, cfg, 8, "int8w", tail=True)
    # The estimator reproduces the measured B=4 OOM within its documented
    # ~15% Mosaic slack: 152.38M reported.
    est = fused_vmem_bytes(params, cfg, 4, "bf16", tail=True)
    assert 0.75 * 152.38e6 < est < 152.38e6 * 1.05
    assert FUSED_VMEM_CEILING < 116 * 1024 * 1024  # below the kernel request
