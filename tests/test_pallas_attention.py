"""Pallas flash rel-pos attention vs the XLA truth oracle (interpret mode on
CPU; the driver/TPU runs it compiled). Tolerances are bf16-scale: the kernel
feeds its matmuls bf16 inputs with f32 accumulation, matching XLA's default
f32-matmul precision on TPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.ops.attention import relpos_attention
from musicgen_tpu.ops.pallas_attention import flash_relpos_attention


def _inputs(rng, b=1, h=2, t=256, d=128):
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((h, t, d)), jnp.float32)
    return q, k, v, rel


@pytest.mark.parametrize("t", [256, 384])
def test_flash_matches_xla(t):
    rng = np.random.default_rng(0)
    q, k, v, rel = _inputs(rng, t=t)
    scale = 0.03125
    ref = relpos_attention(q, k, v, rel, scale)
    got = flash_relpos_attention(q, k, v, rel, scale, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_unaligned_t():
    rng = np.random.default_rng(1)
    q, k, v, rel = _inputs(rng, t=200, d=128)
    scale = 0.1
    ref = relpos_attention(q, k, v, rel, scale)
    got = flash_relpos_attention(q, k, v, rel, scale, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_multihead_batch():
    rng = np.random.default_rng(2)
    q, k, v, rel = _inputs(rng, b=2, h=3, t=256, d=128)
    scale = 0.05
    ref = relpos_attention(q, k, v, rel, scale)
    got = flash_relpos_attention(q, k, v, rel, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_backward_matches_xla_grads():
    """custom_vjp backward (dQ/dK/dV/dRel) vs jax.grad through the XLA
    oracle, at bf16-matmul tolerance. Covers the banded dRel accumulation
    and the inverse shear (stride = L-1 === -1 mod L roll)."""
    from musicgen_tpu.ops.pallas_attention import flash_relpos_attention_train

    b, h, t, d = 1, 2, 256, 128
    scale = 1.0 / np.sqrt(h * d)
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    rel = jnp.asarray(rng.standard_normal((h, t, d)) * 0.02, jnp.float32)

    def loss_ref(q, k, v, rel):
        return jnp.sum(relpos_attention(q, k, v, rel, scale) ** 2)

    def loss_flash(q, k, v, rel):
        return jnp.sum(
            flash_relpos_attention_train(q, k, v, rel, scale, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_fla = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, a, b_ in zip("dq dk dv drel".split(), g_ref, g_fla):
        err = float(jnp.max(jnp.abs(a - b_)))
        den = float(jnp.max(jnp.abs(a))) + 1e-9
        assert err / den < 3e-2, f"{name}: rel err {err / den}"


def test_flash_backward_unaligned_t():
    """Pad path: gradients must not leak into/out of the padded region."""
    from musicgen_tpu.ops.pallas_attention import flash_relpos_attention_train

    b, h, t, d = 1, 1, 198, 128
    scale = 1.0 / np.sqrt(h * d)
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        for _ in range(3)
    )
    rel = jnp.asarray(rng.standard_normal((h, t, d)) * 0.02, jnp.float32)

    def loss_ref(q, k, v, rel):
        return jnp.sum(relpos_attention(q, k, v, rel, scale) ** 2)

    def loss_flash(q, k, v, rel):
        return jnp.sum(
            flash_relpos_attention_train(q, k, v, rel, scale, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, rel)
    g_fla = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, rel)
    for name, a, b_ in zip("dq dk dv drel".split(), g_ref, g_fla):
        err = float(jnp.max(jnp.abs(a - b_)))
        den = float(jnp.max(jnp.abs(a))) + 1e-9
        assert err / den < 3e-2, f"{name}: rel err {err / den}"


def test_flash_with_longer_rel_buffer():
    """Model configured for a longer block than the training sequence: the
    flash path must slice the learned rel buffer to T rows like the XLA
    path does (regression: convergence run at --block-len 1024 with the
    default block-2048 config crashed the fused train path)."""
    import numpy as np

    from musicgen_tpu.ops.pallas_attention import flash_relpos_attention_train

    rng = np.random.default_rng(5)
    b, h, t, d = 1, 2, 64, 32
    buf_rows = 2 * t  # longer learned buffer
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((h, buf_rows, d)), jnp.float32)
    scale = 0.1

    ref = relpos_attention(q, k, v, rel, scale)
    got = flash_relpos_attention(q, k, v, rel, scale, block_q=32, block_k=32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss_flash(rel):
        return jnp.sum(
            flash_relpos_attention_train(
                q, k, v, rel, scale, block_q=32, block_k=32, interpret=True
            )
            ** 2
        )

    def loss_ref(rel):
        return jnp.sum(relpos_attention(q, k, v, rel, scale) ** 2)

    g_got = jax.grad(loss_flash)(rel)
    g_ref = jax.grad(loss_ref)(rel)
    assert g_got.shape == (h, buf_rows, d)
    # unused buffer rows must get zero cotangent
    np.testing.assert_allclose(np.asarray(g_got[:, t:, :]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_got[:, :t, :]), np.asarray(g_ref[:, :t, :]),
        rtol=5e-2, atol=5e-2,
    )
