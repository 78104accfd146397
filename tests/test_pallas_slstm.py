"""Pallas fused sLSTM kernel vs the lax.scan truth oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from musicgen_tpu.ops.pallas_slstm import slstm_pallas
from musicgen_tpu.ops.slstm import slstm_sequential


def test_pallas_slstm_matches_scan():
    rng = np.random.default_rng(0)
    b, t, h, dh = 2, 32, 2, 128
    wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)

    h_ref, s_ref = slstm_sequential(wx, r, bias)
    h_got, s_got = slstm_pallas(wx, r, bias, chunk=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_ref), rtol=2e-4, atol=2e-4
    )
    for a, b_ in zip(s_got, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


def test_pallas_slstm_multichunk_state_carry():
    rng = np.random.default_rng(1)
    b, t, h, dh = 1, 64, 1, 128
    wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)
    h_ref, _ = slstm_sequential(wx, r, bias)
    h_got, _ = slstm_pallas(wx, r, bias, chunk=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_ref), rtol=2e-4, atol=2e-4
    )


def test_pallas_slstm_ragged_t_state_masking():
    """T not a multiple of chunk: pad steps must not pollute the state."""
    rng = np.random.default_rng(2)
    b, t, h, dh = 2, 38, 2, 128
    wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)
    h_ref, s_ref = slstm_sequential(wx, r, bias)
    h_got, s_got = slstm_pallas(wx, r, bias, chunk=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_got), np.asarray(h_ref), rtol=2e-4, atol=2e-4
    )
    for a, b_ in zip(s_got, s_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)
