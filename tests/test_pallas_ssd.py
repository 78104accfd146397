"""Pallas SSD kernel vs the sequential truth oracle (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from musicgen_tpu.ops.pallas_ssd import ssd_chunked_pallas
from musicgen_tpu.ops.ssm import ssd_reference


def _inputs(rng, b=2, t=64, h=4, p=64, g=1, n=64):
    x = jnp.asarray(rng.standard_normal((b, t, h, p)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.5, (b, t, h)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.5, 4.0, (h,)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    return x, dt, A, B, C


# NB: the kernel feeds its matmuls bf16 inputs (f32 accumulation) — the same
# precision XLA uses for f32 matmuls on TPU — so tolerances are bf16-scale.
def test_pallas_ssd_matches_reference():
    rng = np.random.default_rng(0)
    x, dt, A, B, C = _inputs(rng)
    y_p, s_p = ssd_chunked_pallas(x, dt, A, B, C, chunk=32, interpret=True)
    y_r, s_r = ssd_reference(x, dt, A, B, C)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), rtol=3e-2, atol=1e-1)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=3e-2, atol=1e-1)


def test_pallas_ssd_groups():
    rng = np.random.default_rng(1)
    x, dt, A, B, C = _inputs(rng, h=4, g=2, n=64, p=64)
    y_p, s_p = ssd_chunked_pallas(x, dt, A, B, C, chunk=16, interpret=True)
    y_r, s_r = ssd_reference(x, dt, A, B, C)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), rtol=3e-2, atol=1e-1)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=3e-2, atol=1e-1)
