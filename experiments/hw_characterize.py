"""Can a Pallas kernel stream bf16 weights at BW limit for M=2 decode matmuls?"""
import time, functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f1 = jax.jit(lambda x: x + 1.0)
x0 = jnp.zeros((8, 128), jnp.float32)
np.asarray(f1(x0))
t0 = time.perf_counter()
for _ in range(10):
    np.asarray(f1(x0))
FLOOR = (time.perf_counter() - t0) / 10
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=3):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps - FLOOR
    print(f"{name}: {dt/500*1e6:8.1f} us/step", flush=True)
    return dt


M, K, N = 8, 1024, 4352  # M padded to 8 rows (batch 2 lives in rows 0-1)
BN = 512


def mm_kernel(x_ref, w_ref, o_ref):
    # x: (M, K) f32 resident; w: (K, BN) bf16 block; o: (M, BN) f32
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def pallas_mm(x, w):
    return pl.pallas_call(
        mm_kernel,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0)),
            pl.BlockSpec((K, BN), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(x, w)


key = jax.random.PRNGKey(0)
Wh = jnp.stack([(jax.random.normal(jax.random.fold_in(key, i), (K, N), jnp.float32) * 0.01).astype(jnp.bfloat16) for i in range(10)])
Wf = Wh.astype(jnp.float32)


def f_pallas(x, W):
    def b(c, _):
        x = c
        for i in range(10):
            y = pallas_mm(x, W[i])
            x = jnp.tanh(y[:, :K])
        return x, ()
    return jax.lax.scan(b, x, None, length=500)[0]


def f_xla32(x, W):
    def b(c, _):
        x = c
        for i in range(10):
            y = x @ W[i]
            x = jnp.tanh(y[:, :K])
        return x, ()
    return jax.lax.scan(b, x, None, length=500)[0]


x = jnp.ones((M, K), jnp.float32)
timeit("pallas bf16 W, 10 matmuls", jax.jit(f_pallas), x, Wh)
timeit("xla    fp32 W, 10 matmuls", jax.jit(f_xla32), x, Wf)
gb_h = Wh.size * 2 / 1e9
gb_f = Wf.size * 4 / 1e9
print(f"bf16 weights {gb_h*1000:.0f} MB/step; fp32 {gb_f*1000:.0f} MB/step", flush=True)
