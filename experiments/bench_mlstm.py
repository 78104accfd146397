"""mLSTM chunkwise-parallel XLA path at the generator shape.

VERDICT item 8 asks for either a Pallas chunkwise mLSTM or a measurement
showing the XLA path is already the fastest: the chunkwise form is
matmul-dominated (MXU-friendly), unlike the sLSTM's M=1 recurrence.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from musicgen_tpu.ops import mlstm as M

rng = np.random.default_rng(0)
# generator shape: B2 T2054 H4 DH256
b, t, h, dh = 2, 2048, 4, 256  # chunk-divisible stand-in for 2054
q = jnp.asarray(rng.standard_normal((b, t, h, dh)) * 0.3, jnp.float32)
k = jnp.asarray(rng.standard_normal((b, t, h, dh)) * 0.3, jnp.float32)
v = jnp.asarray(rng.standard_normal((b, t, h, dh)) * 0.3, jnp.float32)
i_pre = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
f_pre = jnp.asarray(rng.standard_normal((b, t, h)) + 3.0, jnp.float32)

# reduce on-device: fetching the (B,T,H,DH) output over the remote tunnel
# dominates otherwise (~16 MB at ~50 MB/s)
fns = {
    "chunkwise": jax.jit(lambda: jnp.sum(M.mlstm_chunkwise(q, k, v, i_pre, f_pre)[0])),
    "parallel(T^2)": jax.jit(lambda: jnp.sum(M.mlstm_parallel(q, k, v, i_pre, f_pre))),
    "sequential": jax.jit(lambda: jnp.sum(M.mlstm_sequential(q, k, v, i_pre, f_pre))),
}

for name, fn in fns.items():
    t0 = time.perf_counter(); np.asarray(jax.tree.leaves(fn())[0])
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(jax.tree.leaves(fn())[0]).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
