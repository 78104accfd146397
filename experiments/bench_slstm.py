import time
import numpy as np
import jax, jax.numpy as jnp
from musicgen_tpu.ops.slstm import slstm_sequential
from musicgen_tpu.ops.pallas_slstm import slstm_pallas

rng = np.random.default_rng(0)
b, t, h, dh = 2, 2054, 4, 256  # xLSTM generator shape (block_len+6)
wx = jnp.asarray(rng.standard_normal((b, t, 4, h, dh)) * 0.5, jnp.float32)
r = jnp.asarray(rng.standard_normal((4, h, dh, dh)) * 0.05, jnp.float32)
bias = jnp.asarray(rng.standard_normal((4, h, dh)), jnp.float32)

xla = jax.jit(lambda wx: slstm_sequential(wx, r, bias))
pal = jax.jit(lambda wx: slstm_pallas(wx, r, bias, chunk=128))

def timeit(name, fn, reps=5):
    t0 = time.perf_counter(); h_, s_ = fn(wx); np.asarray(h_)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        h_, s_ = fn(wx); np.asarray(h_[:, -1, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return h_, s_

h_ref, s_ref = timeit("xla  ", xla)
h_got, s_got = timeit("pallas", pal)
d = np.abs(np.asarray(h_got) - np.asarray(h_ref)).max()
print("max |h diff|:", d, flush=True)
for a, bb in zip(s_got, s_ref):
    print("state diff:", np.abs(np.asarray(a) - np.asarray(bb)).max(), flush=True)
