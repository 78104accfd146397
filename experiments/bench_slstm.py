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

# timing fns reduce on-device (fetching the 67 MB h over the remote tunnel
# dominates otherwise); parity fns return the full tensors.
xla_t = jax.jit(lambda wx: jnp.sum(slstm_sequential(wx, r, bias)[0]))
pal_t = jax.jit(lambda wx: jnp.sum(slstm_pallas(wx, r, bias, chunk=128)[0]))
xla = jax.jit(lambda wx: slstm_sequential(wx, r, bias))
pal = jax.jit(lambda wx: slstm_pallas(wx, r, bias, chunk=128))

def timeit(name, fn, reps=5):
    t0 = time.perf_counter(); np.asarray(fn(wx))
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(wx))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)

timeit("xla  ", xla_t)
timeit("pallas", pal_t)
h_ref, s_ref = xla(wx)
h_got, s_got = pal(wx)
d = np.abs(np.asarray(h_got) - np.asarray(h_ref)).max()
print("max |h diff|:", d, flush=True)
for a, bb in zip(s_got, s_ref):
    print("state diff:", np.abs(np.asarray(a) - np.asarray(bb)).max(), flush=True)
