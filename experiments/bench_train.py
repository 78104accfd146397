"""Train-step throughput for all four models, fp32 and bf16 (B2 T2048)."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

from musicgen_tpu.config import NUM_META, DEFAULT_CONFIG
from musicgen_tpu.models.registry import new_model
from musicgen_tpu.train import trainer as T

rng = np.random.default_rng(0)
B, TT = 2, 2048
tokens = jnp.asarray(rng.integers(0, 17914, (B, TT + 1)), jnp.int32)
meta = jnp.asarray(rng.integers(0, 568, (B, NUM_META)), jnp.int32)
src, trg = tokens[:, :-1], tokens[:, 1:]


def bench(kind, dtype, reps=6):
    model = new_model(kind, DEFAULT_CONFIG, dtype=dtype)
    if kind == "classifier":
        params = model.init(jax.random.PRNGKey(0), src[:, :16])
        opt = T.make_optimizer()
        step = T.make_classifier_train_step(model, opt, donate=False)
        args0 = (params, opt.init(params), src, meta)
    else:
        params = model.init(jax.random.PRNGKey(0), src[:, :16], meta)
        opt = T.make_optimizer()
        step = T.make_lm_train_step(model, opt, donate=False)
        args0 = (params, opt.init(params), src, trg, meta, jax.random.PRNGKey(1))
    out = step(*args0)
    np.asarray(out[-1])
    p, os_ = out[0], out[1]
    t0 = time.perf_counter()
    for _ in range(reps):
        args = (p, os_) + args0[2:]
        out = step(*args)
        p, os_ = out[0], out[1]
    np.asarray(out[-1])
    dt = (time.perf_counter() - t0) / reps
    name = dtype.__name__ if hasattr(dtype, "__name__") else str(dtype)
    print(f"{kind:12s} {np.dtype(dtype).name:9s}: {1/dt:6.2f} steps/s ({dt*1e3:.0f} ms)",
          flush=True)


if __name__ == "__main__":
    for kind in ("mamba", "xlstm", "transformer", "classifier"):
        for dtype in (jnp.float32, jnp.bfloat16):
            try:
                bench(kind, dtype)
            except Exception as e:
                print(f"{kind} {dtype}: FAILED {type(e).__name__}: {e}", flush=True)
