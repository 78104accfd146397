"""Ablate the bf16 Mamba training regression (VERDICT item 9).

Round-1 measurement: bf16 4.47 steps/s vs fp32 8.62 at B2 T2048 — bf16
should win on MXU. Hypotheses: (a) convert-materialization around the
fp32 SSD inner scan breaks XLA fusions; (b) flax Dense param casts;
(c) the fp32 logits head dominating either way.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, MambaConfig, TrainValues
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.train import trainer as T

rng = np.random.default_rng(0)
B, TT = 2, 2048
tokens = jnp.asarray(rng.integers(0, 17914, (B, TT + 1)), jnp.int32)
meta = jnp.asarray(rng.integers(0, 568, (B, NUM_META)), jnp.int32)
src, trg = tokens[:, :-1], tokens[:, 1:]


def bench(name, dtype, reps=6):
    cfg = MambaConfig()
    model = MambaLM(cfg, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0), src[:, :16], meta)
    values = TrainValues(block_len=TT, batch_size=B)
    opt = T.make_optimizer(values)
    opt_state = opt.init(params)
    step = T.make_lm_train_step(model, opt, donate=False)
    key = jax.random.PRNGKey(1)
    p, os_, l = step(params, opt_state, src, trg, meta, key)
    np.asarray(l)
    t0 = time.perf_counter()
    for _ in range(reps):
        p, os_, l = step(p, os_, src, trg, meta, key)
    np.asarray(l)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {1/dt:.2f} steps/s ({dt*1e3:.0f} ms)", flush=True)
    return dt


if __name__ == "__main__":
    bench("fp32", jnp.float32)
    bench("bf16", jnp.bfloat16)
