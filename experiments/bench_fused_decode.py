"""Fused full-model decode step benchmark on the real chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims, build_decode_params, fused_logits_step, stack_states,
)
from musicgen_tpu.sample.sampler import SamplerConfig, make_sampler, sample_tokens

cfg = MambaConfig(ssd_impl="pallas")
model = MambaLM(cfg)
rng = np.random.default_rng(0)
batch, prompt_len, N = 2, 2048, 1000


def stream(n):
    out = []
    while len(out) < n:
        out.append(int(rng.integers(0, VOCAB.dyn_start)))
        out.append(int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)))
        out.append(int(rng.integers(VOCAB.length_start, VOCAB.time_start)))
        if rng.random() < 0.5:
            out.append(int(rng.integers(VOCAB.time_start, VOCAB.time_start + 64)))
        out.append(int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)))
    return out[:n]


prompt = jnp.asarray([stream(prompt_len) for _ in range(batch)], jnp.int32)
meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (batch, NUM_META)), jnp.int32)
params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)
dims = DecodeDims.create(cfg, batch)

f1 = jax.jit(lambda x: x + 1.0)
x8 = jnp.zeros((8, 128), jnp.float32)
np.asarray(f1(x8))
t0 = time.perf_counter()
for _ in range(6):
    np.asarray(f1(x8))
FLOOR = (time.perf_counter() - t0) / 6
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)


def timeit(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    print(f"{name}: compile+first {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps - FLOOR
    print(f"{name}: {dt/N*1e6:8.1f} us/step -> {N/dt:.0f} tok/s/seq", flush=True)


# A: fused step only (embed+kernel+bias), argmax feedback
@jax.jit
def step_only(params, prompt, meta):
    dp = build_decode_params(params, cfg, batch)
    logits0, states = model.apply(params, prompt[:, :64], meta, method=MambaLM.prefill)
    carry = stack_states(states)
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    def b(c, _):
        tok, carry = c
        logits, carry = fused_logits_step(dp, tok, carry, cfg, dims)
        tok = jnp.argmax(logits[:, :100], -1).astype(jnp.int32)
        return (tok, carry), tok[0]
    (_, _), ys = jax.lax.scan(b, (tok, carry), None, length=N)
    return ys

timeit("A fused step+argmax  ", step_only, params, prompt, meta)

# B: full sampler fused
prefill_f, step_f = make_sampler(model, "mamba", prompt_len, fused_decode=True,
                                 cfg=cfg, batch=batch)
scfg = SamplerConfig(num_tokens=N, greedy=False, unroll=4)

@jax.jit
def run_fused(params, prompt, meta, key):
    dp = build_decode_params(params, cfg, batch)
    init_logits, state = prefill_f(params, prompt, meta)
    return sample_tokens(step_f, dp, init_logits, state, prompt, scfg, key)

timeit("B full sampler fused ", run_fused, params, prompt, meta, jax.random.PRNGKey(1))

# C: logits parity on TPU vs XLA step (compiled kernel correctness)
logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
dp = build_decode_params(params, cfg, batch)
carry = stack_states(states)
tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
xla_states = states
fstep = jax.jit(lambda dp, tok, carry: fused_logits_step(dp, tok, carry, cfg, dims))
xstep = jax.jit(lambda params, tok, st: model.apply(params, tok, st, method=MambaLM.step))
worst = 0.0
for s in range(5):
    ref_logits, xla_states = xstep(params, tok, xla_states)
    fus_logits, carry = fstep(dp, tok, carry)
    a, b = np.asarray(fus_logits), np.asarray(ref_logits)
    scale = np.abs(b).max()
    diff = np.abs(a - b).max() / scale
    agree = (a.argmax(-1) == b.argmax(-1)).all()
    worst = max(worst, diff)
    print(f"step {s}: rel max diff {diff:.4f} argmax agree {agree}", flush=True)
    tok = jnp.asarray(b.argmax(-1), jnp.int32)
print(f"worst rel diff over 5 steps: {worst:.4f}", flush=True)
