"""e2e sampler with in-kernel tail: bf16 and int8, vs the XLA-tail path."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.sample.sampler import generate

cfg = MambaConfig(ssd_impl="pallas")
model = MambaLM(cfg)
rng = np.random.default_rng(0)
batch, prompt_len, num_tokens = 2, 2048, 2000

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

def timeit(name, quant, reps=5):
    t0 = time.perf_counter()
    r = np.asarray(generate(model, params, "mamba", prompt, meta, num_tokens,
                            prompt_len, jax.random.PRNGKey(0), fused=True, quant=quant))
    print(f"{name}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(generate(model, params, "mamba", prompt, meta, num_tokens,
                            prompt_len, jax.random.PRNGKey(1+i), fused=True, quant=quant))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: best {num_tokens/best:.0f} tok/s/seq ({[f'{x*1e3:.0f}ms' for x in ts]})", flush=True)

timeit("bf16+ktail", "bf16")
timeit("int8+ktail", "int8")
