"""Serving batch scaling of the fused decode sampler (weights stream once
per step regardless of batch)."""
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
prompt_len, num_tokens = 2048, 2000

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

for batch in (2, 8, 16):
    prompt = jnp.asarray([stream(prompt_len) for _ in range(batch)], jnp.int32)
    meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (batch, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)
    t0 = time.perf_counter()
    np.asarray(generate(model, params, "mamba", prompt, meta, num_tokens,
                        prompt_len, jax.random.PRNGKey(0)))
    print(f"B{batch}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(generate(model, params, "mamba", prompt, meta, num_tokens,
                            prompt_len, jax.random.PRNGKey(1+i)))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"B{batch}: {num_tokens/best:7.0f} tok/s/seq  {batch*num_tokens/best:8.0f} aggregate tok/s",
          flush=True)
