"""Same-harness ablation: XLA step vs fused decode kernel, full sampler."""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.sample.sampler import SamplerConfig, make_sampler, sample_tokens

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

def build(fused):
    prefill, step = make_sampler(model, "mamba", prompt_len,
                                 fused_decode=fused, cfg=cfg, batch=batch)
    scfg = SamplerConfig(num_tokens=num_tokens, greedy=False, unroll=4)
    @jax.jit
    def run(params, prompt, meta, key):
        init_logits, state = prefill(params, prompt, meta)
        if fused:
            from musicgen_tpu.ops.pallas_decode import build_decode_params
            sp = build_decode_params(params, cfg, batch)
        else:
            sp = params
        return sample_tokens(step, sp, init_logits, state, prompt, scfg, key)
    return run

def timeit(name, fn, reps=5):
    t0 = time.perf_counter(); np.asarray(fn(params, prompt, meta, jax.random.PRNGKey(0)))
    print(f"{name}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(params, prompt, meta, jax.random.PRNGKey(1+i)))
        ts.append(time.perf_counter() - t0)
    best, med = min(ts), sorted(ts)[len(ts)//2]
    print(f"{name}: best {num_tokens/best:.0f} tok/s/seq  med {num_tokens/med:.0f}  ({[f'{x*1e3:.0f}ms' for x in ts]})", flush=True)

timeit("xla  ", build(False))
timeit("fused", build(True))
