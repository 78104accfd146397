"""int8 (W8A8) fused decode vs bf16 on the real chip + parity stats."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims, build_decode_params, fused_logits_step, stack_states,
)

cfg = MambaConfig(ssd_impl="pallas")
model = MambaLM(cfg)
rng = np.random.default_rng(0)
batch, N = 2, 1000
prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 256)), jnp.int32)
meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (batch, NUM_META)), jnp.int32)
params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)
dims = DecodeDims.create(cfg, batch)
logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)

f1 = jax.jit(lambda x: x + 1.0)
x8 = jnp.zeros((8, 128), jnp.float32)
np.asarray(f1(x8))
t0 = time.perf_counter()
for _ in range(6):
    np.asarray(f1(x8))
FLOOR = (time.perf_counter() - t0) / 6

def scan_for(quant):
    dp = build_decode_params(params, cfg, batch, quant=quant)
    qm = "w8a16" if quant == "int8w" else "w8a8"
    carry0 = stack_states(states)
    @jax.jit
    def run(dp, carry):
        tok0 = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
        def b(c, _):
            tok, carry = c
            logits, carry = fused_logits_step(dp, tok, carry, cfg, dims,
                                              quant_mode=qm)
            tok = jnp.argmax(logits[:, :100], -1).astype(jnp.int32)
            return (tok, carry), tok[0]
        (_, _), ys = jax.lax.scan(b, (tok0, carry), None, length=N)
        return ys
    t0 = time.perf_counter(); np.asarray(run(dp, carry0))
    print(f"{quant}: compile+first {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(run(dp, carry0))
    dt = (time.perf_counter() - t0) / 3 - FLOOR
    print(f"{quant}: {dt/N*1e6:8.1f} us/step -> {N/dt:.0f} tok/s/seq", flush=True)

scan_for("bf16")
scan_for("int8")
scan_for("int8w")

# logit parity int8 vs XLA oracle over 5 greedy steps
dp8 = build_decode_params(params, cfg, batch, quant="int8")
carry = stack_states(states)
tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
xs = states
fq = jax.jit(lambda dp, tok, c: fused_logits_step(dp, tok, c, cfg, dims))
xstep = jax.jit(lambda p, tok, s: model.apply(p, tok, s, method=MambaLM.step))
for s in range(5):
    ref, xs = xstep(params, tok, xs)
    ql, carry = fq(dp8, tok, carry)
    a, b = np.asarray(ql), np.asarray(ref)
    print(f"step {s}: rel {np.abs(a-b).max()/np.abs(b).max():.4f} "
          f"argmax agree {(a.argmax(-1)==b.argmax(-1)).all()}", flush=True)
    tok = jnp.asarray(b.argmax(-1), jnp.int32)
