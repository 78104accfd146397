"""Decode-kernel quality on TRAINED weights: XLA vs fused bf16 vs int8.

Loads the convergence-run Mamba checkpoint and compares:
  1. greedy streams (mode='combined', greedy): XLA step vs fused bf16 vs int8
  2. per-step logits rel-diff + argmax agreement over 200 oracle-fed steps
     — including the GPTQ-calibrated int8w pack (ops/gptq.py), which uses
     corpus-calibrated Hessians to compensate rounding error.

INT8_OUT=dir overrides the artifact root (default experiments/out_gen).
"""
import sys, glob, os, json
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.data.dataset import TokenDataset
from musicgen_tpu.train import trainer as T
from musicgen_tpu.models.registry import init_params
from musicgen_tpu.sample.sampler import generate
from musicgen_tpu.ops.pallas_decode import (
    DecodeDims, build_decode_params, fused_logits_step, stack_states,
)

OUT = os.environ.get("INT8_OUT", "experiments/out_gen")
from musicgen_tpu.utils.ckpt_sanity import is_sane_checkpoint, parsed_loss

# Best sane checkpoint last (utils/ckpt_sanity; r4: mtime order is unsafe).
ckpts = sorted(
    (p for p in glob.glob(f"{OUT}/ckpt/mamba/loss_*") if is_sane_checkpoint(p)),
    key=parsed_loss, reverse=True,
)
assert ckpts, "no mamba checkpoint yet"
cfg = MambaConfig(ssd_impl="pallas")
model = MambaLM(cfg)
params0 = init_params(model, "mamba", block_len=64)
opt = T.make_optimizer()
state = T.load_checkpoint(ckpts[-1], T.TrainState(params0, opt.init(params0), 0))
params = state.params
print("loaded", ckpts[-1], flush=True)

ds = TokenDataset.from_directory(
    f"{OUT}/np", f"{OUT}/metadata.json", None, block_len=1024
)
rng = np.random.default_rng(0)
batch = 2
idx = rng.integers(0, len(ds), batch)
src = jnp.stack([jnp.asarray(ds[int(i)][0]) for i in idx])
meta = jnp.stack([jnp.asarray(ds[int(i)][2]) for i in idx])
prompt = src[:, :1024].astype(jnp.int32)
print("prompt", prompt.shape, flush=True)

# 1. greedy stream comparison, 300 tokens
streams = {}
for name, kw in [
    ("xla", dict(fused=False)),
    ("bf16", dict(fused=True, quant="bf16")),
    ("int8", dict(fused=True, quant="int8")),
    ("int8w", dict(fused=True, quant="int8w")),
]:
    s = np.asarray(generate(model, params, "mamba", prompt, meta, 300, 1024,
                            jax.random.PRNGKey(0), greedy=True, **kw))
    streams[name] = s[:, 1024:]
    print(f"{name} stream done", flush=True)
agree_b = (streams["bf16"] == streams["xla"]).mean()
agree_i = (streams["int8"] == streams["xla"]).mean()
agree_w = (streams["int8w"] == streams["xla"]).mean()
# first divergence index per sequence
def first_div(a, b):
    d = (a != b)
    return [int(np.argmax(dd)) if dd.any() else -1 for dd in d]
print(json.dumps({
    "greedy_token_agreement_bf16_vs_xla": float(agree_b),
    "greedy_token_agreement_int8_vs_xla": float(agree_i),
    "greedy_token_agreement_int8w_vs_xla": float(agree_w),
    "first_divergence_bf16": first_div(streams["bf16"], streams["xla"]),
    "first_divergence_int8": first_div(streams["int8"], streams["xla"]),
}), flush=True)

# 2. per-step logits parity, oracle-fed
dims = DecodeDims.create(cfg, batch)
logits0, states = model.apply(params, prompt, meta, method=MambaLM.prefill)
xstep = jax.jit(lambda p, t, s: model.apply(p, t, s, method=MambaLM.step))
# GPTQ calibration: input second moments from eager train-geometry
# forwards over a few corpus batches (ops/gptq.py).
from musicgen_tpu.ops.gptq import collect_hessians, make_gptq_quantizer
import time as _time

# Calibration forwards are EAGER (the interceptor pulls concrete inputs);
# on the remote axon backend that is dispatch-bound, so run them on the
# host CPU backend against a CPU copy of the params.
cpu0 = jax.local_devices(backend="cpu")[0]
params_cpu = jax.device_put(params, cpu0)
calib_batches = []
for c in range(4):
    cidx = rng.integers(0, len(ds), batch)
    cs = np.stack([np.asarray(ds[int(i)][0]) for i in cidx])
    cm = np.stack([np.asarray(ds[int(i)][2]) for i in cidx])
    calib_batches.append(
        (jax.device_put(cs[:, :512].astype(np.int32), cpu0),
         jax.device_put(cm, cpu0))
    )
t0 = _time.perf_counter()
with jax.default_device(cpu0):
    hessians = collect_hessians(model, params_cpu, calib_batches)
t1 = _time.perf_counter()
gptq_quantizer = make_gptq_quantizer(hessians)
print(f"gptq calibration: {len(calib_batches)} batches, "
      f"{t1 - t0:.1f}s hessians", flush=True)

stats = {}
for name in ("bf16", "int8", "int8w", "int8w-gptq"):
    t0 = _time.perf_counter()
    dp = build_decode_params(
        params, cfg, batch, quant="int8w" if name == "int8w-gptq" else name,
        quantizer=gptq_quantizer if name == "int8w-gptq" else None,
    )
    if name == "int8w-gptq":
        print(f"gptq solve: {_time.perf_counter() - t0:.1f}s", flush=True)
    qm = "w8a16" if name.startswith("int8w") else "w8a8"
    fstep = jax.jit(lambda dp, t, c, qm=qm: fused_logits_step(
        dp, t, c, cfg, dims, quant_mode=qm))
    carry = stack_states(states)
    xs = states
    tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
    rels, agrees = [], []
    for s in range(200):
        ref, xs = xstep(params, tok, xs)
        got, carry = fstep(dp, tok, carry)
        a, b = np.asarray(got), np.asarray(ref)
        rels.append(float(np.abs(a - b).max() / np.abs(b).max()))
        agrees.append(float((a.argmax(-1) == b.argmax(-1)).mean()))
        tok = jnp.asarray(b.argmax(-1), jnp.int32)
    stats[name] = {"mean_rel": float(np.mean(rels)),
                   "p95_rel": float(np.percentile(rels, 95)),
                   "argmax_agree": float(np.mean(agrees))}
    print(name, stats[name], flush=True)
print("DONE", json.dumps(stats), flush=True)
