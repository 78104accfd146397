"""Localize the int8w logit error: which quantized site hurts? (VERDICT r2 §7)

Simulates the decode kernel's K-group int8 weight quantization
(ops/pallas_decode._quantize_cols -> dequantize) on the TRAINED Mamba
checkpoint, selectively per site (mixer in_proj/out_proj vs lm_head), and
measures per-step logit error through the XLA step path over 200
oracle-fed steps — the same metric as experiments/int8_quality.py.

Quantize->dequantize to f32 is numerically the W8A16 kernel path up to
bf16 matmul rounding, so the split tells us whether a mixed-precision
kernel mode (int8 mixers + bf16 lm_head, quant='int8wm') can reach the
<=5% error target while keeping most of the stream savings.

Runs on CPU (no chip contention): python experiments/int8_ablate.py
"""
import sys, glob, os, json
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.data.dataset import TokenDataset
from musicgen_tpu.train import trainer as T
from musicgen_tpu.models.registry import init_params
from musicgen_tpu.ops.pallas_decode import _quantize_cols

OUT = "experiments/out"
from musicgen_tpu.utils.ckpt_sanity import is_sane_checkpoint, parsed_loss

# Best sane checkpoint last (utils/ckpt_sanity; r4: mtime order is unsafe).
ckpts = sorted(
    (p for p in glob.glob(f"{OUT}/ckpt/mamba/loss_*") if is_sane_checkpoint(p)),
    key=parsed_loss, reverse=True,
)
assert ckpts, "no mamba checkpoint yet"
cfg = MambaConfig()
model = MambaLM(cfg)
params0 = init_params(model, "mamba", block_len=64)
opt = T.make_optimizer()
state = T.load_checkpoint(ckpts[-1], T.TrainState(params0, opt.init(params0), 0))
params = state.params
print("loaded", ckpts[-1], flush=True)


def qdq(w, group=256):
    q, s = _quantize_cols(jnp.asarray(w), group=group)
    k = w.shape[0]
    g = s.shape[0]
    return (q.reshape(g, k // g, -1).astype(jnp.float32) * s[:, None, :]).reshape(
        w.shape
    )


def variant2(sites, group=256):
    """sites: set of param leaf names ('in_proj','out_proj','lm_head')."""
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    out = {}
    for path, w in flat.items():
        if path[-1] == "kernel" and path[-2] in sites:
            w = qdq(w, group)
        out[path] = w
    return {"params": flax.traverse_util.unflatten_dict(out)}


def variant(mixers: bool, head: bool):
    p = jax.tree.map(lambda x: x, params)  # shallow-copyable pytree
    import flax

    flat = flax.traverse_util.flatten_dict(p["params"])
    out = {}
    for path, w in flat.items():
        if mixers and path[-2:] == ("in_proj", "kernel"):
            w = qdq(w)
        elif mixers and path[-2:] == ("out_proj", "kernel"):
            w = qdq(w)
        elif head and path[-2:] == ("lm_head", "kernel"):
            w = qdq(w)
        out[path] = w
    return {"params": flax.traverse_util.unflatten_dict(out)}


ds = TokenDataset.from_directory(
    f"{OUT}/np", f"{OUT}/metadata.json", None, block_len=1024
)
rng = np.random.default_rng(0)
batch = 2
idx = rng.integers(0, len(ds), batch)
src = jnp.stack([jnp.asarray(ds[int(i)][0]) for i in idx])
meta = jnp.stack([jnp.asarray(ds[int(i)][2]) for i in idx])
prompt = src[:, :1024].astype(jnp.int32)

logits0, states0 = model.apply(params, prompt, meta, method=MambaLM.prefill)
xstep = jax.jit(lambda p, t, s: model.apply(p, t, s, method=MambaLM.step))

import os as _os

if _os.environ.get("ABLATE_ZX"):
    # Hypothesis: the tiny B/C/dt column block of in_proj feeds the SSM
    # recurrence directly and drives the drift; the big z/x block is benign.
    import flax

    zx = 2 * cfg.d_inner  # in_proj columns [0, zx) are z|x

    def variant_zx(quant_zx: bool, quant_bcdt: bool):
        flat = flax.traverse_util.flatten_dict(params["params"])
        out = {}
        for path, w in flat.items():
            if path[-2:] == ("in_proj", "kernel"):
                wq = qdq(w)
                cols = jnp.arange(w.shape[1])
                use_q = jnp.where(cols < zx, quant_zx, quant_bcdt)
                w = jnp.where(use_q[None, :], wq, w)
            elif path[-2:] == ("out_proj", "kernel") or path[-2:] == (
                "lm_head", "kernel"
            ):
                w = qdq(w)
            out[path] = w
        return {"params": flax.traverse_util.unflatten_dict(out)}

    def variant_cols(lo, hi):
        """Quantize in_proj columns [lo, hi) + out_proj + lm_head."""
        flat = flax.traverse_util.flatten_dict(params["params"])
        out = {}
        for path, w in flat.items():
            if path[-2:] == ("in_proj", "kernel"):
                wq = qdq(w)
                cols = jnp.arange(w.shape[1])
                use_q = (cols >= lo) & (cols < hi)
                w = jnp.where(use_q[None, :], wq, w)
            elif path[-2:] == ("out_proj", "kernel") or path[-2:] == (
                "lm_head", "kernel"
            ):
                w = qdq(w)
            out[path] = w
        return {"params": flax.traverse_util.unflatten_dict(out)}

    d = cfg.d_inner
    variants = {
        "zx-only+out+head": variant_zx(True, False),
        "bcdt-only+out+head": variant_zx(False, True),
        "out+head-only": variant_zx(False, False),
        "z-only+out+head": variant_cols(0, d),
        "x-only+out+head": variant_cols(d, 2 * d),
    }
elif _os.environ.get("ABLATE_FINE"):
    variants = {
        "in_proj-only": variant2({"in_proj"}),
        "out_proj-only": variant2({"out_proj"}),
        "mixers-g64": variant2({"in_proj", "out_proj"}, group=64),
        "mixers-g32": variant2({"in_proj", "out_proj"}, group=32),
    }
else:
    variants = {
        "all-int8w": variant(True, True),
        "mixers-only": variant(True, False),
        "head-only": variant(False, True),
    }
# Each variant needs its own prefill state (quantized mixers change the
# recurrent state); oracle (fp32) feeds the token stream to isolate
# per-step error from stream divergence.
vstates = {
    n: model.apply(v, prompt, meta, method=MambaLM.prefill)[1]
    for n, v in variants.items()
}
print("prefills done", flush=True)

tok = jnp.argmax(logits0[:, -1, :], -1).astype(jnp.int32)
xs = states0
stats = {n: {"rels": [], "agrees": []} for n in variants}
for s in range(200):
    ref, xs = xstep(params, tok, xs)
    b = np.asarray(ref)
    for n, v in variants.items():
        got, vstates[n] = xstep(v, tok, vstates[n])
        a = np.asarray(got)
        stats[n]["rels"].append(float(np.abs(a - b).max() / np.abs(b).max()))
        stats[n]["agrees"].append(float((a.argmax(-1) == b.argmax(-1)).mean()))
    tok = jnp.asarray(b.argmax(-1), jnp.int32)
    if s % 50 == 0:
        print("step", s, flush=True)

res = {
    n: {
        "mean_rel": float(np.mean(d["rels"])),
        "p95_rel": float(np.percentile(d["rels"], 95)),
        "argmax_agree": float(np.mean(d["agrees"])),
    }
    for n, d in stats.items()
}
print("DONE", json.dumps(res, indent=2), flush=True)
