"""End-to-end xLSTM conditioned-sampling benchmark on the real chip.

The reference workload (scripts/generate.py + models/xlstm): 2000-token
composer-conditioned sample, grammar+penalty 'combined' sampler, batch 2,
2048-token prompt. Compares the XLA cached step loop (round-2 path,
2,264 tok/s/seq) against the fused full-model Pallas decode kernel
(ops/pallas_xlstm_decode), bf16 and int8w.

Run: python experiments/bench_xlstm_sampling.py [--tokens 2000]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from musicgen_tpu.config import NUM_META, VOCAB, XLSTMConfig
from musicgen_tpu.models.xlstm import XLSTMLM
from musicgen_tpu.sample.sampler import generate

REF_TOK_S = 26.0  # BASELINE.md: reference no-cache loop, all generators


def stream(rng, n):
    out = []
    while len(out) < n:
        out.append(int(rng.integers(0, VOCAB.dyn_start)))
        out.append(int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)))
        out.append(int(rng.integers(VOCAB.length_start, VOCAB.time_start)))
        if rng.random() < 0.5:
            out.append(int(rng.integers(VOCAB.time_start, VOCAB.time_start + 64)))
        out.append(int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)))
    return out[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--prompt", type=int, default=2048)
    args = ap.parse_args()

    cfg = XLSTMConfig()
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        [stream(rng, args.prompt) for _ in range(args.batch)], jnp.int32
    )
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (args.batch, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"xLSTM params: {n_params:,}; backend {jax.default_backend()}", flush=True)

    def run(tag, **kw):
        t0 = time.perf_counter()
        out = generate(
            model, params, "xlstm", prompt, meta, args.tokens, args.prompt,
            jax.random.PRNGKey(1), **kw,
        )
        np.asarray(out[0, -1])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            out = generate(
                model, params, "xlstm", prompt, meta, args.tokens, args.prompt,
                jax.random.PRNGKey(2 + i), **kw,
            )
            np.asarray(out[0, -1])
            best = min(best, time.perf_counter() - t0)
        tps = args.tokens / best
        print(
            f"{tag:28s} compile {compile_s:6.1f}s  e2e {best:6.2f}s  "
            f"{tps:8.0f} tok/s/seq  {tps / REF_TOK_S:6.1f}x ref",
            flush=True,
        )
        return out, tps

    xla_out, xla_tps = run("xla cached step (round-2)", fused=False)
    bf16_out, bf16_tps = run("fused kernel bf16", fused=True, quant="bf16")
    _, int8_tps = run("fused kernel int8w", fused=True, quant="int8w")
    _, sb16_tps = run("fused bf16 + bf16 state", fused=True, quant="bf16-sb16")
    _, i8s_tps = run("fused int8w + bf16 state", fused=True,
                     quant="int8w-sb16")
    g_xla, _ = run("greedy xla", fused=False, greedy=True)
    g_fused, _ = run("greedy fused bf16", fused=True, greedy=True)
    agree = float(jnp.mean((g_xla == g_fused).astype(jnp.float32)))
    print(f"greedy stream agreement fused-vs-xla: {agree:.4f}", flush=True)
    g_sb16, _ = run("greedy fused int8w-sb16", fused=True, greedy=True,
                    quant="int8w-sb16")
    agree_s = float(jnp.mean((g_xla == g_sb16).astype(jnp.float32)))
    print(f"greedy stream agreement int8w-sb16-vs-xla: {agree_s:.4f}",
          flush=True)
    print(
        f"SUMMARY xla={xla_tps:.0f} bf16={bf16_tps:.0f} int8w={int8_tps:.0f} "
        f"sb16={sb16_tps:.0f} int8w-sb16={i8s_tps:.0f} "
        f"speedup={bf16_tps / xla_tps:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
