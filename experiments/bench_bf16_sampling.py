"""fp32-vs-bf16 XLA-step sampling probe (round 3).

The round-2 XLA-step sampling numbers (transformer 1,410 / xLSTM 2,264
tok/s/seq) were measured with fp32 params and KV cache — the decode loop is
DMA-bound, so storing params (and the transformer KV cache) in bf16 should
halve the per-token HBM stream. This measures generate() end-to-end for
each generator at fp32 vs bf16 (model dtype + param cast), XLA step path.

Run: python experiments/bench_bf16_sampling.py [--tokens 2000]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from musicgen_tpu.config import DEFAULT_CONFIG, NUM_META, VOCAB
from musicgen_tpu.models.registry import new_model
from musicgen_tpu.sample.sampler import generate

REF_TOK_S = 26.0


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
    ap.add_argument("--models", nargs="+",
                    default=["transformer", "xlstm", "mamba"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        [stream(rng, args.prompt) for _ in range(args.batch)], jnp.int32
    )

    for kind in args.models:
        meta = jnp.asarray(
            rng.integers(0, DEFAULT_CONFIG.mamba.metadata_vocab_size,
                         (args.batch, NUM_META)),
            jnp.int32,
        )
        f32_model = new_model(kind, dtype=jnp.float32)
        params = f32_model.init(jax.random.PRNGKey(0), prompt[:, :16], meta)

        for tag, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = new_model(kind, dtype=dtype)
            p = (
                params
                if dtype == jnp.float32
                else jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    params,
                )
            )
            t0 = time.perf_counter()
            out = generate(
                model, p, kind, prompt, meta, args.tokens, args.prompt,
                jax.random.PRNGKey(1), fused=False,
            )
            np.asarray(out[0, -1])
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                out = generate(
                    model, p, kind, prompt, meta, args.tokens, args.prompt,
                    jax.random.PRNGKey(2 + i), fused=False,
                )
                np.asarray(out[0, -1])
                best = min(best, time.perf_counter() - t0)
            tps = args.tokens / best
            print(
                f"{kind:12s} {tag}  compile {compile_s:6.1f}s  e2e {best:6.2f}s"
                f"  {tps:8.0f} tok/s/seq  {tps / REF_TOK_S:6.1f}x ref",
                flush=True,
            )


if __name__ == "__main__":
    main()
