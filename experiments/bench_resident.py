"""Resident-state whole-generation kernel vs the per-step fused sampler.

Full-size Mamba-102M, batch 2, 2048-token prompt, 2000 generated tokens —
the bench.py workload. Run on the TPU.
"""
import argparse
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from musicgen_tpu.config import NUM_META, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.sample.sampler import generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=2000)
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--quant", default="bf16", choices=["bf16", "int8", "int8w"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="resident,fused")
    args = ap.parse_args()

    cfg = MambaConfig()
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (args.batch, args.prompt)), jnp.int32
    )
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (args.batch, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    print(f"quant={args.quant} tokens={args.tokens} batch={args.batch}", flush=True)

    for mode in args.modes.split(","):
        resident = mode == "resident"
        kw = dict(fused=True, quant=args.quant, resident=resident)
        out = generate(model, params, "mamba", prompt, meta, args.tokens,
                       args.prompt, jax.random.PRNGKey(1), **kw)
        np.asarray(out)  # sync (compile + run 1)
        best = float("inf")
        for r in range(args.reps):
            t0 = time.perf_counter()
            out = generate(model, params, "mamba", prompt, meta, args.tokens,
                           args.prompt, jax.random.PRNGKey(2 + r), **kw)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        rate = args.tokens / best
        print(
            f"{mode:9s}: {best:.3f}s e2e = {rate:,.0f} tok/s/seq "
            f"({rate/26:.0f}x ref)", flush=True,
        )


if __name__ == "__main__":
    main()
