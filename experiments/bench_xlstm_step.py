"""Ground-truth timing of the xLSTM XLA decode step on the real chip.

Questions (round-3 kernel design inputs):
  1. What does the bare step cost at B=2, fp32 vs bf16-cast params?
  2. How much of it is the mLSTM matrix-state (S: 7 blocks x (2,4,512,512)
     f32 = 58.7 MB) read+write vs the weight stream?

Run: python experiments/bench_xlstm_step.py [--steps 200]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from musicgen_tpu.config import NUM_META, XLSTMConfig
from musicgen_tpu.models.xlstm import XLSTMLM


def timed(fn, *args, n=3):
    outs = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(outs)[0])  # sync
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(outs)[0])
        best = min(best, time.perf_counter() - t0)
    return best, outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    cfg = XLSTMConfig()
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(0)
    b = args.batch
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 64)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, cfg.metadata_vocab_size, (b, NUM_META)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt[:, :8], meta)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M ({n_params*4/1e6:.0f} MB f32)", flush=True)

    _, states = jax.jit(
        lambda p, t, m: model.apply(p, t, m, method=XLSTMLM.prefill)
    )(params, prompt, meta)
    state_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(states)
    )
    print(f"decode state: {state_bytes/1e6:.1f} MB", flush=True)

    def make_loop(cast16):
        @jax.jit
        def loop(p, tok0, st):
            if cast16:
                p = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 and x.ndim >= 2 else x, p
                )

            def body(carry, _):
                tok, st = carry
                logits, st = model.apply(p, tok, st, method=XLSTMLM.step)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, st), ()

            (tok, st), _ = jax.lax.scan(
                body, (tok0, st), None, length=args.steps
            )
            return tok

        return loop

    tok0 = prompt[:, -1]
    for name, cast in (("fp32", False), ("bf16-cast", True)):
        t, _ = timed(make_loop(cast), params, tok0, states)
        us = t / args.steps * 1e6
        print(
            f"{name}: {t:.3f}s for {args.steps} steps = {us:.1f} us/step = "
            f"{1e6/us:,.0f} tok/s/seq",
            flush=True,
        )


if __name__ == "__main__":
    main()
