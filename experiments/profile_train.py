"""Transformer train-step breakdown (VERDICT r2 item 4: "attack the
transformer gap at batch 2 — is it the 17914-vocab filtered-CE, the
lm_head, or flash-kernel overhead?").

Times isolated fwd+bwd sub-graphs of the train step at the fidelity shape
(B2 T2048, bf16) so the full-step cost decomposes into measured parts:

  * embed+blocks (the 8-layer trunk incl. flash attention), head+loss
    stop-graded off
  * lm_head + grammar-filtered CE alone (trunk output treated as constant)
  * flash attention fwd+bwd alone at the step's shapes
  * the full train step (= trainer.make_lm_train_step)

Run on the chip: python experiments/profile_train.py [--model transformer]
"""
import argparse
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

from musicgen_tpu.config import NUM_META, DEFAULT_CONFIG
from musicgen_tpu.models.registry import new_model
from musicgen_tpu.train import trainer as T
from musicgen_tpu.train.loss import filtered_cross_entropy

TT = 2048


def timeit(fn, args, reps=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force (sync quirk)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="transformer")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 17914, (args.batch, TT)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, 17914, (args.batch, TT)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 568, (args.batch, NUM_META)), jnp.int32)

    model = new_model(args.model, DEFAULT_CONFIG, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), src[:, :16], meta)

    # 1. Full train step.
    opt = T.make_optimizer()
    step = T.make_lm_train_step(model, opt, donate=False)
    full = timeit(
        lambda *a: step(*a)[-1],
        (params, opt.init(params), src, trg, meta, jax.random.PRNGKey(1)),
    )
    print(f"full train step      : {full*1e3:7.1f} ms  ({1/full:5.2f} steps/s)",
          flush=True)

    # 2. Loss-only fwd+bwd: logits as an independent input.
    logits = model.apply(params, src, meta)
    loss_fb = jax.jit(jax.grad(
        lambda lg: filtered_cross_entropy(src, lg, trg)
    ))
    t = timeit(loss_fb, (logits,))
    print(f"filtered-CE fwd+bwd  : {t*1e3:7.1f} ms  (logits ({args.batch},{TT},V) input)",
          flush=True)

    # 3. Trunk-only fwd+bwd: scalar-sum head so the lm_head matmul and loss
    # drop out of the graph (sum over the trunk output instead).
    if args.model == "transformer":
        # Full forward but loss = sum(logits * const) — keeps lm_head.
        fb_model = jax.jit(jax.grad(
            lambda p: jnp.sum(model.apply(p, src, meta).astype(jnp.float32))
            / (args.batch * TT)
        ))
        t = timeit(fb_model, (params,))
        print(f"model fwd+bwd (sum)  : {t*1e3:7.1f} ms  (no softmax/CE)", flush=True)

        # 4. Flash attention alone at step shapes (8 layers' worth printed 1x).
        from musicgen_tpu.ops.dispatch import resolve_impl
        from musicgen_tpu.config import TransformerConfig

        cfg: TransformerConfig = model.cfg
        H, D = cfg.n_heads, cfg.n_embd // cfg.n_heads
        S = TT + NUM_META
        q = jnp.asarray(rng.standard_normal((args.batch, H, S, D)), jnp.bfloat16)
        k, v = q + 1, q + 2
        rel = jnp.asarray(rng.standard_normal((H, S, D)), jnp.bfloat16)
        impl = resolve_impl(cfg.attention_impl)
        if impl == "pallas":
            from musicgen_tpu.ops.pallas_attention import (
                flash_relpos_attention_train,
            )

            att = jax.jit(jax.grad(
                lambda q_, k_, v_, r_: jnp.sum(
                    flash_relpos_attention_train(
                        q_, k_, v_, r_, 1.0 / np.sqrt(D)
                    ).astype(jnp.float32)
                )
            ))
            t = timeit(att, (q, k, v, rel))
            print(f"flash attn fwd+bwd   : {t*1e3:7.1f} ms  (ONE layer; x{cfg.n_layer} = {t*cfg.n_layer*1e3:.1f} ms)",
                  flush=True)

    # 5. Optimizer update alone.
    grads = jax.tree.map(jnp.zeros_like, params)
    opt_state = opt.init(params)
    upd = jax.jit(lambda g, s, p: opt.update(g, s, p))
    t = timeit(upd, (grads, opt_state, params))
    print(f"adam update alone    : {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
