"""Empirical on-chip memory probe: which (block_len, batch) train steps fit
the single v5e chip, plain vs --remat vs --loss-chunk vs both.

The CPU compile-time analysis (experiments/sp_memory.py) shows the
STRUCTURAL savings (loss chunking, SP sharding) but cannot show remat's:
the CPU scheduler does not reschedule recomputation for liveness, so remat
shows +22% flops and no temp reduction there. The TPU scheduler is
memory-aware — this probe measures the real fit boundary by attempting one
optimizer step per config and catching RESOURCE_EXHAUSTED.

Run on the chip: python experiments/mem_probe.py [--configs ...]
Each config runs in a SUBPROCESS (the remote TPU backend does not free HBM
between configs in-process — same isolation as bench_train.py).
"""
import argparse
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def run_single(spec: str) -> None:
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from musicgen_tpu.config import NUM_META, MambaConfig
    from musicgen_tpu.models.mamba import MambaLM
    from musicgen_tpu.train import trainer as T

    blk, batch, remat, chunk = spec.split(":")
    blk, batch, chunk = int(blk), int(batch), int(chunk)
    cfg = MambaConfig(remat=(remat == "1"))
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, blk)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, blk)), jnp.int32)
    meta = jnp.asarray(
        rng.integers(0, cfg.metadata_vocab_size, (batch, NUM_META)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), src[:, :16], meta)
    opt = T.make_optimizer()
    step = T.make_lm_train_step(model, opt, donate=True, loss_chunk=chunk)
    p, s, loss = step(params, opt.init(params), src, trg, meta, jax.random.PRNGKey(1))
    print(f"OK loss={float(loss):.3f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", default=None, help="blk:batch:remat:chunk")
    ap.add_argument(
        "--configs",
        default=(
            "2042:2:0:0,4090:2:0:0,4090:2:1:0,4090:2:0:256,4090:2:1:256,"
            "8186:2:1:256,8186:2:0:256,2042:16:0:0,2042:16:1:256"
        ),
    )
    args = ap.parse_args()
    if args.single:
        run_single(args.single)
        return
    for spec in args.configs.split(","):
        blk, batch, remat, chunk = spec.split(":")
        label = (f"block {blk} batch {batch} "
                 f"{'remat ' if remat == '1' else ''}"
                 f"{'loss-chunk ' + chunk if chunk != '0' else ''}")
        r = subprocess.run(
            [sys.executable, __file__, "--single", spec],
            capture_output=True, text=True, timeout=3000,
        )
        out = (r.stdout + r.stderr)
        if "OK loss" in out:
            verdict = "FITS " + out.strip().splitlines()[-1]
        elif "RESOURCE_EXHAUSTED" in out or "Out of memory" in out.lower():
            verdict = "OOM"
        else:
            verdict = f"FAILED rc={r.returncode}: {out.strip().splitlines()[-1][:120] if out.strip() else '?'}"
        print(f"{label:45s}: {verdict}", flush=True)


if __name__ == "__main__":
    main()
