"""CPU fallback for the generalizing-convergence study (VERDICT r2 item 2).

When the TPU tunnel is unavailable, this trains a REDUCED Mamba (the full
model at block 1024 is ~100x too slow on host) on the reference-shipped
corpus with the full augmentation stack as a data multiplier, logging
train AND per-epoch validation loss in the reference schema — the
val-curve shape (descend, bottom, overfit) is the deliverable; absolute
numbers are not comparable to the reference's full-scale table and are
labeled as such.

Run: python experiments/convergence_cpu.py [--epochs 300]
Artifacts: experiments/out_cpu/{training_log_mamba_cpu.json, summary.json}
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/out_cpu")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--block-len", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--no-augmentation", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from experiments.convergence import build_corpus, run

    os.makedirs(args.out, exist_ok=True)
    midi_dir = build_corpus(args.out)
    np_dir = os.path.join(args.out, "np")
    meta_path = os.path.join(args.out, "metadata.json")
    run([sys.executable, "-m", "musicgen_tpu.cli.preprocess",
         "--midi", midi_dir, "--out", np_dir, "--min-notes", "50"])

    import jax.numpy as jnp

    from musicgen_tpu.config import MambaConfig, TrainValues
    from musicgen_tpu.data.dataset import TokenDataset, make_loaders
    from musicgen_tpu.models.mamba import MambaLM
    from musicgen_tpu.models.registry import init_params
    from musicgen_tpu.train import trainer as T

    values = TrainValues(
        block_len=args.block_len, batch_size=args.batch_size,
        epochs=args.epochs, augmentation=not args.no_augmentation,
    )
    dataset = TokenDataset.from_directory(
        np_dir, meta_path, None, block_len=values.block_len
    )
    train_iter, test_iter = make_loaders(dataset, values, seed=0)

    # Reduced model: same architecture family, ~10M params (CPU-trainable).
    cfg = MambaConfig(d_model=256, n_layers=4, d_state=32, headdim=32,
                      chunk_size=64)
    model = MambaLM(cfg)
    params = init_params(model, "mamba", block_len=values.block_len)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"reduced mamba: {n:,} params; corpus {len(dataset)} files; "
          f"augmentation={values.augmentation}", flush=True)

    log_path = os.path.join(args.out, "training_log_mamba_cpu.json")
    T.train_lm(
        model, params, train_iter, test_iter, values,
        ckpt_dir=os.path.join(args.out, "ckpt", "mamba_cpu"),
        log_path=log_path, seed=0,
    )

    log = json.load(open(log_path))
    val_curve = []
    for e in log:
        m = re.search(r"Epoch \[(\d+)/\d+\], Validation Loss: ([\d.]+)",
                      str(e.get("message", "")))
        if m:
            val_curve.append([int(m.group(1)), float(m.group(2))])
    summary = {
        "model": "mamba_reduced_cpu(d256 L4)",
        "params": n,
        "augmentation": values.augmentation,
        "block_len": values.block_len,
        "val_curve": val_curve,
        "best_val": min((v for _, v in val_curve), default=None),
        "best_val_epoch": min(val_curve, key=lambda t: t[1])[0] if val_curve else None,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print("SUMMARY", json.dumps(summary)[:2000], flush=True)


if __name__ == "__main__":
    main()
