"""Convergence/quality validation on a real corpus (VERDICT item 4).

Trains all three generators + the composer classifier on the corpus seeded
from the reference's shipped MIDI files (/root/reference/samples/**.mid and
/root/reference/scripts/midi/*.mid — the only real music data in the repo),
producing loss curves in the reference log schema
(scripts/logs/training_log_*.json: {'Step','Loss'} every 10 steps) and the
per-field next-token accuracy table at the reference protocol
(scripts/Test Accuracy.ipynb cells 0-5: last-position argmax over
grammar-filtered logits, bucketed by vocab field).

Usage (runs on whatever jax.default_backend() is — the real TPU here):

  python experiments/convergence.py --out experiments/out \
      [--epochs 150] [--block-len 512] [--models mamba xlstm transformer]

Each stage shells out to the real CLIs (cli.preprocess / cli.train /
cli.evaluate) so this doubles as an end-to-end drive of the user surface.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

# Running as `python experiments/convergence.py` puts experiments/ (not the
# repo root) on sys.path; the late musicgen_tpu.utils.ckpt_sanity import in
# main() needs the root (this crashed the first r5 conv_mamba stage AFTER
# 120 epochs of training — fidelity.py had the same fix already).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"

# Composer metadata for the shipped sample corpus (year/genre values are
# only used to form the 6-token metadata vector; reference metadata.json
# schema: {"artists": [{"name", "year_started", "genres"}]}).
COMPOSERS = {
    "Bach": (1720, ["Baroque", "Classical"]),
    "Beethoven": (1800, ["Classical", "Romantic"]),
    "Brahms": (1850, ["Romantic", "Classical"]),
    "Chopin": (1830, ["Romantic", "Classical"]),
    "Debussy": (1890, ["Impressionist", "Classical"]),
    "Liszt": (1840, ["Romantic", "Classical"]),
    "Mozart": (1770, ["Classical"]),
    "Vivaldi": (1710, ["Baroque", "Classical"]),
    "Wagner": (1850, ["Romantic", "Opera"]),
}


def build_corpus(out_dir: str) -> str:
    """Collect reference-shipped .mid files into composer-dir layout."""
    midi_dir = os.path.join(out_dir, "midi")
    os.makedirs(midi_dir, exist_ok=True)
    n = 0
    for root, _, files in os.walk(REFERENCE):
        for f in files:
            if not f.endswith(".mid"):
                continue
            src = os.path.join(root, f)
            band = None
            parent = os.path.basename(root)
            if parent in COMPOSERS:
                band = parent
            else:
                m = re.match(r"generated_([A-Za-z]+)", f)
                if m and m.group(1) in COMPOSERS:
                    band = m.group(1)
                elif "comparison" in f:
                    band = "Chopin"  # thesis comparison samples are Chopin-seeded
            if band is None:
                continue
            dst_dir = os.path.join(midi_dir, band)
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, f"{n:03d}_{f.replace(' ', '_')}")
            shutil.copyfile(src, dst)
            n += 1
    print(f"corpus: {n} MIDI files", flush=True)

    meta = {
        "artists": [
            {"name": name, "year_started": year, "genres": genres}
            for name, (year, genres) in COMPOSERS.items()
        ]
    }
    meta_path = os.path.join(out_dir, "metadata.json")
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=2)
    return midi_dir


def run(cmd, **kw):
    import time

    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, check=True, **kw)
    # Gap before the next TPU client: connecting within seconds of the
    # previous client's exit wedges the post-restart backend (DEV_NOTES
    # r5 session 2). Hung stages are bounded by the queue timeouts and
    # relaunched by the watchdog.
    time.sleep(60)
    return r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/out")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--block-len", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument(
        "--models", nargs="+", default=["mamba", "transformer", "xlstm"]
    )
    ap.add_argument("--classifier-epochs", type=int, default=0,
                    help=">0 also trains the composer classifier")
    ap.add_argument("--augmentation", action="store_true",
                    help="enable the reference augmentation stack (pitch/"
                         "velocity shifts, time multiply) as a data "
                         "multiplier against the overfit wall")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    midi_dir = build_corpus(args.out)
    np_dir = os.path.join(args.out, "np")
    meta_path = os.path.join(args.out, "metadata.json")
    py = [sys.executable, "-m"]

    run(py + ["musicgen_tpu.cli.preprocess", "--midi", midi_dir, "--out", np_dir,
              "--min-notes", "50"])

    results = {}
    for model in args.models:
        ckpt_dir = os.path.join(args.out, "ckpt", model)
        log_path = os.path.join(args.out, f"training_log_{model}.json")
        cmd = py + ["musicgen_tpu.cli.train", "--model", model,
                  "--data", np_dir, "--metadata", meta_path,
                  "--epochs", str(args.epochs),
                  "--block-len", str(args.block_len),
                  "--batch-size", str(args.batch_size),
                  "--ckpt-dir", ckpt_dir, "--log", log_path]
        if args.augmentation:
            cmd.append("--augmentation")
        run(cmd)
        # Sanity-gated best checkpoint (utils/ckpt_sanity) — newest-by-mtime
        # consumed a loss_0.00 crash-save in round 4 and committed an
        # all-zero accuracy JSON.
        from musicgen_tpu.utils.ckpt_sanity import select_checkpoint

        best = select_checkpoint(ckpt_dir, log_path=log_path)
        acc_path = os.path.join(args.out, f"accuracy_{model}.json")
        run(py + ["musicgen_tpu.cli.evaluate", "accuracy", "--model", model,
                  "--ckpt", best, "--data", np_dir,
                  "--metadata", meta_path, "--block-len", str(args.block_len),
                  "--repeats", "20", "--out", acc_path])
        with open(log_path) as fh:
            log = json.load(fh)
        steps = [e for e in log if "Loss" in e]
        # Per-epoch validation curve from the reference-format messages
        # ("Epoch [i/N], Validation Loss: X") — the generalization signal.
        val_curve = []
        for e in log:
            m = re.search(r"Epoch \[(\d+)/\d+\], Validation Loss: ([\d.]+)",
                          str(e.get("message", "")))
            if m:
                val_curve.append([int(m.group(1)), float(m.group(2))])
        results[model] = {
            "val_curve": val_curve,
            "best_val": min((v for _, v in val_curve), default=None),
            "first_loss": steps[0]["Loss"] if steps else None,
            "last_loss": steps[-1]["Loss"] if steps else None,
            "min_loss": min(e["Loss"] for e in steps) if steps else None,
            "steps": steps[-1]["Step"] if steps else 0,
            "accuracy": json.load(open(acc_path)),
        }
        print(json.dumps({model: results[model]}, indent=2), flush=True)

    if args.classifier_epochs:
        run(py + ["musicgen_tpu.cli.train_classifier",
                  "--data", np_dir, "--metadata", meta_path,
                  "--epochs", str(args.classifier_epochs),
                  "--ckpt-dir", os.path.join(args.out, "ckpt", "classifier"),
                  "--log", os.path.join(args.out, "training_log_classifier.json")])

    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print("SUMMARY", json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
