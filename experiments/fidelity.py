"""Classifier-fidelity loop with statistically meaningful n (VERDICT r2 §2).

The reference protocol (scripts/test_classifier.ipynb): generate
composer-conditioned samples, run the trained composer classifier over the
generated corpus, report per-band success rates. Round 2 ran it with a
handful of files per band (rates quantized to 0/0.5/1.0); this driver
generates >= --per-band samples per band so the rates carry information.

Usage (after experiments/convergence.py has produced checkpoints):

  python experiments/fidelity.py --out experiments/out_r3 \
      --model mamba --per-band 20 [--length 2000]

Stages (all through the real CLIs, like convergence.py):
  1. cli.generate per band, batch 2, fresh seed per call, until n >= per-band
  2. cli.preprocess the generated MIDI corpus
  3. cli.evaluate classifier on the generated corpus -> per-band rates + n
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys

# Running as `python experiments/fidelity.py` puts experiments/ (not the
# repo root) on sys.path; the late musicgen_tpu import below needs the root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(cmd, timeout=1200):
    """Run a CLI call with a hang guard. The post-restart axon backend
    sometimes wedges a client that connects right after the previous one
    exits (DEV_NOTES r5 session 2): the process sits at keepalive traffic
    forever. Bound each call, back off 5 min on a timeout (killed clients
    wedge the device for minutes), and retry once before giving up."""
    import time

    for attempt in (1, 2):
        print("+", " ".join(cmd), f"(attempt {attempt})", flush=True)
        try:
            subprocess.run(cmd, check=True, timeout=timeout)
            time.sleep(45)  # let the device release before the next client
            return
        except subprocess.TimeoutExpired:
            if attempt == 2:
                raise
            print(f"  timed out after {timeout}s; backing off 300s then "
                  "retrying once", flush=True)
            time.sleep(300)


def pick_ckpt(ckpt_dir: str, log_path=None, **kw) -> str:
    """Sanity-gated best checkpoint (utils/ckpt_sanity — r4 lesson: the
    old newest-by-mtime pick consumed a loss_0.00 crash-save blindly)."""
    from musicgen_tpu.utils.ckpt_sanity import select_checkpoint

    return select_checkpoint(ckpt_dir, log_path=log_path, **kw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments/out_r3")
    ap.add_argument("--model", default="mamba")
    ap.add_argument("--per-band", type=int, default=20)
    ap.add_argument("--length", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--fused-decode", default="auto")
    args = ap.parse_args()

    np_dir = os.path.join(args.out, "np")
    # cli.preprocess mirrors the input tree under out/<basename(midi_dir)>/
    # — descend into a sole child dir that holds the band dirs.
    kids = sorted(
        d for d in os.listdir(np_dir) if os.path.isdir(os.path.join(np_dir, d))
    )
    if len(kids) == 1 and not glob.glob(os.path.join(np_dir, "*.npy")):
        np_dir = os.path.join(np_dir, kids[0])
    meta = os.path.join(args.out, "metadata.json")
    gen_ckpt = pick_ckpt(
        os.path.join(args.out, "ckpt", args.model),
        log_path=os.path.join(args.out, f"training_log_{args.model}.json"),
    )
    clf_ckpt = pick_ckpt(
        os.path.join(args.out, "ckpt", "classifier"),
        log_path=os.path.join(args.out, "training_log_classifier.json"),
        classifier=True,
    )
    bands = sorted(
        d for d in os.listdir(np_dir) if os.path.isdir(os.path.join(np_dir, d))
    )
    print(f"bands: {bands}; generator {gen_ckpt}; classifier {clf_ckpt}",
          flush=True)

    gen_root = os.path.join(args.out, f"fidelity_midi_{args.model}")
    py = [sys.executable, "-m"]
    seed = 100
    # One generate call covers every band (per-composer loop inside the CLI
    # reuses the compiled runner), batch samples per band per call. Calls
    # are resumable: a complete call{c} dir (>= batch files per band, same
    # fixed seed 100+c) is skipped, so a stage timeout mid-campaign only
    # costs the unfinished call on relaunch — a backend wedge ate 25 min of
    # the first r5 xlstm stage and the timeout killed it at call 2 of 3.
    # Partial call dirs are wiped and redone whole.
    calls = (args.per_band + args.batch - 1) // args.batch
    for c in range(calls):
        cdir = os.path.join(gen_root, f"call{c}")
        per_band = [
            glob.glob(os.path.join(cdir, "*", band, "*.mid"))
            for band in bands
        ]
        if per_band and all(len(found) >= args.batch for found in per_band):
            print(f"call{c}: already complete "
                  f"({sum(len(f) for f in per_band)} files), skipping",
                  flush=True)
            continue
        shutil.rmtree(cdir, ignore_errors=True)
        run(py + ["musicgen_tpu.cli.generate", "--model", args.model,
                  "--ckpt", gen_ckpt, "--data", np_dir, "--metadata", meta,
                  "--length", str(args.length), "--batch", str(args.batch),
                  "--composers", ", ".join(bands),
                  "--output", cdir,
                  "--fused-decode", args.fused_decode,
                  "--seed", str(seed + c)])

    # Collate into band-dir layout for preprocess (band dirs under one root).
    corpus = os.path.join(args.out, f"fidelity_corpus_{args.model}", "data")
    shutil.rmtree(os.path.dirname(corpus), ignore_errors=True)
    counts = {}
    for band in bands:
        bdir = os.path.join(corpus, band)
        os.makedirs(bdir)
        i = 0
        for f in sorted(glob.glob(os.path.join(gen_root, "*", "*", band, "*.mid"))):
            shutil.copyfile(f, os.path.join(bdir, f"gen_{i:03d}.mid"))
            i += 1
        counts[band] = i
    print("generated per band:", counts, flush=True)

    gen_np = os.path.join(args.out, f"fidelity_np_{args.model}")
    run(py + ["musicgen_tpu.cli.preprocess", "--midi",
              os.path.dirname(corpus), "--out", gen_np, "--min-notes", "10"])

    # First real band token for this corpus' tokenization (the reference's
    # full-scale corpus puts bands at 314; ours depends on metadata.json).
    from musicgen_tpu.data.metadata import build_tokenization

    tok = build_tokenization(json.load(open(meta)))[0]
    band_start = min(
        v for k, v in tok["band_tokenized"].items() if k != "null"
    )
    out_json = os.path.join(args.out, f"fidelity_{args.model}.json")
    run(py + ["musicgen_tpu.cli.evaluate", "classifier", "--ckpt", clf_ckpt,
              "--data", gen_np, "--metadata", meta,
              "--band-start", str(band_start), "--out", out_json])
    res = json.load(open(out_json))
    res["n_per_band"] = counts
    res["generator"] = args.model
    json.dump(res, open(out_json, "w"), indent=2)
    print("FIDELITY", json.dumps(res, indent=2), flush=True)


if __name__ == "__main__":
    main()
