"""Diffusion end-to-end on the TPU (VERDICT round-2 item 5).

Drives the full config-5 workload on-chip: train the piano-roll UNet on
canvases from the reference-shipped corpus (cli.train_diffusion), then
RePaint-inpaint a held-out MIDI with the trained EMA params (cli.inpaint),
and validate the output by re-extracting it. The artifact lands in
samples/diffusion/ and the wall-clock numbers go to BENCHMARKS.md.

Reference: diffusion/gaussian_diffusion.py:410-543 +
diffusion_model_testing.ipynb (which never shipped a trained model or an
end-to-end driver).

Run: python experiments/diffusion_e2e.py [--steps 400]
"""
import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = os.environ.get("DIFF_E2E_OUT", "experiments/out_gen")


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True)
    dt = time.perf_counter() - t0
    print(f"  -> {dt:.1f}s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--respacing", default="250")
    args = ap.parse_args()

    py = [sys.executable, "-m"]
    np_dir = f"{OUT}/np"
    assert os.path.isdir(np_dir), "run experiments/convergence.py first"
    ckpt = f"{OUT}/ckpt/diffusion"
    os.makedirs("samples/diffusion", exist_ok=True)

    t_train = run(py + ["musicgen_tpu.cli.train_diffusion",
                        "--data", np_dir, "--steps", str(args.steps),
                        "--batch", str(args.batch), "--width", str(args.width),
                        "--bf16", "--ckpt", ckpt])

    # Inpaint a reference-shipped source file (not part of samples/).
    src = sorted(glob.glob(f"{OUT}/midi/*/*.mid"))[0]
    out_mid = "samples/diffusion/inpainted_repaint.mid"
    t_inp = run(py + ["musicgen_tpu.cli.inpaint",
                      "--ckpt", ckpt, "--midi", src, "--out", out_mid,
                      "--width", str(args.width),
                      "--respacing", args.respacing, "--jumps", "--ema"])

    from musicgen_tpu.midi import encode, extract_midi

    notes = extract_midi(out_mid)
    toks = encode(notes)
    print(json.dumps({
        "train_steps": args.steps, "train_s": round(t_train, 1),
        "inpaint_s": round(t_inp, 1), "source": src, "out": out_mid,
        "notes": len(notes), "tokens": int(toks.size),
    }), flush=True)
    assert len(notes) > 0


if __name__ == "__main__":
    main()
