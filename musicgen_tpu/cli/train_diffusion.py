"""Diffusion training CLI (BASELINE.json config 5: "Diffusion UNet over
encoded sequences", the workload the reference cannot train —
its gaussian_diffusion.py lacks training_losses).

  python -m musicgen_tpu.cli.train_diffusion --data data/np \
      --steps 10000 --width 128 [--bf16]

Canvases are built from the token corpus via decode -> piano-roll
(diffusion/canvas.py), normalized to [-1, 1], randomly cropped.
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    DiffusionDefaults,
    RandomSnippet,
    create_canvas,
    create_model_and_diffusion,
    normalize_canvas,
    train_diffusion,
)
from ..data.dataset import find_token_files
from ..midi import decode


def main() -> None:
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # kills the 2-4 min recompile on every fresh process
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help=".npy token corpus root")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--width", type=int, default=128, help="canvas time width")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-files", type=int, default=200)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--ckpt", default=None,
                   help="directory to save {params, ema} (orbax)")
    p.add_argument("--ema-rate", type=float, default=0.9999)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    paths = find_token_files(args.data)[: args.max_files]
    canvases = []
    for path in paths:
        tokens = np.load(path)
        notes = decode([int(t) for t in tokens[:4000]])
        if not notes:
            continue
        canvases.append(normalize_canvas(create_canvas(notes)))
    print(f"built {len(canvases)} canvases")

    defaults = DiffusionDefaults(image_size=128)
    model, diffusion = create_model_and_diffusion(
        defaults, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    snippets = RandomSnippet(canvases, width=args.width, seed=args.seed)

    def batches():
        while True:
            yield snippets.sample(args.batch)

    params, ema = train_diffusion(
        model, diffusion, batches(), num_steps=args.steps,
        learning_rate=args.lr, seed=args.seed, ema_rate=args.ema_rate,
        return_ema=True,
    )
    if args.ckpt:
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(args.ckpt)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, {"params": params, "ema": ema}, force=True)
        ckpt.wait_until_finished()
        print(f"saved params + EMA to {path}")


if __name__ == "__main__":
    main()
