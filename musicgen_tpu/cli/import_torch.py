"""Import a reference torch checkpoint (`.pth` state dict, reference
train.py:69-77) into a musicgen_tpu orbax checkpoint.

    python -m musicgen_tpu.cli.import_torch --model mamba \
        --pth pretrained/mamba/loss_1.23_time_....pth --out checkpoints/mamba

The output directory is a full TrainState checkpoint (params + fresh Adam
state + step 0), so it is directly usable by cli/generate.py, cli/serve.py,
cli/evaluate.py, and as a `--resume` target for cli/train.py (fine-tuning
continues with reset optimizer moments — the reference never saved them).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def load_pth(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # Some torch save styles wrap the state dict.
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "shape") for k, v in sd.items() if k != "state_dict"
    ):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--model", required=True,
        choices=("transformer", "mamba", "xlstm", "classifier"),
    )
    p.add_argument("--pth", required=True, help="reference .pth state dict")
    p.add_argument("--out", required=True, help="output checkpoint directory")
    p.add_argument(
        "--loss", type=float, default=0.0,
        help="loss recorded in the checkpoint name (reference name scheme)",
    )
    args = p.parse_args(argv)

    import jax
    import optax

    from ..config import DEFAULT_CONFIG
    from ..interop import import_state_dict
    from ..models.registry import init_params, new_model
    from ..train import trainer as T

    sd = load_pth(args.pth)
    variables = import_state_dict(args.model, sd)

    # Validate against a freshly-initialized tree: identical structure and
    # shapes, so every downstream jit/sharding path sees the usual pytree.
    model = new_model(args.model, DEFAULT_CONFIG)
    template = init_params(model, args.model)
    t_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), template)
    i_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), variables)
    if t_shapes != i_shapes:
        raise SystemExit(
            "imported tree does not match the model's param structure:\n"
            f"model: {t_shapes}\nimported: {i_shapes}"
        )

    optimizer = optax.adam(DEFAULT_CONFIG.values.learning_rate)
    state = T.TrainState(variables, optimizer.init(variables), 0)
    path = T.save_checkpoint(args.out, state, args.loss, keep=0)
    n = sum(int(np.prod(s)) for s in jax.tree_util.tree_leaves(i_shapes))
    print(f"imported {args.model} ({n:,} params incl. vocab padding) -> {path}")


if __name__ == "__main__":
    main()
