"""Checkpoint sanity gating for evaluation harnesses.

Round 4 lesson: a crash-time checkpoint of near-init weights (named
`loss_0.00` by the old sentinel bug, trainer.py:263) was consumed blindly
by the accuracy/fidelity/windowed-parity watchers, burning ~an hour of TPU
time measuring an untrained model and committing a garbage all-zero
`accuracy_xlstm.json` (experiments/r4/). Every harness that loads a
trained checkpoint must go through this module instead of `newest by
mtime`:

  * name gate  — the loss tag parsed from the reference-format name
    `loss_{val:.2f}_time_{ts}` must be finite and nonzero (0.00 val loss
    on a 17,914-way vocabulary is not achievable by training; it is the
    round-4 crash sentinel. inf/nan are the round-5 crash sentinels,
    trainer.checkpoint_name).
  * log gate   — when the producing run's JSON training log is available
    (reference {'Step','Loss'} schema, train.py:148-217), the run must
    contain >= min_steps real optimizer steps. A log with only
    "Training started!" means the run died before learning anything.

select_checkpoint() returns the best (lowest-parsed-loss) SANE checkpoint,
which also matches the reference's pick-best-val-afterwards protocol
(reference train.py:69-77) better than mtime order.
"""
from __future__ import annotations

import json
import math
import os
from typing import Optional


def parsed_loss(path: str) -> float:
    """Loss tag from a reference-format checkpoint dir name (inf if unparseable)."""
    try:
        v = float(os.path.basename(path).split("_")[1])
        return float("inf") if math.isnan(v) else v
    except (IndexError, ValueError):
        return float("inf")


def is_sane_checkpoint(path: str) -> bool:
    """Name gate: finite, nonzero parsed loss."""
    v = parsed_loss(path)
    return math.isfinite(v) and v > 0.005  # loss_0.00 rounds from < 0.005


def count_log_steps(log_path: str) -> int:
    """Number of real optimizer-step entries in a reference-schema JSON log."""
    try:
        with open(log_path) as f:
            entries = json.load(f)
    except (OSError, ValueError):
        return 0
    return sum(1 for e in entries if isinstance(e, dict) and "Step" in e)


def select_checkpoint(
    ckpt_dir: str,
    log_path: Optional[str] = None,
    min_steps: int = 20,
    classifier: bool = False,
) -> str:
    """Best sane checkpoint in `ckpt_dir`, or raise with a diagnostic.

    classifier=True drops the nonzero-loss name gate (a BCE classifier
    legitimately reaches ~0.01 and could round to 0.01 but never 0.00 —
    keep the gate) — currently identical; kept as an explicit knob so a
    future looser policy is a one-line change.
    """
    entries = sorted(
        (
            os.path.join(ckpt_dir, d)
            for d in os.listdir(ckpt_dir)
            if d.startswith("loss_")
        ),
        key=os.path.getmtime,
    )
    if not entries:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    sane = [p for p in entries if is_sane_checkpoint(p)]
    if not sane:
        raise RuntimeError(
            f"all {len(entries)} checkpoints under {ckpt_dir} fail the "
            f"sanity name gate (crash-save sentinels?): "
            f"{[os.path.basename(p) for p in entries]}"
        )
    if log_path is not None and os.path.exists(log_path):
        steps = count_log_steps(log_path)
        if steps < min_steps:
            raise RuntimeError(
                f"training log {log_path} records only {steps} optimizer "
                f"steps (< {min_steps}); refusing to evaluate checkpoints "
                f"from a run that died before training ({ckpt_dir})"
            )
    # Lowest parsed loss; ties broken by recency (entries are mtime-sorted).
    return min(sane, key=parsed_loss)
