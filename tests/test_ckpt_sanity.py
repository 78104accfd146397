"""Round-4 postmortem regressions: crash-time checkpoints must never be
named `loss_0.00`, never win best-val retention, and never be consumed by
an evaluation harness (VERDICT r4 weak #1 / missing #1).

The failure chain being pinned: the xLSTM run died at step 1, the
`finally:` crash-save stamped near-init weights `loss_0.00`, the pruner
retained them as best-by-parsed-loss forever, and the watcher harnesses
(newest-by-mtime) measured an untrained model for an hour
(experiments/r4/accuracy_xlstm.json, all-zero)."""
import json
import math
import os
import time

import pytest

from musicgen_tpu.train.trainer import checkpoint_name
from musicgen_tpu.utils.ckpt_sanity import (
    count_log_steps,
    is_sane_checkpoint,
    parsed_loss,
    select_checkpoint,
)


def test_crash_sentinel_names_inf_not_zero():
    # The pre-first-eval sentinel is inf (trainer.train_lm), which must
    # format to a name whose parsed loss is inf — not 0.00.
    name = checkpoint_name(float("inf"))
    assert name.startswith("loss_inf_time_")
    assert math.isinf(parsed_loss(name))
    # NaN losses (diverged run) normalize to inf, keeping min() sane.
    assert parsed_loss(checkpoint_name(float("nan"))) == float("inf")


def test_name_gate_rejects_sentinels():
    assert not is_sane_checkpoint("loss_inf_time_2026-08-20-06-31-36")
    assert not is_sane_checkpoint("loss_0.00_time_2026-08-20-06-31-36")
    assert not is_sane_checkpoint("loss_nan_time_2026-08-20-06-31-36")
    assert is_sane_checkpoint("loss_5.76_time_2026-08-20-06-01-05")
    assert is_sane_checkpoint("loss_0.01_time_2026-08-20-07-03-32")  # classifier


def _mk(dirpath, names):
    for i, n in enumerate(names):
        p = os.path.join(dirpath, n)
        os.makedirs(p)
        # Distinct mtimes in listing order, oldest first.
        t = time.time() - (len(names) - i) * 60
        os.utime(p, (t, t))


def test_select_prefers_best_sane(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    _mk(d, [
        "loss_6.17_time_a",
        "loss_5.65_time_b",
        "loss_0.00_time_c",   # crash-save, NEWEST — the r4 trap
        "loss_inf_time_d",    # r5-style crash-save
    ])
    assert os.path.basename(select_checkpoint(d)) == "loss_5.65_time_b"


def test_select_raises_when_only_garbage(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    _mk(d, ["loss_0.00_time_c"])
    with pytest.raises(RuntimeError, match="sanity name gate"):
        select_checkpoint(d)
    with pytest.raises(FileNotFoundError):
        select_checkpoint(str(tmp_path / "empty"))


def test_log_gate_refuses_dead_runs(tmp_path):
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    _mk(d, ["loss_5.65_time_b"])
    # The r4 xLSTM log: exactly one "Training started!" message, no steps.
    dead = tmp_path / "training_log_xlstm.json"
    dead.write_text(json.dumps(
        [{"timestamp": "t", "message": "Training started!"}]
    ))
    assert count_log_steps(str(dead)) == 0
    with pytest.raises(RuntimeError, match="optimizer steps"):
        select_checkpoint(d, log_path=str(dead))

    live = tmp_path / "training_log_ok.json"
    live.write_text(json.dumps(
        [{"timestamp": "t", "message": "Training started!"}]
        + [{"Step": i, "Loss": "5.0000"} for i in range(1, 31)]
    ))
    assert select_checkpoint(d, log_path=str(live))
    # A missing log is not a failure (resumed runs relocate logs).
    assert select_checkpoint(d, log_path=str(tmp_path / "nope.json"))


def test_pruner_never_retains_inf_as_best(tmp_path):
    """save_checkpoint keeps best-by-parsed-loss; inf must never be 'best'."""
    import jax
    import jax.numpy as jnp
    import optax

    from musicgen_tpu.train.trainer import TrainState, save_checkpoint

    params = {"w": jnp.zeros((2, 2))}
    opt = optax.sgd(1e-3)
    state = TrainState(params, opt.init(params), 0)
    d = str(tmp_path / "ckpt")
    # Crash-save first (inf), then three real saves; keep=2 prunes to the
    # newest 2 + best. The inf dir must be pruned, not retained as best.
    save_checkpoint(d, state, float("inf"), keep=2)
    time.sleep(0.01)
    for loss in (6.0, 5.5, 5.7):
        time.sleep(0.01)
        save_checkpoint(d, state, loss, keep=2)
    names = sorted(os.listdir(d))
    assert not any(n.startswith("loss_inf") for n in names), names
    assert any(n.startswith("loss_5.50") for n in names), names
