"""JSON step-log schema parity + curve parsing (reference format:
[{'Step','Loss'}...] interleaved with [{'timestamp','message'}...])."""
import json

from musicgen_tpu.eval.curves import parse_log, summarize
from musicgen_tpu.train.trainer import JsonLogger


def test_json_logger_schema_and_curves(tmp_path):
    path = str(tmp_path / "training_log_test.json")
    logger = JsonLogger(path)
    logger.message("Training started!")
    for step, loss in [(10, 2.5), (20, 2.0), (30, 1.5)]:
        logger.step(step, loss)
    logger.message("Epoch [1/10], Validation Loss: 1.8000")
    logger.flush()

    entries = json.load(open(path))
    assert entries[0].keys() == {"timestamp", "message"}
    assert entries[1] == {"Step": 10, "Loss": "2.5000"}  # reference schema

    data = parse_log(path)
    assert data["steps"] == [10, 20, 30]
    assert data["losses"] == [2.5, 2.0, 1.5]
    assert data["val_losses"] == [1.8]

    summary = summarize(path)
    assert summary["num_steps"] == 30
    assert summary["min_loss"] == 1.5
    assert summary["best_val_loss"] == 1.8


def test_field_histograms():
    import numpy as np
    from musicgen_tpu.config import VOCAB
    from musicgen_tpu.eval.distributions import (
        field_histograms,
        pitch_channel_marginals,
        summarize,
    )

    arr = np.asarray([
        5, 128 + 5,  # pitch 5 ch0, pitch 5 ch1
        VOCAB.dyn_start + 64,
        VOCAB.length_start + 10,
        VOCAB.time_start + 3,
        VOCAB.tempo_start + 120,
    ])
    hists = field_histograms([arr])
    assert hists["pitch"].sum() == 2
    assert hists["dynamics"][64] == 1
    assert hists["length"][10] == 1
    assert hists["time"][3] == 1
    assert hists["tempo"][120] == 1

    marg = pitch_channel_marginals(hists["pitch"])
    assert marg["pitch"][5] == 2
    assert marg["channel"][0] == 1 and marg["channel"][1] == 1

    s = summarize(hists)
    assert s["tempo"]["mode"] == 120
