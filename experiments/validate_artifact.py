"""Artifact validity gate (VERDICT r4 weak #3 / next-round #8).

Round 4 committed an all-zero accuracy_xlstm.json next to real results with
nothing marking it garbage. Every artifact the r5+ queues commit gets an
explicit sidecar marker: `<artifact>.VALID` or `<artifact>.INVALID <reason>`,
written by THIS script from artifact-type-specific sanity checks — never by
the producing stage's exit code alone. BENCHMARKS.md may cite only VALID
artifacts.

Usage: python experiments/validate_artifact.py TYPE PATH [PATH...]
Types:
  accuracy  — per-field accuracy JSON: all fields in (0, 1], not all zero
  fidelity  — classifier-fidelity JSON: per-band rates present, n>0 per band
  curve     — training log JSON: >= 100 optimizer steps and a val curve
  stats     — serve stats JSON: aggregate tok/s > 0
Exit code 0 iff every PATH validated VALID (markers are written either way).
"""
from __future__ import annotations

import json
import sys


def check_accuracy(d: dict) -> str | None:
    fields = {k: v for k, v in d.items()
              if isinstance(v, (int, float)) and k != "n"}
    if not fields:
        # nested layout {"accuracy": {...}} or per-field dicts with counts
        fields = {
            k: (v.get("accuracy") if isinstance(v, dict) else v)
            for k, v in d.items()
            if isinstance(v, dict) and "accuracy" in v
        }
    if not fields:
        return "no numeric accuracy fields found"
    vals = [float(v) for v in fields.values() if v is not None]
    if not vals:
        return "all accuracy fields null"
    zeros = sum(1 for v in vals if v == 0.0)
    if zeros * 2 >= len(vals):
        # r4 garbage signature: 4/5 fields exactly 0.0 (untrained model);
        # real runs on the small corpus zero at most one field
        # (experiments/r4/accuracy_mamba.json).
        return f"{zeros}/{len(vals)} fields exactly zero (untrained model?)"
    if any(not (0.0 <= v <= 1.0) for v in vals):
        return f"accuracy out of [0,1]: {fields}"
    return None


def check_fidelity(d: dict) -> str | None:
    rates = d.get("per_band") or d.get("success_rates") or {
        k: v for k, v in d.items()
        if isinstance(v, (int, float)) and k not in ("overall", "n")
    }
    if not rates:
        return "no per-band rates found"
    n = d.get("n_per_band")
    if isinstance(n, dict):
        if any(int(v) <= 0 for v in n.values()):
            return f"empty band in n_per_band: {n}"
    return None


def check_curve(entries: list) -> str | None:
    steps = sum(1 for e in entries if isinstance(e, dict) and "Step" in e)
    vals = sum(
        1 for e in entries
        if isinstance(e, dict) and "Validation Loss" in str(e.get("message", ""))
    )
    if steps < 100:
        return f"only {steps} optimizer steps logged (<100): dead run"
    if vals < 2:
        return f"only {vals} validation points: no curve"
    return None


def check_stats(d: dict) -> str | None:
    # cli.serve writes `aggregate_tok_per_s`; keep the other spellings for
    # older artifacts.
    agg = (d.get("aggregate_tok_per_s") or d.get("aggregate_tok_s")
           or d.get("aggregate_tokens_per_s"))
    if agg is None or float(agg) <= 0:
        return f"no positive aggregate throughput: {list(d)}"
    return None


CHECKS = {"accuracy": check_accuracy, "fidelity": check_fidelity,
          "curve": check_curve, "stats": check_stats}


def main() -> int:
    kind, paths = sys.argv[1], sys.argv[2:]
    ok = True
    for path in paths:
        try:
            with open(path) as f:
                data = json.load(f)
            reason = CHECKS[kind](data)
        except Exception as e:  # unreadable artifact is itself invalid
            reason = f"unreadable: {e}"
        import os

        marker = path + (".VALID" if reason is None else ".INVALID")
        # Re-validation must leave exactly ONE marker (a retry that fixes
        # an artifact must clear the stale .INVALID, and vice versa).
        for stale in (path + ".VALID", path + ".INVALID"):
            if stale != marker and os.path.exists(stale):
                os.remove(stale)
        with open(marker, "w") as f:
            f.write("ok\n" if reason is None else reason + "\n")
        print(f"{path}: {'VALID' if reason is None else 'INVALID — ' + reason}",
              flush=True)
        ok = ok and reason is None
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
