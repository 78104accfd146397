"""Test configuration: force an 8-device virtual CPU mesh so unit and
multi-chip sharding tests run deterministically on the host (the driver
validates the real TPU path separately via __graft_entry__ / bench.py).

NB: this environment force-registers an `axon` TPU platform via
sitecustomize and ignores JAX_PLATFORMS from the environment, so we must
override via jax.config AFTER import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import subprocess
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

# Force-rebuild the native tokenizer from source (make -B) so the suite
# always exercises the code in native/midi_tokenizer.cc — a stale
# libmiditok.so on disk would otherwise mask source/binary drift. Build is
# ~2 s; if the toolchain is absent the native tests skip via available().
_native = Path(__file__).resolve().parents[1] / "native"
try:
    subprocess.run(
        ["make", "-B", "-C", str(_native)], check=True, capture_output=True
    )
except Exception:
    pass

import pytest

# Fast/slow split (VERDICT r4 #6: the 37-min full suite is why round 3
# shipped red — a pre-snapshot gate must be cheap). Tests that measured
# >= 20 s in a full --durations run are listed in slow_manifest.txt and
# get the `slow` marker at collection:
#
#   pytest -m "not slow"   # fast gate, ~8 min — run after every change
#   pytest                 # full warranty, ~37 min — run before snapshot
#
# Regenerate the manifest after big suite changes with
#   pytest --durations=0 -q | grep "s call" | awk '{print $3}'
# (one-CPU box: pytest-xdist cannot help; the split is the only lever).
_SLOW = set()
_manifest = Path(__file__).parent / "slow_manifest.txt"
if _manifest.exists():
    _SLOW = {
        line.strip()
        for line in _manifest.read_text().splitlines()
        if line.strip()
    }


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: measured >= 20 s; excluded from the fast gate (-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in _SLOW:
            item.add_marker(pytest.mark.slow)
