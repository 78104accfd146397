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
