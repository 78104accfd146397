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

import jax

jax.config.update("jax_platforms", "cpu")
