"""Kernel implementation dispatch: 'auto' -> Pallas on accelerators.

The forward-only Pallas kernels (pallas_ssd, pallas_slstm, pallas_decode)
are the fast path on TPU; pure-XLA oracles remain the differentiable/CPU
path. `jax.default_backend()` is resolved at trace time, so jitted callers
bake in the right branch per backend.
"""
from __future__ import annotations

import jax


def resolve_impl(impl: str, cpu_fallback: str = "xla", accel: str = "pallas") -> str:
    """'auto' -> `accel` unless running on CPU; explicit values unchanged."""
    if impl == "auto":
        return accel if jax.default_backend() != "cpu" else cpu_fallback
    return impl
