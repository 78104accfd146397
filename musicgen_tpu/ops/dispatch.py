"""Kernel implementation dispatch: 'auto' -> Pallas on accelerators.

The forward-only Pallas kernels (pallas_ssd, pallas_slstm, pallas_decode)
are the fast path on TPU; pure-XLA oracles remain the differentiable/CPU
path. `jax.default_backend()` is resolved at trace time, so jitted callers
bake in the right branch per backend.
"""
from __future__ import annotations

import jax


def resolve_impl(impl: str) -> str:
    """'auto' -> 'pallas' unless running on CPU; 'xla'/'pallas' unchanged."""
    if impl == "auto":
        return "pallas" if jax.default_backend() != "cpu" else "xla"
    return impl
