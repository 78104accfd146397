"""Kernel implementation dispatch: 'auto' -> Pallas on accelerators.

The forward-only Pallas kernels (pallas_ssd, pallas_slstm, pallas_decode)
are the fast path on TPU; pure-XLA oracles remain the differentiable/CPU
path. `jax.default_backend()` is resolved at trace time, so jitted callers
bake in the right branch per backend.
"""
from __future__ import annotations

import jax


def resolve_impl(impl: str, cpu_fallback: str = "xla", accel: str = "pallas") -> str:
    """'auto' -> `accel` only on TPU backends; explicit values unchanged.

    The Pallas kernels use pallas.tpu (Mosaic) primitives, so 'auto' must
    NOT select them on GPU or other non-TPU accelerators — they would fail
    to lower rather than fall back. The axon tunnel backend is TPU.
    """
    if impl == "auto":
        backend = jax.default_backend()
        return accel if backend in ("tpu", "axon") else cpu_fallback
    return impl
