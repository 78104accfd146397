"""Inference timing probes (reference: scripts/test_inference.ipynb cell 1 —
time 100 forwards of a (2, 2048) batch; memory via device stats)."""
from __future__ import annotations

import time
from typing import Callable, Dict

import jax


def time_forward(
    apply_fn: Callable, params, src, meta, iters: int = 100
) -> Dict[str, float]:
    fn = jax.jit(lambda p, s, m: apply_fn(p, s, m))
    out = fn(params, src, meta)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, src, meta)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    per = elapsed / iters
    b, t = src.shape
    return {
        "ms_per_forward": per * 1e3,
        "tokens_per_sec": b * t / per,
    }


def device_memory_stats() -> Dict[str, float]:
    stats = {}
    for d in jax.local_devices():
        s = getattr(d, "memory_stats", lambda: None)()
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
            }
    return stats
