"""Train-step throughput + MFU for all four models (VERDICT round-2 item 4).

Default: the reference fidelity shape (B2 T2048), fp32 and bf16.
--batch "2,8,16,32": bf16 batch-scaling sweep with an MFU column
(6*N*B*T matmul-FLOPs estimate over the v5e's 197 TFLOP/s bf16 peak).
"""
import argparse
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp

from musicgen_tpu.config import NUM_META, DEFAULT_CONFIG
from musicgen_tpu.models.registry import new_model
from musicgen_tpu.train import trainer as T

TT = 2048
V5E_BF16_PEAK = 197e12


def make_batch(b):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 17914, (b, TT + 1)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, 568, (b, NUM_META)), jnp.int32)
    return tokens[:, :-1], tokens[:, 1:], meta


def bench(kind, dtype, batch, reps=6, remat=False, loss_chunk=0):
    src, trg, meta = make_batch(batch)
    cfg = DEFAULT_CONFIG
    if remat and hasattr(getattr(cfg, kind), "remat"):
        import dataclasses
        cfg = dataclasses.replace(cfg, **{
            kind: dataclasses.replace(getattr(cfg, kind), remat=True)})
    model = new_model(kind, cfg, dtype=dtype)
    if kind == "classifier":
        params = model.init(jax.random.PRNGKey(0), src[:, :16])
        opt = T.make_optimizer()
        step = T.make_classifier_train_step(model, opt, donate=False)
        args0 = (params, opt.init(params), src, meta)
    else:
        params = model.init(jax.random.PRNGKey(0), src[:, :16], meta)
        opt = T.make_optimizer()
        step = T.make_lm_train_step(model, opt, donate=False,
                                    loss_chunk=loss_chunk)
        args0 = (params, opt.init(params), src, trg, meta, jax.random.PRNGKey(1))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    out = step(*args0)
    np.asarray(out[-1])
    p, os_ = out[0], out[1]
    t0 = time.perf_counter()
    for _ in range(reps):
        args = (p, os_) + args0[2:]
        out = step(*args)
        p, os_ = out[0], out[1]
    np.asarray(out[-1])
    dt = (time.perf_counter() - t0) / reps
    toks = batch * TT
    flops = 6.0 * n_params * toks  # fwd 2x + bwd 4x matmul FLOPs
    mfu = flops / dt / V5E_BF16_PEAK
    lever = ("+remat" if remat else "") + (f"+chunk{loss_chunk}" if loss_chunk else "")
    print(
        f"{kind:12s} {np.dtype(dtype).name:9s} B{batch:<3d}{lever:12s}: {1/dt:6.2f} steps/s "
        f"({dt*1e3:6.0f} ms)  {toks/dt/1e3:7.1f}k tok/s  MFU {mfu*100:5.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=None,
                    help="comma list for a bf16 batch sweep, e.g. 2,8,16,32")
    ap.add_argument("--models", default="mamba,xlstm,transformer,classifier")
    ap.add_argument("--single", default=None,
                    help="internal: run ONE config 'kind:batch' and exit")
    args = ap.parse_args()

    if args.single:
        # kind:batch[:remat:loss_chunk]
        parts = args.single.split(":")
        kind, b = parts[0], int(parts[1])
        remat = len(parts) > 2 and parts[2] == "1"
        chunk = int(parts[3]) if len(parts) > 3 else 0
        bench(kind, jnp.bfloat16, b, remat=remat, loss_chunk=chunk)
        sys.exit(0)

    kinds = args.models.split(",")
    if args.batch:
        # One subprocess per config: the remote TPU backend does not free
        # device memory between configs in one process (serial sweeps OOM
        # after the first model), so isolate each point.
        import subprocess
        for kind in kinds:
            for b in (int(x) for x in args.batch.split(",")):
                r = subprocess.run(
                    [sys.executable, __file__, "--single", f"{kind}:{b}"])
                if r.returncode != 0:
                    # Plain config exceeds HBM at this batch — retry with the
                    # memory levers (per-layer remat + chunked grammar-CE).
                    print(f"{kind} B{b}: plain OOM rc={r.returncode}; "
                          "retrying with remat+loss-chunk", flush=True)
                    r = subprocess.run(
                        [sys.executable, __file__, "--single",
                         f"{kind}:{b}:1:256"])
                    if r.returncode != 0:
                        print(f"{kind} B{b}: FAILED rc={r.returncode}",
                              flush=True)
    else:
        for kind in kinds:
            for dtype in (jnp.float32, jnp.bfloat16):
                try:
                    bench(kind, dtype, 2)
                except Exception as e:
                    print(f"{kind} {dtype}: FAILED {type(e).__name__}: {e}", flush=True)
