"""Sequence-parallel memory scaling study (compile-time analysis).

Quantifies WHY the SP training path exists: per-device activation/temp
memory of the full-size Mamba train step at growing block lengths,
single-device vs time-sharded over an 8-device mesh. Uses XLA's
compile-time memory analysis (per-device; no execution needed, so the
full-size model at 32k context can be analyzed on any backend).

NB: XLA_FLAGS must be set BEFORE jax initializes a backend — a later
clear_backends does not reliably re-read the device-count flag (a 1-device
"mesh" then silently yields full-size "sharded" numbers; measured).

NB2: the remat/loss-chunk rows UNDERSTATE those modes on TPU. The CPU
scheduler does not reschedule rematerialized computation for liveness
(remat shows +22% flops here but ~no temp change; one mixer's backward is
1.18 GiB and the un-chunked loss only ~1.2 GiB of the 11 GiB, the rest
being the 10 layers' saved residuals that remat eliminates only under a
memory-aware scheduler). experiments/mem_probe.py measures the REAL fit
boundary on the chip. The SP rows ARE structural (sharded shapes) and
transfer directly.

Run: python experiments/sp_memory.py [--shards 8] [--blocks 2042,8186,32762]
(block + 6 must divide shards; defaults give streams 2048/8192/32768)
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--blocks", default="2042,8186,32762")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.shards}"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() >= args.shards, jax.devices()

    from jax.sharding import Mesh

    from musicgen_tpu.config import NUM_META, MambaConfig
    from musicgen_tpu.models.mamba import MambaLM
    from musicgen_tpu.parallel.sp_train import sp_loss
    from musicgen_tpu.train.loss import filtered_cross_entropy

    cfg = MambaConfig()  # full reference size
    model = MambaLM(cfg)
    mesh = Mesh(np.asarray(jax.devices()[: args.shards]), ("sp",))

    def report(label, lowered):
        m = lowered.compile().memory_analysis()
        if m is None:
            print(f"{label}: no memory analysis on this backend")
            return None
        print(
            f"{label}: temp {m.temp_size_in_bytes/2**30:7.2f} GiB  "
            f"args {m.argument_size_in_bytes/2**30:6.2f}  "
            f"out {m.output_size_in_bytes/2**30:6.2f}",
            flush=True,
        )
        return m.temp_size_in_bytes

    b = args.batch
    for blk in (int(x) for x in args.blocks.split(",")):
        src = jnp.zeros((b, blk), jnp.int32)
        trg = jnp.zeros((b, blk), jnp.int32)
        meta = jnp.zeros((b, NUM_META), jnp.int32)
        params_shape = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), src[:, :16], meta)
        )
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), params_shape
        )

        single = jax.jit(jax.grad(
            lambda p: filtered_cross_entropy(src, model.apply(p, src, meta), trg)
        )).lower(params)
        t_single = report(f"block {blk:6d} single-device grad", single)

        import dataclasses

        from musicgen_tpu.train.loss import chunked_filtered_cross_entropy

        def chunked(m):
            def loss(p):
                hid = m.apply(p, src, meta, method="hidden")
                head = p["params"]["lm_head"]
                return chunked_filtered_cross_entropy(
                    src, hid, head["kernel"], head["bias"], trg,
                    cfg.vocab_size, chunk=256,
                )
            return loss

        ck = jax.jit(jax.grad(chunked(model))).lower(params)
        report(f"block {blk:6d} single + loss-chunk ", ck)

        rmodel = MambaLM(dataclasses.replace(cfg, remat=True))
        both = jax.jit(jax.grad(chunked(rmodel))).lower(params)
        report(f"block {blk:6d} single + chunk+remat", both)

        sp = jax.jit(jax.grad(
            lambda p: sp_loss(p, src, trg, meta, cfg, mesh, chunk=256)
        )).lower(params)
        t_sp = report(f"block {blk:6d} sp x{args.shards} per-dev ", sp)
        if t_single and t_sp:
            print(f"    -> per-device temp reduction {t_single/t_sp:5.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
