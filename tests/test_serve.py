"""Continuous-batching scheduler (serve/scheduler.py): greedy streams must
equal the one-shot sampler exactly, independent of slot placement, batch
composition, and admission order; stochastic streams must be a pure
function of (params, prompt, seed)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.sample.sampler import generate
from musicgen_tpu.serve import BatchScheduler

SMALL = MambaConfig(
    d_model=32, n_layers=2, d_state=8, d_conv=4, expand=2, headdim=8,
    chunk_size=8, vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
)
PROMPT_LEN = 16


def _prompt(rng):
    # Grammar-plausible field-cycled stream.
    out = []
    while len(out) < PROMPT_LEN:
        out.append(int(rng.integers(0, VOCAB.dyn_start)))
        out.append(int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)))
        out.append(int(rng.integers(VOCAB.length_start, VOCAB.time_start)))
        out.append(int(rng.integers(VOCAB.time_start, VOCAB.time_start + 16)))
        out.append(int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)))
    return np.asarray(out[:PROMPT_LEN], np.int32)


@pytest.fixture(scope="module")
def setup():
    model = MambaLM(SMALL)
    rng = np.random.default_rng(0)
    prompts = [_prompt(rng) for _ in range(5)]
    metas = [
        np.asarray(rng.integers(0, 9, (NUM_META,)), np.int32)
        for _ in range(5)
    ]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prompts[0])[None],
        jnp.asarray(metas[0])[None],
    )
    return model, params, prompts, metas


def _oracle(model, params, prompt, meta, n):
    """One-shot greedy stream via the production sampler."""
    out = generate(
        model, params, "mamba",
        jnp.asarray(prompt)[None], jnp.asarray(meta)[None],
        n, PROMPT_LEN, jax.random.PRNGKey(0), greedy=True, fused=False,
    )
    return np.asarray(out)[0, PROMPT_LEN:]


def test_greedy_matches_oneshot_mixed_lengths(setup):
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN,
    )
    lengths = [6, 11, 3]
    ids = [
        sched.submit(prompts[i], metas[i], lengths[i]) for i in range(3)
    ]
    res = sched.run()
    assert sorted(res) == sorted(ids)
    for i, rid in enumerate(ids):
        want = _oracle(model, params, prompts[i], metas[i], lengths[i])
        np.testing.assert_array_equal(
            res[rid], want,
            err_msg=f"request {i} (len {lengths[i]}) diverged",
        )


def test_admission_after_retire(setup):
    """More requests than slots: the 3rd request is admitted only when a
    slot frees mid-run; its stream must still match the one-shot oracle."""
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=1, chunk=4,
        greedy=True, block_len=PROMPT_LEN,
    )
    ids = [sched.submit(prompts[i], metas[i], 5) for i in range(3)]
    res = sched.run()
    for i, rid in enumerate(ids):
        want = _oracle(model, params, prompts[i], metas[i], 5)
        np.testing.assert_array_equal(res[rid], want)


def test_stochastic_stream_is_composition_independent(setup):
    """Same (prompt, seed) must yield the same tokens whether the request
    runs alone in a 1-slot pool or beside others in a 4-slot pool."""
    model, params, prompts, metas = setup

    def run_pool(slots, reqs):
        sched = BatchScheduler(
            model, params, "mamba", prompt_len=PROMPT_LEN, slots=slots,
            chunk=4, greedy=False, block_len=PROMPT_LEN,
        )
        ids = [
            sched.submit(prompts[i], metas[i], 8, seed=100 + i)
            for i in reqs
        ]
        return {r: t for r, t in zip(reqs, map(sched.run().__getitem__, ids))}

    solo = run_pool(1, [2])
    crowd = run_pool(4, [0, 1, 2, 3])
    np.testing.assert_array_equal(solo[2], crowd[2])


@pytest.fixture(scope="module")
def tsetup():
    from musicgen_tpu.config import TransformerConfig
    from musicgen_tpu.models.transformer import TransformerLM

    model = TransformerLM(TransformerConfig(
        n_embd=32, n_heads=4, n_layer=2, block_len=PROMPT_LEN, dropout=0.0,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=9,
    ))
    rng = np.random.default_rng(1)
    prompts = [_prompt(rng) for _ in range(4)]
    metas = [
        np.asarray(rng.integers(0, 9, (NUM_META,)), np.int32)
        for _ in range(4)
    ]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prompts[0])[None],
        jnp.asarray(metas[0])[None],
    )
    return model, params, prompts, metas


def _t_oracle(model, params, prompt, meta, n):
    out = generate(
        model, params, "transformer",
        jnp.asarray(prompt)[None], jnp.asarray(meta)[None],
        n, PROMPT_LEN, jax.random.PRNGKey(0), greedy=True, fused=False,
    )
    return np.asarray(out)[0, PROMPT_LEN:]


def test_transformer_greedy_matches_oneshot_mixed_lengths(tsetup):
    """Per-slot ring-KV geometry: transformer requests at different stream
    offsets (mixed lengths + mid-run admission) must match the one-shot
    sampler token for token. Lengths > block_len exercise the ring wrap."""
    model, params, prompts, metas = tsetup
    sched = BatchScheduler(
        model, params, "transformer", prompt_len=PROMPT_LEN, slots=2,
        chunk=4, greedy=True, block_len=PROMPT_LEN,
    )
    lengths = [6, 11, 3, 20]  # 4 requests over 2 slots; 20 wraps the ring
    ids = [
        sched.submit(prompts[i], metas[i], lengths[i]) for i in range(4)
    ]
    res = sched.run()
    for i, rid in enumerate(ids):
        want = _t_oracle(model, params, prompts[i], metas[i], lengths[i])
        np.testing.assert_array_equal(
            res[rid], want,
            err_msg=f"transformer request {i} (len {lengths[i]}) diverged",
        )


def test_transformer_stochastic_composition_independent(tsetup):
    model, params, prompts, metas = tsetup

    def run_pool(slots, reqs):
        sched = BatchScheduler(
            model, params, "transformer", prompt_len=PROMPT_LEN,
            slots=slots, chunk=4, greedy=False, block_len=PROMPT_LEN,
        )
        ids = [sched.submit(prompts[i], metas[i], 8, seed=7 + i)
               for i in reqs]
        return {r: t for r, t in zip(reqs, map(sched.run().__getitem__, ids))}

    solo = run_pool(1, [1])
    crowd = run_pool(3, [0, 1, 2])
    np.testing.assert_array_equal(solo[1], crowd[1])


def test_xlstm_greedy_matches_oneshot():
    """xLSTM serving: position-independent step, mixed lengths."""
    from musicgen_tpu.config import XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMLM

    model = XLSTMLM(XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=PROMPT_LEN + NUM_META, vocab_size=VOCAB.vocab_size,
        metadata_vocab_size=9,
    ))
    rng = np.random.default_rng(2)
    prompts = [_prompt(rng) for _ in range(3)]
    metas = [np.asarray(rng.integers(0, 9, (NUM_META,)), np.int32)
             for _ in range(3)]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prompts[0])[None], jnp.asarray(metas[0])[None],
    )
    sched = BatchScheduler(
        model, params, "xlstm", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN,
    )
    lengths = [6, 9, 3]
    ids = [sched.submit(prompts[i], metas[i], lengths[i]) for i in range(3)]
    res = sched.run()
    for i, rid in enumerate(ids):
        want = generate(
            model, params, "xlstm",
            jnp.asarray(prompts[i])[None], jnp.asarray(metas[i])[None],
            lengths[i], PROMPT_LEN, jax.random.PRNGKey(0), greedy=True,
            fused=False,
        )
        np.testing.assert_array_equal(
            res[rid], np.asarray(want)[0, PROMPT_LEN:],
            err_msg=f"xlstm request {i} diverged",
        )


def test_transformer_mesh_sharded_matches(tsetup):
    """The batched ring-KV geometry step must also shard over the 'data'
    mesh (per-row ages/slots are batch-leading like everything else)."""
    from musicgen_tpu.config import MeshConfig
    from musicgen_tpu.parallel.mesh import make_mesh

    model, params, prompts, metas = tsetup
    mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    kw = dict(prompt_len=PROMPT_LEN, chunk=4, greedy=True,
              block_len=PROMPT_LEN)
    dist = BatchScheduler(model, params, "transformer", slots=8, mesh=mesh,
                          **kw)
    ids = [dist.submit(prompts[i], metas[i], 5) for i in range(3)]
    res = dist.run()
    for i, rid in enumerate(ids):
        want = _t_oracle(model, params, prompts[i], metas[i], 5)
        np.testing.assert_array_equal(
            res[rid], want, err_msg=f"mesh transformer request {i} diverged"
        )


def test_latency_stats_accounting(setup):
    """stats() reports every completed request with sane orderings:
    submit <= admit <= first chunk <= done."""
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=1, chunk=4,
        greedy=True, block_len=PROMPT_LEN,
    )
    ids = [sched.submit(prompts[i], metas[i], 5) for i in range(2)]
    sched.run()
    st = sched.stats()
    assert sorted(st) == sorted(ids)
    for rid in ids:
        s = st[rid]
        assert 0.0 <= s["queue_wait_s"] <= s["ttfc_s"] <= s["wall_s"]
        assert s["tokens"] == 5.0 and s["tok_per_s"] > 0


def test_mesh_sharded_scheduler_matches_single_device(setup):
    """Distributed serving: the slot pool sharded over an 8-device 'data'
    mesh must produce bit-identical streams to the single-device scheduler
    (per-request RNG is slot-independent, params replicate)."""
    from musicgen_tpu.config import MeshConfig
    from musicgen_tpu.parallel.mesh import make_mesh

    model, params, prompts, metas = setup
    mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    # 5 distinct requests over 8 sharded slots, mixed lengths + stochastic.
    kw = dict(prompt_len=PROMPT_LEN, chunk=4, greedy=False,
              block_len=PROMPT_LEN)
    dist = BatchScheduler(model, params, "mamba", slots=8, mesh=mesh, **kw)
    solo = BatchScheduler(model, params, "mamba", slots=2, **kw)
    lengths = [6, 11, 3, 8, 5]
    ids_d = [dist.submit(prompts[i], metas[i], lengths[i], seed=50 + i)
             for i in range(5)]
    ids_s = [solo.submit(prompts[i], metas[i], lengths[i], seed=50 + i)
             for i in range(5)]
    res_d, res_s = dist.run(), solo.run()
    for i in range(5):
        np.testing.assert_array_equal(
            res_d[ids_d[i]], res_s[ids_s[i]],
            err_msg=f"mesh-sharded request {i} diverged",
        )


def test_mesh_rejects_bad_config(setup):
    from musicgen_tpu.config import MeshConfig
    from musicgen_tpu.parallel.mesh import make_mesh

    model, params, prompts, metas = setup
    mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    with pytest.raises(ValueError, match="divide"):
        BatchScheduler(model, params, "mamba", prompt_len=PROMPT_LEN,
                       slots=6, mesh=mesh)
    tp_mesh = make_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    with pytest.raises(ValueError, match="data-parallel"):
        BatchScheduler(model, params, "mamba", prompt_len=PROMPT_LEN,
                       slots=8, mesh=tp_mesh, fused=True)


def test_mesh_fused_chunk_matches_single_device(setup):
    """Fused-kernel serving under the 'data' mesh: the Pallas chunk runs
    inside shard_map (each device decodes its slot shard, pack replicated)
    and must produce bit-identical greedy streams to the single-device
    fused scheduler AND the one-shot sampler oracle."""
    from musicgen_tpu.config import MeshConfig
    from musicgen_tpu.parallel.mesh import make_mesh

    model, params, prompts, metas = setup
    mesh = make_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    kw = dict(prompt_len=PROMPT_LEN, chunk=4, greedy=True,
              block_len=PROMPT_LEN, fused=True)
    dist = BatchScheduler(model, params, "mamba", slots=8, mesh=mesh, **kw)
    solo = BatchScheduler(model, params, "mamba", slots=2, **kw)
    lengths = [6, 9, 3]
    ids_d = [dist.submit(prompts[i], metas[i], lengths[i]) for i in range(3)]
    ids_s = [solo.submit(prompts[i], metas[i], lengths[i]) for i in range(3)]
    res_d, res_s = dist.run(), solo.run()
    for i in range(3):
        np.testing.assert_array_equal(
            res_d[ids_d[i]], res_s[ids_s[i]],
            err_msg=f"mesh-fused request {i} diverged from single-device",
        )
    for i in range(3):
        want = _oracle(model, params, prompts[i], metas[i], lengths[i])
        np.testing.assert_array_equal(
            res_d[ids_d[i]], want,
            err_msg=f"mesh-fused request {i} diverged from oracle",
        )


def test_xlstm_fused_chunk_matches_oneshot():
    """The xLSTM fused-kernel chunk path (interpret mode on CPU) must
    produce the same greedy streams as the XLA path — pins the
    stack/unstack state conversion at the chunk edges."""
    from musicgen_tpu.config import XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMLM

    cfg = XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=PROMPT_LEN + NUM_META, vocab_size=VOCAB.vocab_size,
        metadata_vocab_size=9,
    )
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(5)
    prompts = [_prompt(rng) for _ in range(2)]
    metas = [np.asarray(rng.integers(0, 9, (NUM_META,)), np.int32)
             for _ in range(2)]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prompts[0])[None], jnp.asarray(metas[0])[None],
    )
    sched = BatchScheduler(
        model, params, "xlstm", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN, fused=True,
    )
    ids = [sched.submit(prompts[i], metas[i], 6) for i in range(2)]
    res = sched.run()
    for i, rid in enumerate(ids):
        want = generate(
            model, params, "xlstm",
            jnp.asarray(prompts[i])[None], jnp.asarray(metas[i])[None],
            6, PROMPT_LEN, jax.random.PRNGKey(0), greedy=True, fused=False,
        )
        np.testing.assert_array_equal(
            res[rid], np.asarray(want)[0, PROMPT_LEN:],
            err_msg=f"xlstm fused request {i} diverged",
        )


def test_xlstm_sb16_chunk_streams_valid():
    """quant='bf16-sb16' (bf16-STORED mLSTM matrix memory) through the
    scheduler: at tiny size with a random init the storage rounding may
    flip near-tie greedy picks, so this pins plumbing + validity — the
    suffix routes to the fused path, states keep their storage dtype
    across chunk edges, and streams are in-vocab.  Numeric drift bounds
    live in tests/test_pallas_xlstm_decode.py::test_fused_xlstm_step_bf16_state."""
    from musicgen_tpu.config import XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMLM

    cfg = XLSTMConfig(
        embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
        context_length=PROMPT_LEN + NUM_META, vocab_size=VOCAB.vocab_size,
        metadata_vocab_size=9,
    )
    model = XLSTMLM(cfg)
    rng = np.random.default_rng(7)
    prompts = [_prompt(rng) for _ in range(2)]
    metas = [np.asarray(rng.integers(0, 9, (NUM_META,)), np.int32)
             for _ in range(2)]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(prompts[0])[None], jnp.asarray(metas[0])[None],
    )
    sched = BatchScheduler(
        model, params, "xlstm", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN, quant="bf16-sb16", fused=True,
    )
    assert sched._fused and sched._state_bf16 and sched.quant == "bf16"
    ids = [sched.submit(prompts[i], metas[i], 6) for i in range(2)]
    res = sched.run()
    for rid in ids:
        toks = np.asarray(res[rid])
        assert toks.shape == (6,)
        assert (toks >= 0).all() and (toks < VOCAB.vocab_size).all()


def test_fused_chunk_matches_oneshot(setup):
    """The fused-kernel chunk path (interpret mode on CPU) must produce the
    same greedy streams as the XLA path — this pins the model-format <->
    stacked-layout conversion at the chunk edges."""
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN, fused=True,
    )
    ids = [sched.submit(prompts[i], metas[i], 6) for i in range(2)]
    res = sched.run()
    for i, rid in enumerate(ids):
        want = _oracle(model, params, prompts[i], metas[i], 6)
        np.testing.assert_array_equal(
            res[rid], want, err_msg=f"fused request {i} diverged"
        )


def test_xlstm_vmem_estimator_calibration():
    """fused_vmem_bytes must reproduce the one measured Mosaic OOM dump
    (experiments/r4/serve_xlstm_int8w.log: 166.71 MiB scoped VMEM at
    B=8 int8w f32-state vs the 128 MiB chip ceiling) and admit the
    measured-working configs (BENCHMARKS.md sampling table)."""
    from musicgen_tpu.config import DEFAULT_CONFIG
    from musicgen_tpu.models.registry import init_params, new_model
    from musicgen_tpu.ops.pallas_xlstm_decode import (
        FUSED_VMEM_CEILING,
        fused_vmem_bytes,
        fused_vmem_fits,
    )

    model = new_model("xlstm", DEFAULT_CONFIG, dtype=jnp.float32)
    # eval_shape end to end: no full-size params are materialized.
    shapes = jax.eval_shape(lambda: init_params(model, "xlstm", block_len=16))
    MiB = 1024 * 1024
    est = fused_vmem_bytes(shapes, model.cfg, 8, quant="int8w")
    assert 160 * MiB < est < 175 * MiB, f"calibration drifted: {est/MiB:.1f}"
    assert est > FUSED_VMEM_CEILING
    # Known-working points must be admitted.
    assert fused_vmem_fits(shapes, model.cfg, 2, quant="int8w")
    assert fused_vmem_fits(
        shapes, model.cfg, 2, quant="int8w", state_dtype=jnp.bfloat16
    )
    assert fused_vmem_fits(
        shapes, model.cfg, 2, quant="bf16", state_dtype=jnp.bfloat16
    )
    # The measured-OOM point must be rejected...
    assert not fused_vmem_fits(shapes, model.cfg, 8, quant="int8w")
    # ...while halving the state (sb16) brings a full 8-slot pool back
    # under the kernel's 110 MiB request.
    assert fused_vmem_fits(
        shapes, model.cfg, 8, quant="int8w", state_dtype=jnp.bfloat16
    )


def test_fused_oom_falls_back_to_xla_step(setup):
    """A Mosaic VMEM OOM at chunk-compile time must not kill the server:
    the scheduler rebuilds the chunk program around the XLA step and the
    in-flight requests stream on, equal to the one-shot sampler."""
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN, fused=False,
    )
    # Simulate the fused path having been selected and its compile OOMing
    # (the exact failure string the remote compiler returned in
    # experiments/r4/serve_xlstm_int8w.log).
    sched._fused = True
    sched._fused_pack = sched.params  # stand-in; the raiser consumes it

    def boom(p, s):
        raise RuntimeError(
            "XLA:TPU compile permanent error. Ran out of memory in "
            "memory space vmem. Used 166.71M of 128.00M vmem."
        )

    sched.__dict__["_jit_chunk"] = boom  # poison the cached_property
    ids = [sched.submit(prompts[i], metas[i], 5) for i in range(2)]
    with pytest.warns(UserWarning, match="falling back to the XLA step"):
        res = sched.run()
    assert not sched._fused and sched._fused_pack is None
    for i, rid in enumerate(ids):
        want = _oracle(model, params, prompts[i], metas[i], 5)
        np.testing.assert_array_equal(
            res[rid], want, err_msg=f"post-fallback request {i} diverged"
        )


def test_fused_non_oom_error_propagates(setup):
    """Only the VMEM-OOM signature triggers the fallback — an unrelated
    compile error must surface, not be silently retried on XLA."""
    model, params, prompts, metas = setup
    sched = BatchScheduler(
        model, params, "mamba", prompt_len=PROMPT_LEN, slots=2, chunk=4,
        greedy=True, block_len=PROMPT_LEN, fused=False,
    )
    sched._fused = True
    sched._fused_pack = sched.params

    def boom(p, s):
        raise RuntimeError("Mosaic lowering failed: unsupported op")

    sched.__dict__["_jit_chunk"] = boom
    sched.submit(prompts[0], metas[0], 5)
    with pytest.raises(RuntimeError, match="Mosaic lowering failed"):
        sched.run()
