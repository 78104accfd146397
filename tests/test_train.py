"""Training-layer tests: loss semantics vs torch reference formulation,
train-step smoke (loss decreases), sharded multi-device step on the virtual
8-CPU mesh, augmentation ranges, dataset crop/pad, metadata tokenization."""
import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import (
    NUM_META,
    VOCAB,
    MambaConfig,
    MeshConfig,
    TrainValues,
    TransformerConfig,
)
from musicgen_tpu.data.augment import augment
from musicgen_tpu.data.dataset import TokenDataset, split_dataset
from musicgen_tpu.data.metadata import build_tokenization
from musicgen_tpu.models.mamba import MambaLM
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.parallel.mesh import make_mesh
from musicgen_tpu.train.distributed import build_distributed_training
from musicgen_tpu.train.loss import (
    classifier_bce,
    filtered_cross_entropy,
    make_meta_multihot,
)
from musicgen_tpu.train.trainer import (
    make_lm_eval_step,
    make_lm_train_step,
    make_optimizer,
)

SMALL_T = TransformerConfig(
    n_embd=32, n_heads=4, n_layer=2, block_len=16, dropout=0.0,
    vocab_size=VOCAB.vocab_size, metadata_vocab_size=17,
)


def _batch(rng, b=2, t=16, vocab=VOCAB.vocab_size, meta_vocab=17):
    src = jnp.asarray(rng.integers(0, vocab, (b, t)), jnp.int32)
    trg = jnp.asarray(rng.integers(0, vocab, (b, t)), jnp.int32)
    meta = jnp.asarray(rng.integers(0, meta_vocab, (b, NUM_META)), jnp.int32)
    return src, trg, meta


def test_filtered_ce_matches_torch_formulation():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from musicgen_tpu.ops.grammar import filtered_logits

    rng = np.random.default_rng(0)
    b, t, v = 2, 4, VOCAB.vocab_size
    src = rng.integers(0, v, (b, t))
    trg = rng.integers(0, v, (b, t))
    logits = rng.standard_normal((b, t, v)).astype(np.float32)

    ours = float(
        filtered_cross_entropy(jnp.asarray(src), jnp.asarray(logits), jnp.asarray(trg))
    )

    filt = np.asarray(filtered_logits(jnp.asarray(src), jnp.asarray(logits)))
    loss_t = F.cross_entropy(
        torch.tensor(filt).reshape(-1, v), torch.tensor(trg).reshape(-1)
    )
    assert np.isclose(ours, float(loss_t), rtol=1e-5, atol=1e-5)


def test_classifier_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((3, 17)).astype(np.float32)
    meta = rng.integers(0, 17, (3, NUM_META))
    ours = float(classifier_bce(jnp.asarray(logits), jnp.asarray(meta)))
    targets = np.asarray(make_meta_multihot(jnp.asarray(meta), 17))
    loss_t = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)
    )
    assert np.isclose(ours, float(loss_t), rtol=1e-5, atol=1e-6)


def test_train_step_decreases_loss():
    model = TransformerLM(SMALL_T)
    rng = np.random.default_rng(0)
    src, trg, meta = _batch(rng, t=SMALL_T.block_len)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    optimizer = make_optimizer(TrainValues(learning_rate=1e-3))
    opt_state = optimizer.init(params)
    step = make_lm_train_step(model, optimizer, donate=False)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, src, trg, meta, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_distributed_train_step_8_devices():
    """DP x TP on the virtual 8-CPU mesh: mesh (2 data, 4 model), vocab
    matrices sharded over 'model', batch over 'data'."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model = MambaLM(MambaConfig(
        d_model=32, n_layers=2, d_state=8, headdim=8, chunk_size=8,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=17,
    ))
    mesh = make_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    rng = np.random.default_rng(0)
    src, trg, meta = _batch(rng, b=4, t=16)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    params, opt_state, step_fn = build_distributed_training(model, params, mesh)
    p, o, loss1 = step_fn(params, opt_state, src, trg, meta)
    p, o, loss2 = step_fn(p, o, src, trg, meta)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)


def test_augment_preserves_field_ranges():
    rng = np.random.default_rng(0)
    stream = []
    for _ in range(64):
        stream += [
            int(rng.integers(0, VOCAB.dyn_start)),
            int(rng.integers(VOCAB.dyn_start, VOCAB.length_start)),
            int(rng.integers(VOCAB.length_start, VOCAB.time_start)),
            int(rng.integers(VOCAB.time_start, VOCAB.tempo_start)),
            int(rng.integers(VOCAB.tempo_start, VOCAB.vocab_size)),
        ]
    seq = jnp.asarray([stream], jnp.int32)
    from musicgen_tpu.ops.grammar import field_bucket

    before = np.asarray(field_bucket(seq))
    out = augment(seq, jax.random.PRNGKey(3))
    after = np.asarray(field_bucket(out))
    # Augmentation must never move a token across field boundaries.
    np.testing.assert_array_equal(before, after)


def test_dataset_crop_pad_and_meta(tmp_path):
    meta_json = {
        "artists": [
            {"name": "BandA", "year_started": 1815, "genres": ["Romantic"]},
            {"name": "BandB", "year_started": 1900,
             "genres": ["Modern", "Jazz", "Ragtime", "Blues", "Extra5"]},
        ]
    }
    mpath = tmp_path / "metadata.json"
    mpath.write_text(json.dumps(meta_json))

    d = tmp_path / "np" / "BandA"
    d.mkdir(parents=True)
    short = np.arange(10, dtype=np.int64)
    long = np.arange(100, dtype=np.int64)
    np.save(d / "short.npy", short)
    np.save(d / "long.npy", long)

    ds = TokenDataset.from_directory(
        tmp_path / "np", mpath, block_len=32, crop="start"
    )
    assert len(ds) == 2
    for i in range(2):
        src, trg, meta = ds[i]
        assert src.shape == (32,) and trg.shape == (32,)
        assert meta.shape == (NUM_META,)
        np.testing.assert_array_equal(src[1:], trg[:-1])  # shifted pair

    probs = ds.file_prob()
    assert probs.sum() == pytest.approx(1.0)
    # long file gets 10x the weight of the short one
    by_name = dict(zip([p.split("/")[-1] for p in ds.file_paths], probs))
    assert by_name["long.npy"] / by_name["short.npy"] == pytest.approx(10.0)


def test_metadata_tokenization_schema():
    meta_json = {
        "artists": [
            {"name": "A", "year_started": 1815, "genres": ["g1"]},
            {"name": "B", "year_started": 1935, "genres": ["g1", "g2"]},
        ]
    }
    tok, vectors = build_tokenization(meta_json)
    assert set(tok.keys()) == {
        "time_tokenized", "genre_tokenized", "band_tokenized", "VOCAB_SIZE"
    }
    assert tok["VOCAB_SIZE"] == (
        len(tok["time_tokenized"]) + len(tok["genre_tokenized"]) + len(tok["band_tokenized"])
    )
    va = vectors["A"]
    assert va.shape == (NUM_META,)
    assert va[0] == tok["band_tokenized"]["A"]
    assert va[1] == tok["genre_tokenized"]["g1"]
    # genre padding uses the genre None token
    assert va[2] == tok["genre_tokenized"]["null"]
    assert va[5] == tok["time_tokenized"]["1810"]


def test_split_deterministic():
    s1 = split_dataset(100, 0.2, seed=3)
    s2 = split_dataset(100, 0.2, seed=3)
    np.testing.assert_array_equal(s1.train_indices, s2.train_indices)
    assert len(s1.test_indices) == 20
    assert len(set(s1.train_indices) & set(s1.test_indices)) == 0


def test_remove_short_npy_files(tmp_path):
    from musicgen_tpu.data.preprocess import remove_short_npy_files

    d = tmp_path / "np" / "Band"
    d.mkdir(parents=True)
    np.save(d / "short.npy", np.arange(100, dtype=np.int64))
    np.save(d / "long.npy", np.arange(2000, dtype=np.int64))
    assert remove_short_npy_files(str(tmp_path / "np"), min_length=1030, dry_run=True) == 1
    assert (d / "short.npy").exists()
    assert remove_short_npy_files(str(tmp_path / "np"), min_length=1030) == 1
    assert not (d / "short.npy").exists()
    assert (d / "long.npy").exists()


def test_full_batches_deterministic_pass(tmp_path):
    """full_batches covers every file exactly once, in order, in fixed-size
    chunks (the reference's get_dataloader_full(shuffle=False) protocol)."""
    from musicgen_tpu.data.dataset import full_batches

    meta_json = {"artists": [{"name": "B", "year_started": 1815,
                              "genres": ["Romantic"]}]}
    mpath = tmp_path / "metadata.json"
    mpath.write_text(json.dumps(meta_json))
    d = tmp_path / "np" / "B"
    d.mkdir(parents=True)
    for i in range(7):
        np.save(d / f"f{i}.npy", np.full(40, i, dtype=np.int64))

    ds = TokenDataset.from_directory(tmp_path / "np", mpath, block_len=16,
                                     crop="start")
    batches = list(full_batches(ds, batch_size=2))
    assert len(batches) == 3  # 7 files, batch 2, short tail dropped
    seen = [int(src[0][0]) for src, _, _ in batches] + [
        int(src[1][0]) for src, _, _ in batches
    ]
    assert sorted(seen) == sorted(
        int(np.load(p)[0]) for p in ds.file_paths[:6]
    )
    # deterministic across invocations
    again = list(full_batches(ds, batch_size=2))
    for (a, _, _), (b, _, _) in zip(batches, again):
        np.testing.assert_array_equal(a, b)


def _single_device_step(model, params, optimizer, src, trg, meta, kind="lm"):
    """Plain unsharded train step: the parity oracle for the SPMD path."""
    from musicgen_tpu.train.loss import classifier_bce as bce
    from musicgen_tpu.train.loss import filtered_cross_entropy as fce

    if kind == "classifier":
        def loss_fn(p):
            return bce(model.apply(p, src), meta)
    else:
        def loss_fn(p):
            return fce(src, model.apply(p, src, meta), trg)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    import optax

    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    new_params = optax.apply_updates(params, updates)
    return loss, grads, new_params


def _tiny_model(kind):
    """(model, kind, init_fn) at tiny dims, full vocab (TP shards it)."""
    from musicgen_tpu.config import ClassifierConfig, XLSTMConfig
    from musicgen_tpu.models.xlstm import XLSTMClassifier, XLSTMLM

    if kind == "mamba":
        m = MambaLM(MambaConfig(
            d_model=32, n_layers=2, d_state=8, headdim=8, chunk_size=8,
            vocab_size=VOCAB.vocab_size, metadata_vocab_size=17,
        ))
        return m, lambda src, meta: m.init(jax.random.PRNGKey(0), src, meta)
    if kind == "transformer":
        m = TransformerLM(SMALL_T)
        return m, lambda src, meta: m.init(jax.random.PRNGKey(0), src, meta)
    if kind == "xlstm":
        m = XLSTMLM(XLSTMConfig(
            embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
            context_length=16 + NUM_META, vocab_size=VOCAB.vocab_size,
            metadata_vocab_size=17,
        ))
        return m, lambda src, meta: m.init(jax.random.PRNGKey(0), src, meta)
    if kind == "classifier":
        m = XLSTMClassifier(ClassifierConfig(
            embedding_dim=32, num_blocks=2, slstm_at=(1,), num_heads=4,
            context_length=16, vocab_size=VOCAB.vocab_size,
            metadata_vocab_size=17,
        ))
        return m, lambda src, meta: m.init(jax.random.PRNGKey(0), src)
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["mamba", "transformer", "xlstm", "classifier"])
def test_distributed_step_matches_single_device(kind):
    """A wrong sharding spec must fail CI: the 8-device SPMD step must
    produce the SAME loss and updated params as the plain single-device
    step on the identical batch, for EVERY model type the reference trains
    under DDP (train_parallel.py:143-235, train_classifier.py:38-145).
    Covers both the pure-DP mesh and the DPxTP mesh with vocab-sharded
    lm_head/embedding."""
    from musicgen_tpu.train.trainer import make_optimizer as mk_opt

    model, init = _tiny_model(kind)
    loss_kind = "classifier" if kind == "classifier" else "lm"
    rng = np.random.default_rng(1)
    src, trg, meta = _batch(rng, b=8, t=16)
    params = init(src, meta)
    optimizer = mk_opt()
    ref_loss, _, ref_params = _single_device_step(
        model, params, optimizer, src, trg, meta, kind=loss_kind
    )

    for data, tp in ((8, 1), (2, 4)):
        mesh = make_mesh(MeshConfig(data=data, model=tp), jax.devices()[:8])
        # step_fn donates its inputs; give each mesh its own param copy so
        # donation can't delete buffers shared with `params`/`ref_params`.
        fresh = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
        p, o, step_fn = build_distributed_training(
            model, fresh, mesh, kind=loss_kind
        )
        new_p, _, loss = step_fn(p, o, src, trg, meta)
        np.testing.assert_allclose(
            float(loss), float(ref_loss), rtol=1e-5,
            err_msg=f"{kind} mesh {data}x{tp} loss != single-device loss",
        )
        flat_ref = jax.tree_util.tree_leaves(ref_params)
        flat_new = jax.tree_util.tree_leaves(jax.device_get(new_p))
        for a, b in zip(flat_ref, flat_new):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=f"{kind} mesh {data}x{tp} param drift after one step",
            )


def test_tp_logits_match_replicated():
    """Vocab-sharded (TP) forward logits == fully-replicated logits.
    Catches a subtly wrong _param_spec for the lm_head/embedding shards."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from musicgen_tpu.parallel.mesh import batch_sharding, param_shardings

    model = MambaLM(MambaConfig(
        d_model=32, n_layers=2, d_state=8, headdim=8, chunk_size=8,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=17,
    ))
    rng = np.random.default_rng(2)
    src, trg, meta = _batch(rng, b=4, t=16)
    params = model.init(jax.random.PRNGKey(0), src, meta)
    ref_logits = np.asarray(model.apply(params, src, meta))

    mesh = make_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    pspec = param_shardings(params, mesh)
    sharded = jax.device_put(params, pspec)
    fwd = jax.jit(
        model.apply,
        in_shardings=(pspec, batch_sharding(mesh), batch_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P()),
    )
    tp_logits = np.asarray(jax.device_get(fwd(sharded, src, meta)))
    np.testing.assert_allclose(tp_logits, ref_logits, rtol=2e-4, atol=2e-5)


def test_distributed_step_with_loss_chunk_matches():
    """The chunked grammar-CE must survive GSPMD: DP and DPxTP (vocab-
    sharded lm_head inside the checkpointed chunk scan) must match the
    single-device unchunked step."""
    from musicgen_tpu.train.trainer import make_optimizer as mk_opt

    model, init = _tiny_model("mamba")
    rng = np.random.default_rng(3)
    src, trg, meta = _batch(rng, b=8, t=16)
    params = init(src, meta)
    optimizer = mk_opt()
    ref_loss, _, ref_params = _single_device_step(
        model, params, optimizer, src, trg, meta, kind="lm"
    )
    for data, tp in ((8, 1), (2, 4)):
        mesh = make_mesh(MeshConfig(data=data, model=tp), jax.devices()[:8])
        fresh = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
        p, o, step_fn = build_distributed_training(
            model, fresh, mesh, kind="lm", loss_chunk=8
        )
        new_p, _, loss = step_fn(p, o, src, trg, meta)
        np.testing.assert_allclose(
            float(loss), float(ref_loss), rtol=1e-5,
            err_msg=f"chunked mesh {data}x{tp} loss mismatch",
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_params),
            jax.tree_util.tree_leaves(jax.device_get(new_p)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=f"chunked mesh {data}x{tp} param drift",
            )
