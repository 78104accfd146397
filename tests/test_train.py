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
