"""End-to-end slice (BASELINE.json config 1): synthesize a MIDI corpus ->
preprocess to .npy -> train a small Transformer a few steps -> greedy
generate -> decode to a valid MIDI file."""
import json
import random

import numpy as np
import jax
import jax.numpy as jnp

from musicgen_tpu.config import NUM_META, TrainValues, TransformerConfig, VOCAB
from musicgen_tpu.data.dataset import TokenDataset, make_loaders
from musicgen_tpu.data.preprocess import preprocess_midi_files
from musicgen_tpu.midi import MidiNote, decode, encode, extract_midi, note_to_midi
from musicgen_tpu.models.transformer import TransformerLM
from musicgen_tpu.sample.sampler import generate
from musicgen_tpu.train.trainer import (
    make_lm_eval_step,
    make_lm_train_step,
    make_optimizer,
)
from tests.test_tokenizer import _random_notes


def _build_corpus(tmp_path, n_files=4):
    rng = random.Random(0)
    midi_root = tmp_path / "midi" / "data"
    for band in ("BandA", "BandB"):
        (midi_root / band).mkdir(parents=True)
        for i in range(n_files // 2):
            notes = _random_notes(rng, n=220, n_channels=2)
            note_to_midi(
                decode(encode([MidiNote(**vars(n)) for n in notes])),
                str(midi_root / band / f"song{i}.mid"),
            )
    meta = {
        "artists": [
            {"name": "BandA", "year_started": 1800, "genres": ["Classical"]},
            {"name": "BandB", "year_started": 1900, "genres": ["Modern"]},
        ]
    }
    meta_path = tmp_path / "metadata.json"
    meta_path.write_text(json.dumps(meta))
    return tmp_path / "midi", tmp_path / "np", meta_path


def test_end_to_end_train_and_generate(tmp_path):
    midi_dir, np_dir, meta_path = _build_corpus(tmp_path)
    n = preprocess_midi_files(str(midi_dir), str(np_dir), min_notes=100)
    assert n == 4

    block_len = 32
    cfg = TransformerConfig(
        n_embd=32, n_heads=4, n_layer=1, block_len=block_len, dropout=0.0,
        vocab_size=VOCAB.vocab_size, metadata_vocab_size=32,
    )
    values = TrainValues(block_len=block_len, batch_size=2, test_ratio=0.25)
    dataset = TokenDataset.from_directory(
        np_dir, meta_path, block_len=block_len,
        tokenizations_path=tmp_path / "tokenization.json",
    )
    assert (tmp_path / "tokenization.json").exists()
    train_iter, test_iter = make_loaders(dataset, values, seed=0)

    model = TransformerLM(cfg)
    src, trg, meta = train_iter.sample_batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(meta))
    optimizer = make_optimizer(values)
    opt_state = optimizer.init(params)
    step = make_lm_train_step(model, optimizer, donate=False)
    eval_step = make_lm_eval_step(model)

    key = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(6):
        src, trg, meta = train_iter.sample_batch()
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(src), jnp.asarray(trg),
            jnp.asarray(meta), key,
        )
        if first_loss is None:
            first_loss = float(loss)
    assert np.isfinite(float(loss))

    val = float(eval_step(params, jnp.asarray(src), jnp.asarray(trg), jnp.asarray(meta)))
    assert np.isfinite(val)

    # Greedy conditioned generation from a dataset prompt.
    src, _, meta = test_iter.sample_batch()
    streams = generate(
        model, params, "transformer", jnp.asarray(src), jnp.asarray(meta),
        num_tokens=20, block_len=block_len, rng=jax.random.PRNGKey(2),
        greedy=True, jit=False,
    )
    streams = np.asarray(streams)
    assert streams.shape == (2, block_len + 20)

    # Decode the generated tail to a MIDI file and re-extract it.
    notes = decode([int(t) for t in streams[0]])
    out_path = str(tmp_path / "generated.mid")
    note_to_midi(notes, out_path)
    extracted = extract_midi(out_path)
    assert len(extracted) > 0
