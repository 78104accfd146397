"""Grammar-filter semantics tests, cross-checked against an independent
torch reimplementation of the reference's make_distributions /
pick_distributions_by_prev_token / filtered_logit (reference train.py:79-138)."""
import numpy as np
import jax.numpy as jnp
import pytest

from musicgen_tpu.config import VOCAB
from musicgen_tpu.ops.grammar import (
    field_bucket,
    filtered_logits,
    grammar_mask,
    pick_weights_by_prev_token,
)


def _torch_reference_mask():
    """Independent re-derivation of the reference mask using torch ops, to
    guard the exact off-by-one semantics of train.py:79-111."""
    torch = pytest.importorskip("torch")
    v = VOCAB.vocab_size
    length_tensor = torch.linspace(1, 3, steps=VOCAB.disc.length - 1)
    distributions = torch.zeros(5, v)
    start = [VOCAB.pitch_start, VOCAB.dyn_start, VOCAB.length_start,
             VOCAB.time_start, VOCAB.tempo_start]
    end = [VOCAB.dyn_start - 1, VOCAB.length_start - 1, VOCAB.time_start - 1,
           VOCAB.tempo_start - 1, v]
    for token in range(5):
        distributions[token - 1, start[token]:end[token]] = 1
    distributions[2, start[4]:end[4]] = 1
    distributions[1, VOCAB.length_start:VOCAB.time_start - 1] *= length_tensor
    distributions[4, VOCAB.pitch_start:VOCAB.dyn_start - 1] *= 10
    return distributions.numpy()


def test_mask_matches_reference_semantics():
    ours = np.asarray(grammar_mask())
    theirs = _torch_reference_mask()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-6)


def test_mask_off_by_one_quirks():
    m = np.asarray(grammar_mask())
    # Last token of each field range is excluded (reference end = start-1)
    assert m[0, VOCAB.length_start - 1] == 0.0  # last dyn token
    assert m[1, VOCAB.time_start - 1] == 0.0  # last length token
    assert m[2, VOCAB.tempo_start - 1] == 0.0  # last time token
    assert m[4, VOCAB.dyn_start - 1] == 0.0  # last pitch token
    # ...but tempo's range runs to the end of the vocab
    assert m[3, VOCAB.vocab_size - 1] == 1.0
    assert m[2, VOCAB.vocab_size - 1] == 1.0  # length->tempo allowed
    # Pitch boost
    assert m[4, 0] == 10.0
    # Length weighting endpoints
    assert m[1, VOCAB.length_start] == pytest.approx(1.0)
    assert m[1, VOCAB.time_start - 2] == pytest.approx(3.0)


def test_field_bucket_boundaries():
    tokens = jnp.asarray([
        0, VOCAB.dyn_start - 1, VOCAB.dyn_start, VOCAB.length_start - 1,
        VOCAB.length_start, VOCAB.time_start - 1, VOCAB.time_start,
        VOCAB.tempo_start - 1, VOCAB.tempo_start, VOCAB.vocab_size - 1,
    ])
    # torch.bucketize(right=False): boundary values bucket LOW
    expected = [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]
    assert list(np.asarray(field_bucket(tokens))) == expected


def test_pick_weights_vs_torch_bucketize():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, VOCAB.vocab_size, size=(4, 64))
    boundaries = torch.tensor(list(VOCAB.field_boundaries))
    buckets_t = torch.bucketize(torch.tensor(tokens), boundaries, right=False).numpy()
    ours = np.asarray(field_bucket(jnp.asarray(tokens)))
    np.testing.assert_array_equal(ours, buckets_t)
    picked = np.asarray(pick_weights_by_prev_token(jnp.asarray(tokens)))
    theirs = _torch_reference_mask()[buckets_t]
    np.testing.assert_allclose(picked, theirs, atol=1e-6)


def test_filtered_logits_values():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    prev = rng.integers(0, VOCAB.vocab_size, size=(2, 8))
    logits = rng.standard_normal((2, 8, VOCAB.vocab_size)).astype(np.float32)

    ours = np.asarray(filtered_logits(jnp.asarray(prev), jnp.asarray(logits)))

    lt = torch.tensor(logits)
    log_probs = F.log_softmax(lt, dim=-1)
    weights = torch.tensor(_torch_reference_mask())[
        torch.bucketize(torch.tensor(prev), torch.tensor(list(VOCAB.field_boundaries)), right=False)
    ]
    theirs = (-log_probs * weights).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
