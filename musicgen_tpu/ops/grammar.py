"""Grammar/loss-shaping ops ("filtered logits").

Reproduces the reference's allowed-next-token weighting exactly
(reference: train.py:79-138, duplicated in train_parallel.py:83-141), but the
5 x vocab mask is built ONCE as a constant instead of being re-materialized
every training step (reference rebuilds it per call, train.py:125).

Field-transition semantics (including the off-by-one quirks that shape what
the trained model sees — each field's LAST token is excluded from its mask
row except tempo):

  prev in pitch  -> allow dyn    [16512, 16639)
  prev in dyn    -> allow length [16640, 17151) * linspace(1,3,511)
  prev in length -> allow time   [17152, 17663)  U  tempo [17664, 17914)
  prev in time   -> allow tempo  [17664, 17914)
  prev in tempo  -> allow pitch  [0, 16511) * 10

The filtered value is  -log_softmax(logits) * mask ; the trainer feeds it to
cross-entropy as if it were a logit vector, and the sampler treats it as an
unnormalized probability vector — both counterintuitive, both reproduced
faithfully (SURVEY.md "Hard parts").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VOCAB, VocabLayout


def grammar_mask(
    layout: VocabLayout = VOCAB, length_weights: str = "linspace"
) -> jax.Array:
    """(5, vocab) float32 allowed-next-token weights.

    Built from iota arithmetic (NOT a dense literal) so that jitted programs
    using it stay small — this environment ships compiled modules over an
    HTTP boundary with a strict size limit, and a 5x17914 dense constant
    alone blows past it.

    length_weights: 'linspace' (the reference's live path, train.py:18) or
    'empirical' (the frozen corpus-measured tensor from
    scripts/length_distribution.py — see ops/length_distribution.py).
    """
    d = layout.disc
    v = layout.vocab_size
    ids = jnp.arange(v)  # lowers to iota

    def in_range(lo, hi):
        return ((ids >= lo) & (ids < hi)).astype(jnp.float32)

    row0 = in_range(layout.dyn_start, layout.length_start - 1)
    if length_weights == "empirical":
        from .length_distribution import empirical_length_weights

        emp = empirical_length_weights(d.length - 1)  # small (511,) constant
        off = jnp.clip(ids - layout.length_start, 0, d.length - 2)
        lin = emp[off]
    else:
        # linspace(1, 3, d.length - 1) over the length range (last excluded)
        lin = 1.0 + 2.0 * (ids - layout.length_start).astype(jnp.float32) / float(
            d.length - 2
        )
    row1 = in_range(layout.length_start, layout.time_start - 1) * lin
    row2 = in_range(layout.time_start, layout.tempo_start - 1) + in_range(
        layout.tempo_start, v
    )
    row3 = in_range(layout.tempo_start, v)
    row4 = in_range(layout.pitch_start, layout.dyn_start - 1) * 10.0
    return jnp.stack([row0, row1, row2, row3, row4])


def field_bucket(tokens: jax.Array, layout: VocabLayout = VOCAB) -> jax.Array:
    """Token -> field bucket in {0:pitch, 1:dyn, 2:length, 3:time, 4:tempo}.

    Matches torch.bucketize(right=False) over the reference boundaries
    (train.py:117-124): boundary values themselves bucket LOW.
    """
    boundaries = jnp.asarray(layout.field_boundaries, dtype=tokens.dtype)
    return jnp.searchsorted(boundaries, tokens, side="left").astype(jnp.int32)


def pick_weights_by_prev_token(
    prev_tokens: jax.Array, layout: VocabLayout = VOCAB
) -> jax.Array:
    """(..., ) int tokens -> (..., vocab) mask rows (reference train.py:114-131)."""
    mask = grammar_mask(layout)
    return mask[field_bucket(prev_tokens, layout)]


def filtered_logits(
    prev_tokens: jax.Array, logits: jax.Array, layout: VocabLayout = VOCAB
) -> jax.Array:
    """-log_softmax(logits) * grammar_weights(prev_tokens).

    Matches reference train.py:133-138 (`filtered_logit`). `prev_tokens` are
    the input tokens at each position (the token PRECEDING the prediction),
    logits the model output at the same positions.
    """
    weights = pick_weights_by_prev_token(prev_tokens, layout)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -log_probs * weights
