"""Driver entry-point tests: dryrun_multichip on the 8-device virtual CPU
mesh, and eval harness smoke."""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_eval_accuracy_harness():
    from musicgen_tpu.config import NUM_META, VOCAB, MambaConfig
    from musicgen_tpu.eval.accuracy import FIELDS, evaluate_accuracy
    from musicgen_tpu.models.mamba import MambaLM

    cfg = MambaConfig(
        d_model=32, n_layers=1, d_state=8, headdim=8, chunk_size=8,
        metadata_vocab_size=9,
    )
    model = MambaLM(cfg)
    rng = np.random.default_rng(0)
    src = rng.integers(0, VOCAB.vocab_size, (2, 16))
    trg = rng.integers(0, VOCAB.vocab_size, (2, 16))
    meta = rng.integers(0, 9, (2, NUM_META))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(src, jnp.int32),
                        jnp.asarray(meta, jnp.int32))
    acc = evaluate_accuracy(
        lambda p, s, m: model.apply(p, s, m), params,
        [(src.astype(np.int32), trg.astype(np.int32), meta.astype(np.int32))],
    )
    assert set(acc.keys()) == set(FIELDS)


def test_eval_classifier_harness():
    from musicgen_tpu.config import ClassifierConfig
    from musicgen_tpu.eval.classifier_eval import evaluate_success_rates
    from musicgen_tpu.models.xlstm import XLSTMClassifier

    cfg = ClassifierConfig(
        embedding_dim=16, num_blocks=2, slstm_at=(1,), num_heads=2,
        context_length=8, vocab_size=50, metadata_vocab_size=20,
    )
    model = XLSTMClassifier(cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 50, (4, 8)).astype(np.int32)
    meta = np.stack([[12, 1, 1, 1, 1, 2]] * 4).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens))
    rates = evaluate_success_rates(
        lambda p, t: model.apply(p, t), params, [(tokens, meta)], band_start=10
    )
    assert set(rates.keys()) == {12}
    assert 0.0 <= rates[12] <= 1.0
