"""End-to-end learning signal: overfitting a tiny corpus must reach usable
transcripts (low CER on the TRAIN set), not merely a falling loss — the
whole chain (features -> encoder -> CTC -> Adam -> greedy decode -> CER)
has to cooperate for this to pass.
"""

import os

import numpy as np
import pytest

from pg_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from pg_asr_tpu.data.dataset import make_synthetic_corpus


@pytest.mark.slow
def test_overfit_reaches_low_train_cer(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from pg_asr_tpu.data.dataset import BatchIterator, load_manifest
    from pg_asr_tpu.data.text import Alphabet
    from pg_asr_tpu.decoding.greedy import greedy_decode, ids_to_strings
    from pg_asr_tpu.metrics import evaluate_corpus
    from pg_asr_tpu.models import bilstm_ctc
    from pg_asr_tpu.ops.features import extract_features
    from pg_asr_tpu.train import compute_loss, make_optimizer

    root = str(tmp_path / "c")
    make_synthetic_corpus(root, n_utts=8, seed=7, min_dur=0.3, max_dur=0.5)
    alphabet = Alphabet.load(os.path.join(root, "alphabet.txt"))
    cfg = Config(
        features=FeatureConfig(kind="logmel", n_mels=24, n_fft=200,
                               win_length=200, hop_length=100),
        model=ModelConfig(vocab_size=alphabet.size, input_dim=24,
                          input_proj_dim=64, hidden_size=32, num_layers=1,
                          dropout=0.0),
        train=TrainConfig(batch_size=8, warmup_steps=0, learning_rate=5e-3),
    )
    # train on ALL 8 utterances (train+dev+test of the tiny corpus) to keep
    # one fixed batch; overfitting it is the point
    utts = []
    for split in ("train.tsv", "dev.tsv", "test.tsv"):
        utts += load_manifest(os.path.join(root, split),
                              os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, 8, shuffle=False)
    batch = next(iter(it))

    params = bilstm_ctc.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    arrays = (jnp.asarray(batch.wave), jnp.asarray(batch.num_samples),
              jnp.asarray(batch.labels), jnp.asarray(batch.label_lens))

    # all 300 steps chained in ONE executable (lax.scan over the update)
    @jax.jit
    def run(params, opt_state, rng):
        def body(carry, _):
            p, s, r = carry
            loss, grads = jax.value_and_grad(
                lambda q: compute_loss(q, *arrays, cfg, train=False))(p)
            up, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, up)
            return (p, s, r), loss
        (p, s, r), losses = jax.lax.scan(body, (params, opt_state, rng),
                                         None, length=300)
        return p, losses[-1]

    params, loss = run(params, opt_state, jax.random.PRNGKey(1))

    feats, mask, flens = extract_features(arrays[0], arrays[1], cfg.features)
    lp = bilstm_ctc.apply(params, feats, mask, cfg.model, train=False)
    ids, lens = greedy_decode(lp, mask)
    hyps = ids_to_strings(ids, lens, alphabet)
    stats = evaluate_corpus(batch.texts, hyps)
    assert float(loss) < 0.5, float(loss)
    assert stats["cer_mean"] < 0.15, (stats, hyps[:3], batch.texts[:3])
