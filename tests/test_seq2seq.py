"""Attention seq2seq family: shapes, loss parity vs torch NLLLoss semantics,
teacher-forced overfit, greedy generation."""

import numpy as np
import pytest

from pg_asr_tpu.config import ModelConfig, Seq2SeqConfig
from pg_asr_tpu.losses import masked_mean_nll, summed_nll_loss


def _cfgs(vocab=7):
    enc = ModelConfig(vocab_size=vocab, input_dim=12, input_proj_dim=16,
                      hidden_size=8, num_layers=1, dropout=0.0)
    dec = Seq2SeqConfig(vocab_size=vocab, embed_dim=8, dec_hidden=16)
    return enc, dec


def test_teacher_forced_shapes_and_grads():
    import jax
    import jax.numpy as jnp
    from pg_asr_tpu.models import seq2seq

    enc_cfg, dec_cfg = _cfgs()
    params = seq2seq.init_params(jax.random.PRNGKey(0), enc_cfg, dec_cfg)
    B, T, Td = 2, 9, 5
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, T, 12)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    targets = rng.integers(1, 7, (B, Td)).astype(np.int32)

    lp = seq2seq.apply_teacher_forced(params, feats, mask, targets,
                                      enc_cfg, dec_cfg)
    assert lp.shape == (B, Td, 7)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)

    def loss_fn(p):
        out = seq2seq.apply_teacher_forced(p, feats, mask, targets,
                                           enc_cfg, dec_cfg)
        return summed_nll_loss(out, jnp.asarray(targets))

    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(np.asarray(t)))
               for t in jax.tree_util.tree_leaves(g))


def test_summed_nll_matches_torch_contract():
    """summed_nll_loss == sum_t NLLLoss(ignore_index=0)(inp[:, t], tgt[:, t])
    (the reference loss contract with the pad-ignore bug fixed)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, T, A = 3, 5, 6
    lp = rng.standard_normal((B, T, A)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    tgt = rng.integers(0, A, (B, T)).astype(np.int64)
    tgt[0, -2:] = 0  # some pads

    ours = float(summed_nll_loss(lp, tgt.astype(np.int32)))
    crit = torch.nn.NLLLoss(ignore_index=0)
    ref = sum(
        float(crit(torch.tensor(lp[:, t]), torch.tensor(tgt[:, t])))
        for t in range(T) if (tgt[:, t] != 0).any()
    )
    assert ours == pytest.approx(ref, rel=1e-5)


def test_seq2seq_overfits_tiny():
    import jax
    import jax.numpy as jnp
    import optax
    from pg_asr_tpu.models import seq2seq

    enc_cfg, dec_cfg = _cfgs(vocab=5)
    params = seq2seq.init_params(jax.random.PRNGKey(0), enc_cfg, dec_cfg)
    rng = np.random.default_rng(2)
    B, T, Td = 2, 8, 4
    feats = rng.standard_normal((B, T, 12)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    targets = np.array([[1, 2, 3, 4], [4, 3, 2, 1]], np.int32)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            lp = seq2seq.apply_teacher_forced(p, feats, mask, targets,
                                              enc_cfg, dec_cfg)
            return masked_mean_nll(lp, jnp.asarray(targets))

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    toks, lps = seq2seq.greedy_generate(params, feats, mask, enc_cfg, dec_cfg,
                                        max_steps=Td)
    assert toks.shape == (B, Td)
