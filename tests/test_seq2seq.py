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


def test_beam_size_1_equals_greedy():
    """beam_generate(K=1) must reproduce greedy_generate exactly (token for
    token, up to the first EOS)."""
    import jax
    from pg_asr_tpu.models import seq2seq

    enc_cfg, dec_cfg = _cfgs()
    params = seq2seq.init_params(jax.random.PRNGKey(3), enc_cfg, dec_cfg)
    B, T, S = 3, 11, 12
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((B, T, 12)).astype(np.float32)
    mask = np.ones((B, T), np.float32)

    g_toks, _ = seq2seq.greedy_generate(params, feats, mask, enc_cfg,
                                        dec_cfg, max_steps=S)
    b_toks, b_lens, _ = seq2seq.beam_generate(params, feats, mask, enc_cfg,
                                              dec_cfg, beam_size=1,
                                              max_steps=S)
    g = np.asarray(g_toks)
    b = np.asarray(b_toks)
    for i in range(B):
        eos = np.where(g[i] == 0)[0]
        L = int(eos[0]) if len(eos) else S
        assert int(b_lens[i]) == L
        np.testing.assert_array_equal(b[i, :L], g[i, :L])
        assert (b[i, L:] == 0).all()  # zero-padded after EOS


def _host_beam_oracle(params, enc_out, fmask, dec_cfg, K, S,
                      length_norm=0.6):
    """Reference beam search for ONE utterance: Python loop over a beam
    LIST (score, last_tok, h, c, finished, tokens) — same NN math through
    the model's own primitives, independent SEARCH structure (sorted
    candidate list vs the vectorized (K*A) top_k)."""
    import jax.numpy as jnp
    from pg_asr_tpu.models.bilstm_ctc import linear
    from pg_asr_tpu.models.seq2seq import _attend
    from pg_asr_tpu.ops.lstm import _gate_step

    H = dec_cfg.dec_hidden
    W, U, b = (params["dec_lstm"]["W"], params["dec_lstm"]["U"],
               params["dec_lstm"]["b"])
    h0 = jnp.zeros((1, H), enc_out.dtype)
    beams = [(0.0, 0, h0, h0, False, [])]
    for _ in range(S):
        cands = []
        for score, last, h, c, fin, toks in beams:
            if fin:
                cands.append((score, 0, h, c, True, toks + [0]))
                continue
            x = params["embed"][last][None]
            pre = x @ W + h @ U + b
            h2, c2 = _gate_step(h, c, pre, H)
            ctx = _attend(h2[:, None, :], enc_out[None], fmask[None])[:, 0]
            import jax
            lp = np.asarray(jax.nn.log_softmax(
                linear(params["output"],
                       jnp.concatenate([h2, ctx], -1)).astype(jnp.float32),
                -1))[0]
            for a in range(len(lp)):
                cands.append((score + float(lp[a]), a, h2, c2, a == 0,
                              toks + [a]))
        cands.sort(key=lambda t: -t[0])
        beams = cands[:K]

    def norm(score, toks):
        L = toks.index(0) if 0 in toks else S
        return score / max(((5.0 + L) / 6.0) ** length_norm, 1e-6), L

    ranked = [(norm(s, t)[0], norm(s, t)[1], t)
              for (s, _, _, _, _, t) in beams]
    ranked.sort(key=lambda r: -r[0])
    best_score, L, toks = ranked[0]
    return [tok if i < L else 0 for i, tok in enumerate(toks)], L, best_score


def test_beam_matches_host_oracle():
    """Device beam search vs the per-utterance Python oracle: same
    sequences, lengths, and normalized scores."""
    import jax
    import jax.numpy as jnp
    from pg_asr_tpu.models import seq2seq

    enc_cfg, dec_cfg = _cfgs()
    params = seq2seq.init_params(jax.random.PRNGKey(5), enc_cfg, dec_cfg)
    B, T, S, K = 3, 9, 8, 3
    rng = np.random.default_rng(6)
    feats = rng.standard_normal((B, T, 12)).astype(np.float32)
    mask = np.ones((B, T), np.float32)

    toks, lens, scores = seq2seq.beam_generate(params, feats, mask, enc_cfg,
                                               dec_cfg, beam_size=K,
                                               max_steps=S)
    enc_out = seq2seq.encode(params["encoder"], jnp.asarray(feats),
                             jnp.asarray(mask), enc_cfg)
    for i in range(B):
        want_toks, want_len, want_score = _host_beam_oracle(
            params, enc_out[i], jnp.asarray(mask[i]), dec_cfg, K, S)
        np.testing.assert_array_equal(np.asarray(toks[i]), want_toks)
        assert int(lens[i]) == want_len
        np.testing.assert_allclose(float(scores[i]), want_score, rtol=1e-4)
