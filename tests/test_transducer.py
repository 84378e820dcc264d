"""RNN-T transducer family: loss (vs numpy-oracle DP, itself validated
against brute-force path enumeration), lattice padding invariance, gradient
health, greedy decode (vs a per-utterance numpy host oracle), overfit, and
end-to-end through the train/predict drivers.

The reference has no transducer (CTC + unfinished seq2seq only), so the
oracles here are independent reimplementations, mirroring the test strategy
SURVEY.md §4 prescribes for components without a reference golden.
"""

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.config import (Config, FeatureConfig, ModelConfig,
                               TrainConfig, TransducerConfig,
                               TransformerConfig)
from pg_asr_tpu.models import transducer
from pg_asr_tpu.ops.transducer import (joint_log_probs, transducer_loss,
                                       transducer_loss_mean)


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

def oracle_nll(lp_blank, lp_label, T, U):
    """Straightforward t-major double-loop lattice DP (float64)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            s = -np.inf
            if t > 0:
                s = np.logaddexp(s, alpha[t - 1, u] + lp_blank[t - 1, u])
            if u > 0:
                s = np.logaddexp(s, alpha[t, u - 1] + lp_label[t, u - 1])
            alpha[t, u] = s
    return -(alpha[T - 1, U] + lp_blank[T - 1, U])


def brute_force_nll(lp_blank, lp_label, T, U):
    """Enumerate every monotone lattice path (T-1 blanks + U labels in any
    interleaving) and logsumexp the path scores. Exponential — tiny T, U
    only. Validates the oracle DP."""
    total = -np.inf
    seen = set()  # permutations of a multiset repeat arrangements; dedup
    for moves in itertools.permutations(["b"] * (T - 1) + ["l"] * U):
        if moves in seen:
            continue
        seen.add(moves)
        t, u, s = 0, 0, 0.0
        for m in moves:
            if m == "b":
                s += lp_blank[t, u]
                t += 1
            else:
                s += lp_label[t, u]
                u += 1
        s += lp_blank[T - 1, U]  # terminating blank
        total = np.logaddexp(total, s)
    return -total


def _rand_tables(rng, T, U):
    lp_blank = rng.standard_normal((T, U + 1)) - 1.0
    lp_label = rng.standard_normal((T, U)) - 1.0
    return lp_blank, lp_label


def test_oracle_matches_brute_force():
    rng = np.random.default_rng(0)
    for T, U in [(1, 0), (2, 1), (3, 2), (4, 3)]:
        lp_blank, lp_label = _rand_tables(rng, T, U)
        np.testing.assert_allclose(oracle_nll(lp_blank, lp_label, T, U),
                                   brute_force_nll(lp_blank, lp_label, T, U),
                                   rtol=1e-10)


def test_loss_matches_oracle_ragged_batch():
    rng = np.random.default_rng(1)
    B, T, U = 5, 7, 4
    lp_blank = rng.standard_normal((B, T, U + 1)).astype(np.float32) - 1.0
    lp_label = rng.standard_normal((B, T, U)).astype(np.float32) - 1.0
    frame_lens = np.array([7, 4, 1, 5, 7], np.int32)
    label_lens = np.array([4, 2, 0, 3, 1], np.int32)

    got = np.asarray(transducer_loss(jnp.asarray(lp_blank),
                                     jnp.asarray(lp_label),
                                     jnp.asarray(frame_lens),
                                     jnp.asarray(label_lens)))
    want = [oracle_nll(lp_blank[b], lp_label[b],
                       int(frame_lens[b]), int(label_lens[b]))
            for b in range(B)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_loss_lattice_padding_invariance():
    """Extra (padded) frames and label slots must not change the NLL — the
    loss's no-masking argument (ops/transducer.py): the read-out cell is
    unreachable from out-of-range cells."""
    rng = np.random.default_rng(2)
    B, T, U = 3, 6, 3
    lp_blank = rng.standard_normal((B, T, U + 1)).astype(np.float32)
    lp_label = rng.standard_normal((B, T, U)).astype(np.float32)
    frame_lens = np.array([6, 3, 5], np.int32)
    label_lens = np.array([3, 1, 2], np.int32)
    base = np.asarray(transducer_loss(jnp.asarray(lp_blank),
                                      jnp.asarray(lp_label),
                                      jnp.asarray(frame_lens),
                                      jnp.asarray(label_lens)))
    # poison-pad the lattice: values there must never be read
    bp = np.pad(lp_blank, ((0, 0), (0, 4), (0, 2)), constant_values=7.7)
    yp = np.pad(lp_label, ((0, 0), (0, 4), (0, 2)), constant_values=7.7)
    padded = np.asarray(transducer_loss(jnp.asarray(bp), jnp.asarray(yp),
                                        jnp.asarray(frame_lens),
                                        jnp.asarray(label_lens)))
    np.testing.assert_allclose(padded, base, rtol=1e-6)


# ---------------------------------------------------------------------------
# Model family
# ---------------------------------------------------------------------------

def tiny_config(encoder="bilstm") -> Config:
    return Config(
        features=FeatureConfig(kind="logmel", n_mels=16, n_fft=128,
                               win_length=128, hop_length=64),
        model=ModelConfig(family="transducer", vocab_size=8, input_dim=16,
                          input_proj_dim=32, hidden_size=16, num_layers=1,
                          dropout=0.0, use_pallas_lstm=False),
        transformer=TransformerConfig(num_layers=2, d_model=32, num_heads=2,
                                      ffn_dim=64, dropout=0.0, subsample=2),
        transducer=TransducerConfig(encoder=encoder, pred_embed_dim=16,
                                    pred_hidden=16, joint_dim=24),
        train=TrainConfig(num_epochs=2, batch_size=4, learning_rate=3e-3,
                          warmup_steps=0, log_every=1000),
    )


def _batch(cfg, B=3, T=900, seed=0):
    rng = np.random.default_rng(seed)
    wave = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
    ns = jnp.asarray([T, T - 300, T // 3][:B], jnp.int32)
    labels = jnp.zeros((B, 5), jnp.int32).at[:, :4].set(
        jnp.asarray(rng.integers(1, 8, (B, 4)), jnp.int32))
    label_lens = jnp.asarray([4, 2, 3][:B], jnp.int32)
    return wave, ns, labels, label_lens


@pytest.mark.parametrize("encoder", ["bilstm", "transformer"])
def test_lattice_shapes_and_grads(encoder):
    from pg_asr_tpu.ops.features import extract_features

    cfg = tiny_config(encoder)
    wave, ns, labels, label_lens = _batch(cfg)
    params = transducer.init_params(jax.random.PRNGKey(0), cfg)
    feats, mask, flens = extract_features(wave, ns, cfg.features)
    lp_blank, lp_label, out_lens = transducer.apply_lattice(
        params, feats, mask, flens, labels, label_lens, cfg)
    B, T, U1 = lp_blank.shape
    assert U1 == labels.shape[1] + 1
    assert lp_label.shape == (B, T, labels.shape[1])
    # the emission tables are normalized: exp(blank) + sum over labels <= 1
    # (only spot-check normalization of the full joint via blank < 0)
    assert float(jnp.max(lp_blank)) <= 0.0

    def loss(p):
        bl, y, ol = transducer.apply_lattice(p, feats, mask, flens, labels,
                                             label_lens, cfg)
        return transducer_loss_mean(bl, y, ol, label_lens)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_joint_log_probs_normalized():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 4, 3, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 8, (2, 2)), jnp.int32)
    lp_blank, lp_label = joint_log_probs(logits, labels)
    want_blank = np.asarray(jax.nn.log_softmax(logits, -1))[..., 0]
    np.testing.assert_allclose(np.asarray(lp_blank), want_blank, atol=1e-5)
    lsm = np.asarray(jax.nn.log_softmax(logits, -1))
    for b in range(2):
        for t in range(4):
            for u in range(2):
                np.testing.assert_allclose(
                    float(lp_label[b, t, u]),
                    lsm[b, t, u, int(labels[b, u])], atol=1e-5)


# ---------------------------------------------------------------------------
# Greedy decode vs host oracle
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x, np.float32)


def host_greedy(params, enc, out_len, max_label_len, max_symbols):
    """Per-utterance numpy greedy transducer decode (independent oracle for
    decoding/transducer.py). enc: (T, De) for ONE utterance."""
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    emb = _np(params["pred_embed"])
    W, U_, bias = (_np(params["pred_lstm"]["W"]), _np(params["pred_lstm"]["U"]),
                   _np(params["pred_lstm"]["b"]))
    H = U_.shape[0]

    def pred_step(sym, h, c):
        x = emb[sym]
        pre = x @ W + bias + h @ U_
        i = sigmoid(pre[:H])
        f = sigmoid(pre[H:2 * H])
        g = np.tanh(pre[2 * H:3 * H])
        o = sigmoid(pre[3 * H:])
        c2 = f * c + i * g
        return o * np.tanh(c2), c2

    def lin(p, x):
        return x @ _np(p["w"]) + _np(p["b"])

    h, c = pred_step(0, np.zeros(H, np.float32), np.zeros(H, np.float32))
    g = lin(params["joint_pred"], h)
    E = lin(params["joint_enc"], enc)
    out = []
    for t in range(out_len):
        for _ in range(max_symbols):
            logits = lin(params["joint_out"], np.tanh(E[t] + g))
            sym = int(np.argmax(logits))
            if sym == 0 or len(out) >= max_label_len:
                break
            h, c = pred_step(sym, h, c)
            g = lin(params["joint_pred"], h)
            out.append(sym)
    return out


def test_greedy_decode_matches_host_oracle():
    from pg_asr_tpu.decoding.transducer import transducer_greedy_decode

    cfg = tiny_config("bilstm")
    rng = np.random.default_rng(4)
    B, T, De = 4, 11, 2 * cfg.model.hidden_size
    params = transducer.init_params(jax.random.PRNGKey(1), cfg)
    enc = jnp.asarray(rng.standard_normal((B, T, De)) * 2.0, jnp.float32)
    out_lens = jnp.asarray([11, 7, 1, 9], jnp.int32)

    labels, lens = transducer_greedy_decode(params, enc, out_lens, cfg,
                                            max_label_len=16)
    labels, lens = np.asarray(labels), np.asarray(lens)
    for b in range(B):
        want = host_greedy(params, _np(enc[b]), int(out_lens[b]), 16,
                           cfg.transducer.max_symbols_per_frame)
        assert lens[b] == len(want), (b, labels[b], want)
        np.testing.assert_array_equal(labels[b, :lens[b]], want)
        assert np.all(labels[b, lens[b]:] == 0)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def test_train_step_overfits_fixed_batch():
    import optax

    from pg_asr_tpu.train import compute_loss, init_model_params

    cfg = tiny_config("bilstm")
    wave, ns, labels, label_lens = _batch(cfg, seed=5)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: compute_loss(p, wave, ns, labels, label_lens, cfg,
                                   train=False))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::8]


def test_terms_match_mean_and_exclude_padding_rows():
    """num/den contract: zero-label rows (SPMD batch padding) are excluded,
    so padded and unpadded batches give the same mean loss."""
    from pg_asr_tpu.ops.features import extract_features
    from pg_asr_tpu.train import compute_loss, init_model_params

    cfg = tiny_config("bilstm")
    wave, ns, labels, label_lens = _batch(cfg, seed=6)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    base = float(compute_loss(params, wave, ns, labels, label_lens, cfg,
                              train=False))
    wave_p = jnp.pad(wave, ((0, 2), (0, 0)))
    ns_p = jnp.pad(ns, (0, 2))
    labels_p = jnp.pad(labels, ((0, 2), (0, 0)))
    lens_p = jnp.pad(label_lens, (0, 2))
    num, den = compute_loss(params, wave_p, ns_p, labels_p, lens_p, cfg,
                            train=False, terms=True)
    assert float(den) == labels.shape[0]
    np.testing.assert_allclose(float(num) / float(den), base, rtol=1e-5)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    root = str(tmp_path_factory.mktemp("corpus_rnnt"))
    make_synthetic_corpus(root, n_utts=10, seed=11, min_dur=0.2, max_dur=0.4)
    return root


def test_transducer_train_predict_driver(corpus, tmp_path):
    from pg_asr_tpu.config import Config as C
    from pg_asr_tpu.predict import predict
    from pg_asr_tpu.train import train

    model_dir = str(tmp_path / "model")
    cfg = tiny_config("transformer")
    out = train(corpus, model_dir, config=cfg, resume=False)
    assert np.isfinite(out["train_losses"]).all()
    assert out["config"].model.family == "transducer"
    assert os.path.exists(out["best_path"])

    loaded = C.from_json(open(os.path.join(model_dir, "config.json")).read())
    assert loaded.model.family == "transducer"
    assert loaded.transducer == cfg.transducer

    stats = predict(os.path.join(corpus, "test.tsv"),
                    os.path.join(corpus, "clips"),
                    os.path.join(corpus, "alphabet.txt"),
                    model_dir, batch_size=4, decoder="greedy")
    assert stats["num_utts"] >= 1
    stats_beam = predict(os.path.join(corpus, "test.tsv"),
                         os.path.join(corpus, "clips"),
                         os.path.join(corpus, "alphabet.txt"),
                         model_dir, batch_size=4, decoder="beam",
                         beam_size=4)
    assert stats_beam["num_utts"] >= 1
    # the prediction network IS the transducer's LM - fusion must refuse
    with pytest.raises(ValueError, match="shallow fusion"):
        predict(os.path.join(corpus, "test.tsv"),
                os.path.join(corpus, "clips"),
                os.path.join(corpus, "alphabet.txt"),
                model_dir, batch_size=4, decoder="beam", beam_size=4,
                lm_order=2, lm_train_tsv=os.path.join(corpus, "train.tsv"))


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _lin(p, x):
    return x @ _np(p["w"]) + _np(p["b"])


def _host_pred_step(params, sym, h, c):
    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    p = params["pred_lstm"]
    W, U_, bias = _np(p["W"]), _np(p["U"]), _np(p["b"])
    H = U_.shape[0]
    x = _np(params["pred_embed"])[sym]
    pre = x @ W + bias + h @ U_
    i, f = sigmoid(pre[:H]), sigmoid(pre[H:2 * H])
    g_, o = np.tanh(pre[2 * H:3 * H]), sigmoid(pre[3 * H:])
    c2 = f * c + i * g_
    return o * np.tanh(c2), c2


def _log_softmax(x):
    x = x - x.max()
    return x - np.log(np.exp(x).sum())


NEGH = -1.0e30


def host_beam_rnnt(params, enc, out_len, K, max_symbols, Lmax):
    """Per-utterance numpy mirror of decoding.transducer.transducer_beam_decode
    (same candidate ordering, same first-occurrence merging, same stable
    tie-breaking as lax.top_k)."""
    A = _np(params["joint_out"]["b"]).shape[0]
    E = _lin(params["joint_enc"], enc)  # (T, J)
    H = _np(params["pred_lstm"]["U"]).shape[0]
    h0, c0 = _host_pred_step(params, 0, np.zeros(H, np.float32),
                             np.zeros(H, np.float32))
    beams = [dict(hist=(), score=0.0, h=h0, c=c0,
                  g=_lin(params["joint_pred"], h0))] + [None] * (K - 1)
    for t in range(out_len):
        done = [None] * K
        active = beams
        for j in range(max_symbols + 1):
            lps = [None if s is None else
                   _log_softmax(_lin(params["joint_out"],
                                     np.tanh(E[t] + s["g"])))
                   for s in active]
            comb = list(done) + [
                None if s is None else {**s, "score": s["score"] + lp[0]}
                for s, lp in zip(active, lps)]
            scores = np.full(2 * K, NEGH)
            seen = {}
            for i, e in enumerate(comb):
                if e is None:
                    continue
                if e["hist"] in seen:
                    scores[seen[e["hist"]]] = np.logaddexp(
                        scores[seen[e["hist"]]], e["score"])
                else:
                    seen[e["hist"]] = i
                    scores[i] = e["score"]
            order = np.argsort(-scores, kind="stable")[:K]
            done = [None if scores[i] <= NEGH / 2
                    else {**comb[i], "score": scores[i]} for i in order]
            if j < max_symbols:
                cand = np.full(K * (A - 1), NEGH)
                for k, (s, lp) in enumerate(zip(active, lps)):
                    if s is None or len(s["hist"]) >= Lmax:
                        continue
                    for y in range(1, A):
                        cand[k * (A - 1) + y - 1] = s["score"] + lp[y]
                order = np.argsort(-cand, kind="stable")[:K]
                nxt = []
                for i in order:
                    if cand[i] <= NEGH / 2:
                        nxt.append(None)
                        continue
                    k, y = i // (A - 1), i % (A - 1) + 1
                    h2, c2 = _host_pred_step(params, y, active[k]["h"],
                                             active[k]["c"])
                    nxt.append(dict(hist=active[k]["hist"] + (y,),
                                    score=cand[i], h=h2, c=c2,
                                    g=_lin(params["joint_pred"], h2)))
                active = nxt
        beams = done
    alive = [b for b in beams if b is not None]
    best = max(alive, key=lambda b: b["score"])
    return list(best["hist"]), -best["score"]


def test_beam_matches_host_oracle():
    from pg_asr_tpu.decoding.transducer import transducer_beam_decode

    cfg = tiny_config("bilstm")
    rng = np.random.default_rng(7)
    B, T, De = 3, 9, 2 * cfg.model.hidden_size
    params = transducer.init_params(jax.random.PRNGKey(2), cfg)
    enc = jnp.asarray(rng.standard_normal((B, T, De)) * 2.0, jnp.float32)
    out_lens = jnp.asarray([9, 5, 1], jnp.int32)

    labels, lens, nll = transducer_beam_decode(params, enc, out_lens, cfg,
                                               beam_size=4, max_label_len=16)
    labels, lens = np.asarray(labels), np.asarray(lens)
    for b in range(B):
        want, want_nll = host_beam_rnnt(params, _np(enc[b]),
                                        int(out_lens[b]), 4,
                                        cfg.transducer.max_symbols_per_frame,
                                        16)
        np.testing.assert_array_equal(labels[b, :lens[b]], want)
        np.testing.assert_allclose(float(nll[b]), want_nll, rtol=1e-4)


def test_beam_unpruned_matches_brute_force():
    """K large enough that nothing is ever pruned: the beam's best history
    must be the exact argmax of sum-over-(<=m labels/frame)-alignments
    probability, independently enumerated."""
    from pg_asr_tpu.decoding.transducer import transducer_beam_decode

    cfg = tiny_config("bilstm")
    A = cfg.model.vocab_size  # 8
    rng = np.random.default_rng(8)
    T, De, m = 2, 2 * cfg.model.hidden_size, 1
    params = transducer.init_params(jax.random.PRNGKey(3), cfg)
    enc = jnp.asarray(rng.standard_normal((1, T, De)) * 2.0, jnp.float32)

    # enumerate alignments recursively: at each frame, emit 0..m labels then
    # blank; score with the exact (host) joint
    E = _lin(params["joint_enc"], _np(enc[0]))
    H = _np(params["pred_lstm"]["U"]).shape[0]
    h0, c0 = _host_pred_step(params, 0, np.zeros(H, np.float32),
                             np.zeros(H, np.float32))
    totals = {}

    def rec(t, hist, score, h, c, emitted):
        lp = _log_softmax(_lin(params["joint_out"],
                               np.tanh(E[t] + _lin(params["joint_pred"], h))))
        # blank: next frame (or terminate)
        s_b = score + lp[0]
        if t + 1 == T:
            totals[hist] = np.logaddexp(totals.get(hist, NEGH), s_b)
        else:
            rec(t + 1, hist, s_b, h, c, 0)
        if emitted < m:
            for y in range(1, A):
                h2, c2 = _host_pred_step(params, y, h, c)
                rec(t, hist + (y,), score + lp[y], h2, c2, emitted + 1)

    rec(0, (), 0.0, h0, c0, 0)
    want_hist, want_score = max(totals.items(), key=lambda kv: kv[1])

    # K = more than every reachable history (1 + (A-1) + (A-1)^2 = 57 > 32
    # would be exact; histories per round <= K*(A-1) never pruned at K=64)
    labels, lens, nll = transducer_beam_decode(
        params, enc, jnp.asarray([T], jnp.int32), cfg, beam_size=64,
        max_label_len=8, max_symbols=m)
    got = tuple(np.asarray(labels)[0][:int(lens[0])])
    assert got == want_hist, (got, want_hist)
    np.testing.assert_allclose(float(nll[0]), -want_score, rtol=1e-4)


# ---------------------------------------------------------------------------
# Hybrid (auxiliary CTC) training
# ---------------------------------------------------------------------------

def hybrid_config():
    cfg = tiny_config("bilstm")
    return cfg.replace(transducer=cfg.transducer.__class__(
        **{**cfg.transducer.__dict__, "ctc_weight": 0.3}))


def test_hybrid_loss_combines_components():
    """L = L_rnnt + w*L_ctc: the hybrid scalar must equal the two losses
    computed separately (same params modulo the extra head)."""
    from pg_asr_tpu.ops.ctc import ctc_loss_mean
    from pg_asr_tpu.ops.features import extract_features
    from pg_asr_tpu.ops.transducer import transducer_loss_mean
    from pg_asr_tpu.train import compute_loss, init_model_params

    cfg = hybrid_config()
    wave, ns, labels, label_lens = _batch(cfg, seed=9)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    assert "ctc_head" in params
    hybrid = float(compute_loss(params, wave, ns, labels, label_lens, cfg,
                                train=False))

    feats, mask, flens = extract_features(wave, ns, cfg.features)
    lp_blank, lp_label, out_lens, ctc_lp = transducer.apply_lattice(
        params, feats, mask, flens, labels, label_lens, cfg, with_ctc=True)
    want = (float(transducer_loss_mean(lp_blank, lp_label, out_lens,
                                       label_lens))
            + 0.3 * float(ctc_loss_mean(ctc_lp, out_lens, labels,
                                        label_lens)))
    np.testing.assert_allclose(hybrid, want, rtol=1e-5)

    # gradients flow into BOTH heads
    grads = jax.grad(lambda p: compute_loss(p, wave, ns, labels, label_lens,
                                            cfg, train=False))(params)
    assert float(jnp.abs(grads["ctc_head"]["w"]).max()) > 0
    assert float(jnp.abs(grads["joint_out"]["w"]).max()) > 0


def test_hybrid_shard_map_matches_single_device():
    """The stacked (num, den) component vectors must psum-reduce to the
    single-device hybrid loss on a data-parallel mesh."""
    import optax

    from pg_asr_tpu.parallel.mesh import (make_mesh, replicate,
                                          shard_batch_arrays)
    from pg_asr_tpu.train import init_model_params, make_train_step

    cfg = hybrid_config()
    wave, ns, labels, label_lens = _batch(cfg, B=3, seed=10)
    arrays_np = tuple(np.asarray(a) for a in (wave, ns, labels, label_lens))

    def run(mesh):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
        opt = optax.sgd(1e-2)
        opt_state = opt.init(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step = make_train_step(cfg, opt, mesh)
        arrays = shard_batch_arrays(arrays_np, mesh)
        _, _, _, loss = step(params, opt_state, jax.random.PRNGKey(1),
                             *arrays)
        return float(loss)

    mesh1 = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("data",))
    # B=3 on 8 shards: 5 zero-padded rows excluded by BOTH components
    np.testing.assert_allclose(run(mesh8), run(mesh1), rtol=1e-4)
