"""CTC loss: brute-force path enumeration oracle + torch.nn.functional.ctc_loss
parity + gradient sanity."""

import itertools

import numpy as np
import pytest

from pg_asr_tpu.ops.ctc import ctc_loss, ctc_loss_mean


def collapse(path, blank=0):
    out, prev = [], None
    for s in path:
        if s != prev and s != blank:
            out.append(s)
        prev = s
    return tuple(out)


def brute_force_nll(log_probs, label, blank=0):
    """-log sum over all T-length paths collapsing to `label`."""
    T, A = log_probs.shape
    total = -np.inf
    for path in itertools.product(range(A), repeat=T):
        if collapse(path, blank) == tuple(label):
            lp = sum(log_probs[t, s] for t, s in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def _rand_logprobs(rng, T, A):
    x = rng.standard_normal((T, A))
    x = x - np.log(np.sum(np.exp(x), axis=1, keepdims=True))
    return x.astype(np.float32)


@pytest.mark.parametrize("T,A,label", [
    (4, 3, [1]),
    (5, 3, [1, 2]),
    (5, 3, [1, 1]),       # repeat needs a separating blank
    (5, 4, [3, 1, 3]),
    (3, 3, []),           # empty label: all-blank paths
])
def test_ctc_vs_brute_force(T, A, label):
    rng = np.random.default_rng(hash((T, A, tuple(label))) % 2**32)
    lp = _rand_logprobs(rng, T, A)
    L = max(len(label), 1)
    labels = np.zeros((1, L), np.int32)
    labels[0, : len(label)] = label
    nll = ctc_loss(lp[None], np.array([T]), labels, np.array([len(label)]))
    expected = brute_force_nll(lp, label)
    assert float(nll[0]) == pytest.approx(expected, rel=1e-4, abs=1e-4)


def test_ctc_vs_torch_batched():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, T, A, L = 3, 12, 6, 4
    lp = np.stack([_rand_logprobs(rng, T, A) for _ in range(B)])
    labels = rng.integers(1, A, size=(B, L)).astype(np.int32)
    label_lens = np.array([4, 2, 3])
    frame_lens = np.array([12, 9, 7])
    # forbid CTC-invalid accidental repeats? repeats are valid; keep as is.
    ours = np.asarray(ctc_loss(lp, frame_lens, labels, label_lens))

    t_lp = torch.tensor(lp).permute(1, 0, 2)  # (T, B, A)
    t_labels = torch.tensor(labels.astype(np.int64))
    ref = torch.nn.functional.ctc_loss(
        t_lp, t_labels, torch.tensor(frame_lens), torch.tensor(label_lens),
        blank=0, reduction="none", zero_infinity=False,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_impossible_alignment():
    # "aa" needs >= 3 frames (a blank a); give it only 2 -> no valid path
    rng = np.random.default_rng(1)
    lp = _rand_logprobs(rng, 2, 4)
    nll = ctc_loss(lp[None], np.array([2]), np.array([[1, 1]]), np.array([2]))
    assert float(nll[0]) > 1e29  # "infinite"


def test_ctc_grad_finite():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    B, T, A, L = 2, 10, 5, 3
    lp = jnp.asarray(np.stack([_rand_logprobs(rng, T, A) for _ in range(B)]))
    labels = jnp.asarray(rng.integers(1, A, size=(B, L)).astype(np.int32))

    def loss_fn(x):
        logp = jax.nn.log_softmax(x, axis=-1)
        return ctc_loss_mean(logp, jnp.array([T, T - 2]), labels, jnp.array([3, 2]))

    g = jax.grad(loss_fn)(lp)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient w.r.t. frames beyond length must be zero
    assert np.allclose(np.asarray(g)[1, T - 2 :], 0.0, atol=1e-6)


def test_ctc_mean_skips_infeasible():
    rng = np.random.default_rng(3)
    lp = np.stack([_rand_logprobs(rng, 3, 4) for _ in range(2)])
    labels = np.array([[1, 0, 0], [1, 1, 1]], np.int32)  # "aaa" infeasible in 3 frames
    m = ctc_loss_mean(lp, np.array([3, 3]), labels, np.array([1, 3]))
    per = ctc_loss(lp, np.array([3, 3]), labels, np.array([1, 3]))
    assert float(per[1]) > 1e29
    assert float(m) == pytest.approx(float(per[0]), rel=1e-5)
