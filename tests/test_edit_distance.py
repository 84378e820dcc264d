"""On-device edit distance vs the host metrics oracle, including the
per-prefix distances that power the stepwise PG reward."""

import numpy as np

from pg_asr_tpu.metrics import edit_dist
from pg_asr_tpu.ops.edit_distance import (cer_from_ids, edit_distance,
                                          edit_distance_prefixes)


def _pad(seqs, L):
    out = np.zeros((len(seqs), L), np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def test_edit_distance_random_parity():
    rng = np.random.default_rng(0)
    B, Lr, Lh = 8, 10, 12
    refs, hyps = [], []
    for _ in range(B):
        refs.append(list(rng.integers(1, 5, size=rng.integers(1, Lr + 1))))
        hyps.append(list(rng.integers(1, 5, size=rng.integers(0, Lh + 1))))
    d = np.asarray(edit_distance(
        _pad(refs, Lr), np.array([len(r) for r in refs]),
        _pad(hyps, Lh), np.array([len(h) for h in hyps])))
    for i in range(B):
        expected, _ = edit_dist(refs[i], hyps[i])
        assert int(d[i]) == expected, (refs[i], hyps[i])


def test_prefix_distances():
    ref = [1, 2, 3]
    hyp = [1, 3, 3, 2]
    d, prefix = edit_distance_prefixes(
        _pad([ref], 4), np.array([3]), _pad([hyp], 5), np.array([4]))
    prefix = np.asarray(prefix)[0]
    # prefix[i] = ED(ref, hyp[:i])
    for i in range(5):
        expected, _ = edit_dist(ref, hyp[:i])
        assert int(prefix[i]) == expected, i
    assert int(np.asarray(d)[0]) == edit_dist(ref, hyp)[0]
    # beyond hyp_len the row is frozen
    assert int(prefix[4]) == edit_dist(ref, hyp)[0]


def test_cer_from_ids():
    ref = _pad([[1, 2, 3, 4]], 4)
    hyp = _pad([[1, 2, 3]], 4)
    cer = np.asarray(cer_from_ids(ref, np.array([4]), hyp, np.array([3])))
    assert cer[0] == 0.25


def test_stepwise_reward_reference_semantics():
    """Stepwise rewards: sum of rewards == -(final ED - len(ref)), each step's
    reward is the marginal ED improvement (reference policy_grad.py contract,
    t==0 case fixed)."""
    from pg_asr_tpu.rl.reward import stepwise_reward

    ref = [1, 2, 3]
    hyp = [1, 2, 9, 3]
    r = np.asarray(stepwise_reward(
        _pad([ref], 4), np.array([3]), _pad([hyp], 5), np.array([4])))[0]
    # d = [3, 2, 1, 2, 2] -> r = [1, 1, -1, 0] ... d[3]: ED("123","129")=1? no:
    # recompute via oracle
    d = [edit_dist(ref, hyp[:i])[0] for i in range(5)]
    expected = [-(d[i + 1] - d[i]) for i in range(4)]
    np.testing.assert_array_equal(r[:4], expected)
    assert r[4:].sum() == 0
