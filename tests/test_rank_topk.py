"""rank_topk (decoding/beam.py) — exact lax.top_k equivalence.

The beam search's selection primitive: pairwise-rank one-hot top-K for
small C, lax.top_k-backed one-hot beyond _RANK_TOPK_MAX_C. Both must be
bit-identical to lax.top_k including its lower-index-first tie break,
because the host-oracle parity of every beam decoder rests on it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pg_asr_tpu.decoding.beam import _RANK_TOPK_MAX_C, NEG, rank_topk


def _idx_from_onehot(oh):
    C = oh.shape[0]
    return jnp.sum(jnp.where(oh, jnp.arange(C)[:, None], 0), axis=0)


@pytest.mark.parametrize("C,K,seed", [(7, 3, 0), (304, 16, 1), (85, 5, 2),
                                      (_RANK_TOPK_MAX_C + 50, 16, 3)])
def test_matches_lax_top_k(C, K, seed):
    s = jnp.asarray(
        np.random.default_rng(seed).standard_normal(C).astype(np.float32))
    ts, oh = rank_topk(s, K)
    rs, ri = jax.lax.top_k(s, K)
    assert oh.shape == (C, K)
    np.testing.assert_array_equal(np.asarray(ts), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(_idx_from_onehot(oh)),
                                  np.asarray(ri))


def test_ties_break_toward_lower_index():
    s = jnp.asarray(np.array([1.0, 3.0, 3.0, -2.0, 3.0, 1.0], np.float32))
    ts, oh = rank_topk(s, 5)
    rs, ri = jax.lax.top_k(s, 5)
    np.testing.assert_array_equal(np.asarray(ts), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(_idx_from_onehot(oh)),
                                  np.asarray(ri))


def test_all_dead_neg_slots():
    # a fully-dead candidate pool (every score NEG) must still produce a
    # valid permutation selection: slot j picks index j
    s = jnp.full((12,), NEG)
    ts, oh = rank_topk(s, 4)
    np.testing.assert_array_equal(np.asarray(ts),
                                  np.full((4,), NEG, np.float32))
    np.testing.assert_array_equal(np.asarray(_idx_from_onehot(oh)),
                                  np.arange(4))


def test_one_hot_is_permutation_selection():
    s = jnp.asarray(
        np.random.default_rng(7).standard_normal(64).astype(np.float32))
    _, oh = rank_topk(s, 8)
    col_sums = jnp.sum(oh.astype(jnp.int32), axis=0)
    np.testing.assert_array_equal(np.asarray(col_sums), np.ones(8, np.int32))
    row_sums = jnp.sum(oh.astype(jnp.int32), axis=1)
    assert int(jnp.max(row_sums)) <= 1
