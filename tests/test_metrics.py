"""Metrics unit + parity tests vs the reference oracle (reference metrics.py)."""

import random

import numpy as np
import pytest

from pg_asr_tpu.metrics import edit_dist, evaluate, evaluate_corpus, save_predictions
from conftest import import_reference, reference_available


def test_edit_dist_known_pairs():
    assert edit_dist("kitten", "sitting") == (3, 6)
    assert edit_dist("abc", "abc") == (0, 3)
    assert edit_dist("abc", "") == (3, 3)
    assert edit_dist("", "abc") == (3, 0)
    assert edit_dist(["a", "b"], ["a", "c"]) == (1, 2)


def test_evaluate_known():
    cer, wer = evaluate("ab cd", "ab cd")
    assert cer == 0.0 and wer == 0.0
    cer, wer = evaluate("ab cd", "ab ce")
    assert cer == pytest.approx(1 / 5)
    assert wer == pytest.approx(1 / 2)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_edit_dist_parity_random():
    ref_metrics = import_reference("metrics")
    rng = random.Random(0)
    for _ in range(50):
        n1, n2 = rng.randint(0, 12), rng.randint(1, 12)
        s1 = "".join(rng.choice("abcd ") for _ in range(n1))
        s2 = "".join(rng.choice("abcd ") for _ in range(n2))
        if not s1:
            continue  # reference divides by len(s1) elsewhere; ED itself fine
        ours = edit_dist(s1, s2)
        theirs = ref_metrics.edit_dist(s1, s2)
        assert ours == tuple(theirs), (s1, s2)
        # word-level too
        ours_w = edit_dist(s1.split(" "), s2.split(" "))
        theirs_w = ref_metrics.edit_dist(s1.split(" "), s2.split(" "))
        assert ours_w == tuple(theirs_w)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_evaluate_parity_random():
    ref_metrics = import_reference("metrics")
    rng = random.Random(1)
    for _ in range(20):
        s1 = "".join(rng.choice("abc ") for _ in range(rng.randint(1, 15))).strip() or "a"
        s2 = "".join(rng.choice("abc ") for _ in range(rng.randint(1, 15))).strip() or "b"
        ours = evaluate(s1, s2)
        theirs = ref_metrics.evaluate(s1, s2)
        assert ours == pytest.approx(theirs)


def test_save_predictions_format(tmp_path):
    p = save_predictions(["hello world", "foo"], ["hello word", "fo"], str(tmp_path))
    lines = open(p).read().splitlines()
    assert lines == ["hello world|hello word", "foo|fo"]


def test_evaluate_corpus():
    out = evaluate_corpus(["abc", "de"], ["abc", "dx"])
    assert out["num_utts"] == 2
    assert out["cer"] == pytest.approx(1 / 5)
    assert out["cer_mean"] == pytest.approx((0 + 0.5) / 2)
