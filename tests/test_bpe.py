"""BPE subword units (pg_asr_tpu/data/bpe.py): training, round-trip,
persistence, and end-to-end through preproc/train/predict with
--units bpe. Beyond-reference capability (the reference is char-only,
reference data.py:82-104)."""

import os

import numpy as np
import pytest

from pg_asr_tpu.data.bpe import BpeAlphabet, load_tokenizer, train_bpe
from pg_asr_tpu.data.text import PAD

TEXTS = ["the cat sat on the mat", "the bad cab had a mad lad",
         "a cat and a bat", "the the the cab cab"]


def test_train_learns_frequent_merges():
    tok = train_bpe(TEXTS, vocab_size=40)
    assert tok.symbols[0] == PAD
    assert len(tok.merges) > 0
    # 'the' is the most frequent word: it must end up as one token
    assert "▁the" in tok.symbols
    # deterministic
    tok2 = train_bpe(TEXTS, vocab_size=40)
    assert tok.symbols == tok2.symbols and tok.merges == tok2.merges


def test_encode_decode_round_trip():
    tok = train_bpe(TEXTS, vocab_size=40)
    for t in TEXTS + ["a mad cat sat"]:
        ids = tok.encode(t)
        assert all(0 < i < tok.size for i in ids)
        assert tok.decode(ids) == t
    # subwords compress: fewer tokens than characters
    assert len(tok.encode(TEXTS[0])) < len(TEXTS[0].replace(" ", "")) + \
        TEXTS[0].count(" ") + 1


def test_unseen_chars_dropped_like_char_alphabet():
    tok = train_bpe(TEXTS, vocab_size=40)
    assert tok.decode(tok.encode("the zzz cat")) == "the cat"


def test_piece_maps_marker_to_space():
    tok = train_bpe(TEXTS, vocab_size=40)
    i = tok.char2ind["▁the"]
    assert tok.piece(i) == " the"


def test_save_load_round_trip(tmp_path):
    tok = train_bpe(TEXTS, vocab_size=40)
    path = str(tmp_path / "bpe.vocab")
    tok.save(path)
    tok2 = BpeAlphabet.load(path)
    assert tok2.symbols == tok.symbols
    assert tok2.merges == tok.merges
    for t in TEXTS:
        assert tok2.encode(t) == tok.encode(t)


def test_load_tokenizer_dispatch(tmp_path):
    from pg_asr_tpu.data.text import Alphabet

    Alphabet.from_texts(TEXTS).save(str(tmp_path / "alphabet.txt"))
    assert isinstance(load_tokenizer(str(tmp_path), "char"), Alphabet)
    with pytest.raises(FileNotFoundError, match="preproc"):
        load_tokenizer(str(tmp_path), "bpe")
    train_bpe(TEXTS, 40).save(str(tmp_path / "bpe.vocab"))
    assert isinstance(load_tokenizer(str(tmp_path), "bpe"), BpeAlphabet)


def test_cli_bpe_end_to_end(tmp_path):
    """preproc --units bpe -> train --units bpe -> predict: the whole
    pipeline on subword labels, model sized by the BPE vocabulary."""
    import json

    from pg_asr_tpu.cli import main
    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    model = str(tmp_path / "model")
    make_synthetic_corpus(corpus, n_utts=10, seed=3, min_dur=0.2,
                          max_dur=0.4)
    assert main(["--mode", "preproc", "--corpus_path", corpus,
                 "--units", "bpe", "--bpe_vocab_size", "24"]) == 0
    assert os.path.exists(os.path.join(corpus, "bpe.vocab"))
    tok = BpeAlphabet.load(os.path.join(corpus, "bpe.vocab"))
    assert tok.size <= 24

    assert main(["--mode", "train", "--corpus_path", corpus,
                 "--model_path", model, "--num_epochs", "1",
                 "--batch_size", "4", "--units", "bpe"]) == 0
    cfg = json.load(open(os.path.join(model, "config.json")))
    assert cfg["text"]["units"] == "bpe"
    assert cfg["model"]["vocab_size"] == tok.size

    assert main(["--mode", "predict", "--corpus_path", corpus,
                 "--model_path", model, "--batch_size", "4"]) == 0
    lines = open(os.path.join(model, "predicted.txt")).read().splitlines()
    assert lines and all("|" in ln for ln in lines)
    # targets decoded through the SAME tokenizer: plain words, no markers
    assert "▁" not in lines[0]


def test_native_segmenter_matches_python():
    """The C++ segmenter (native/pgasr_bpe.cpp) must reproduce
    BpeAlphabet.encode exactly — incl. unicode, unknown chars, repeated
    words (its memo cache), and empty strings."""
    from pg_asr_tpu.data.native_bpe import NativeBpe, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    texts = ["the cat sat on the mat", "über schön straße", "",
             "zzz unknown zz the", "a", "the the the the",
             "mixed ünïcode and ascii words the cat",
             "the\u00a0cat\u2009sat"]  # unicode whitespace: must split
    tok = train_bpe(TEXTS + ["über schön straße and ünïcode"], 64)
    native = NativeBpe(tok.symbols, tok.merges)
    got = native.encode_batch(texts)
    want = [tok.encode(t) for t in texts]
    assert got == want
    # the tokenizer's own batch API routes through the native path
    assert tok.encode_batch(texts) == want


def test_train_resume_keeps_checkpoint_units(tmp_path):
    """Resuming without --units must pick the tokenizer from the
    checkpoint's config.json instead of rebuilding a wrong-vocab model."""
    from pg_asr_tpu.cli import main
    from pg_asr_tpu.data.dataset import make_synthetic_corpus

    corpus = str(tmp_path / "corpus")
    model = str(tmp_path / "model")
    make_synthetic_corpus(corpus, n_utts=8, seed=4, min_dur=0.2, max_dur=0.4)
    assert main(["--mode", "preproc", "--corpus_path", corpus,
                 "--units", "bpe", "--bpe_vocab_size", "24"]) == 0
    assert main(["--mode", "train", "--corpus_path", corpus,
                 "--model_path", model, "--num_epochs", "1",
                 "--batch_size", "4", "--units", "bpe"]) == 0
    # resume WITHOUT --units: must not crash on a template mismatch
    assert main(["--mode", "train", "--corpus_path", corpus,
                 "--model_path", model, "--num_epochs", "2",
                 "--batch_size", "4"]) == 0
    import json
    cfg = json.load(open(os.path.join(model, "config.json")))
    assert cfg["text"]["units"] == "bpe"
