"""Alphabet + text normalization + preproc_text round trip."""

import os

from pg_asr_tpu.data.text import Alphabet, normalize_text, preproc_text, write_tsv, PAD


def test_normalize_text():
    assert normalize_text("Hello, World! 123") == "hello world"
    assert normalize_text("  a\tb\nc  ") == "a b c"
    assert normalize_text("don't") == "don't"


def test_alphabet_roundtrip(tmp_path):
    alph = Alphabet.from_texts(["abc", "cab d"])
    assert alph.symbols[0] == PAD
    assert set(alph.symbols[1:]) == set("abcd ")
    path = str(tmp_path / "alphabet.txt")
    alph.save(path)
    loaded = Alphabet.load(path)
    assert loaded.symbols == alph.symbols
    ids = loaded.encode("cab")
    assert loaded.decode(ids) == "cab"


def test_alphabet_space_preserved(tmp_path):
    # ' ' must survive the file round trip (it is a real symbol)
    alph = Alphabet.from_texts(["a b"])
    p = str(tmp_path / "alphabet.txt")
    alph.save(p)
    assert " " in Alphabet.load(p).symbols


def test_preproc_text(tmp_path):
    rows = [
        {"path": "x.wav", "sentence": "Hello, World!"},
        {"path": "y.wav", "sentence": "FOO bar?"},
    ]
    write_tsv(str(tmp_path / "train.tsv"), ["path", "sentence"], rows)
    alph = preproc_text(str(tmp_path), lang="en", splits=("train",))
    # normalized in place
    with open(tmp_path / "train.tsv") as fo:
        content = fo.read()
    assert "hello world" in content and "Hello" not in content
    assert os.path.exists(tmp_path / "alphabet.txt")
    assert set("helowrdfbar ") <= set(alph.symbols)
