"""Alphabets, text normalization, and offline corpus preprocessing.

Covers the reference's text layer without its external `cvutils` dependency
(reference data.py:10,17,36): a built-in normalizer replaces
cvutils.Validator and an alphabet builder replaces cvutils.Alphabet.

Conventions (parity with reference model.py:190-197):
  * index 0 is '<pad>' — and doubles as the CTC blank
  * alphabet.txt holds one symbol per line, WITHOUT the pad entry;
    loaders prepend '<pad>'.
"""

from __future__ import annotations

import csv
import os
import re
import unicodedata
from dataclasses import dataclass

PAD = "<pad>"
BLANK_ID = 0

# Characters kept by the default normalizer (per-language extras below).
_LANG_EXTRA = {
    "en": "'",
    "eu": "'ñ",  # Basque — the reference's demonstrated language ( server.txt:1)
    "es": "'ñáéíóúü",
    "fr": "'àâçéèêëîïôùûüÿœæ",
    "de": "'äöüß",
}


def normalize_text(text: str, lang: str = "en") -> str:
    """Lowercase, strip punctuation/digits, collapse whitespace.

    Replacement for cvutils.Validator(lang).validate (reference data.py:17-21):
    keeps letters (unicode-aware), spaces, and a small per-language extra set.
    """
    text = unicodedata.normalize("NFC", text or "").lower()
    extra = set(_LANG_EXTRA.get(lang, "'"))
    out = []
    for ch in text:
        if ch.isalpha() or ch in extra:
            out.append(ch)
        elif ch.isspace() or ch in "-–—_/":
            out.append(" ")
        # everything else (digits, punctuation) dropped
    return re.sub(r"\s+", " ", "".join(out)).strip()


@dataclass(frozen=True)
class Alphabet:
    """Symbol table with '<pad>'/blank at index 0."""

    symbols: tuple[str, ...]  # includes PAD at 0

    @property
    def size(self) -> int:
        return len(self.symbols)

    @property
    def char2ind(self) -> dict[str, int]:
        return {s: i for i, s in enumerate(self.symbols)}

    @property
    def ind2char(self) -> dict[int, str]:
        return {i: s for i, s in enumerate(self.symbols)}

    def piece(self, i: int) -> str:
        """Printable text of one symbol (identity for chars; the BPE
        tokenizer maps its word-start marker to a space here)."""
        return self.symbols[i]

    def encode(self, text: str) -> list[int]:
        c2i = self.char2ind
        return [c2i[c] for c in text if c in c2i]

    def encode_batch(self, texts) -> list[list[int]]:
        c2i = self.char2ind
        return [[c2i[c] for c in t if c in c2i] for t in texts]

    def decode(self, ids) -> str:
        i2c = self.ind2char
        return "".join(i2c[int(i)] for i in ids if int(i) != BLANK_ID)

    @staticmethod
    def from_symbols(chars) -> "Alphabet":
        syms = [PAD] + [c for c in chars if c != PAD]
        return Alphabet(tuple(syms))

    @staticmethod
    def from_texts(texts) -> "Alphabet":
        chars = sorted({c for t in texts for c in t})
        return Alphabet.from_symbols(chars)

    @staticmethod
    def load(path: str) -> "Alphabet":
        """Read alphabet.txt (one char per line, pad NOT stored) and prepend
        '<pad>' — parity with reference model.py:194-197."""
        with open(path, "r") as fo:
            lines = [ln.rstrip("\n") for ln in fo.readlines()]
        return Alphabet.from_symbols([ln for ln in lines if ln != ""])

    def save(self, path: str) -> None:
        with open(path, "w") as fo:
            for s in self.symbols[1:]:  # pad is implicit
                fo.write(s + "\n")


def read_tsv(path: str) -> tuple[list[str], list[dict]]:
    with open(path, "r", newline="") as fo:
        rd = csv.DictReader(fo, delimiter="\t")
        rows = list(rd)
        return list(rd.fieldnames or []), rows


def write_tsv(path: str, fieldnames: list[str], rows: list[dict]) -> None:
    with open(path, "w", newline="") as fo:
        wr = csv.DictWriter(fo, fieldnames=fieldnames, delimiter="\t")
        wr.writeheader()
        for r in rows:
            wr.writerow(r)


def preproc_text(corpus_path: str, lang: str = "en", splits=("train", "dev", "test")) -> Alphabet:
    """Offline text preprocessing (the CLI's `preproc` mode).

    Capability parity with reference data.py:12-41: normalize the 'sentence'
    column of each split TSV in place and emit alphabet.txt. The alphabet is
    built from the union of normalized training sentences (no cvutils).
    """
    all_train_texts: list[str] = []
    for split in splits:
        path = os.path.join(corpus_path, f"{split}.tsv")
        if not os.path.exists(path):
            continue
        fieldnames, rows = read_tsv(path)
        for r in rows:
            r["sentence"] = normalize_text(r.get("sentence", ""), lang)
        write_tsv(path, fieldnames, rows)
        if split == "train":
            all_train_texts = [r["sentence"] for r in rows]

    alphabet = Alphabet.from_texts(all_train_texts)
    alphabet.save(os.path.join(corpus_path, "alphabet.txt"))
    return alphabet
