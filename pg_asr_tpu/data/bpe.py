"""Byte-pair-encoding subword units (beyond-reference capability).

The reference is strictly character-level (reference data.py:82-104 encodes
transcripts char-by-char against alphabet.txt). Subword units are the
standard modern choice — shorter label sequences (smaller CTC/transducer
lattices, fewer decode steps) and better rare-word generalization — so the
framework supports them as a drop-in alternative tokenizer: `BpeAlphabet`
exposes the same interface as `data.text.Alphabet` (`size`, `encode`,
`decode`, `save`/`load`, pad/blank at index 0) and every downstream
component (models, losses, decoders, metrics, LM fusion) works unchanged.

Scheme: SentencePiece-style word-start marker. Each word is prefixed with
'▁' and split into characters; training greedily merges the most frequent
adjacent symbol pair (ties broken lexicographically for determinism) until
the vocabulary reaches the target size. Encoding replays the merge list in
learned order; decoding joins tokens and maps '▁' back to spaces.

Artifacts: `bpe.vocab` (one token per line, pad implicit — same convention
as alphabet.txt) and `bpe.merges` (one "left right" pair per line, in merge
order), both written next to the corpus TSVs by `--mode preproc --units
bpe`.
"""

from __future__ import annotations

import os
from collections import Counter
from dataclasses import dataclass

from .text import BLANK_ID, PAD

MARKER = "▁"  # '▁' word-start marker (SentencePiece convention)


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for syms, freq in words.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] += freq
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(texts, vocab_size: int) -> "BpeAlphabet":
    """Learn a BPE vocabulary of (at most) vocab_size tokens incl. pad."""
    words: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            key = tuple([MARKER] + list(w))
            words[key] = words.get(key, 0) + 1

    base = sorted({s for syms in words for s in syms})
    merges: list[tuple[str, str]] = []
    vocab = set(base)
    while len(vocab) + 1 < vocab_size:  # +1 for pad
        counts = _pair_counts(words)
        if not counts:
            break
        # most frequent pair; ties broken lexicographically (deterministic)
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break  # merging singletons just memorizes the corpus
        merges.append((a, b))
        vocab.add(a + b)
        words = {_merge_word(syms, (a, b)): f for syms, f in words.items()}

    symbols = [PAD] + sorted(vocab)
    return BpeAlphabet(tuple(symbols), tuple(merges))


@dataclass(frozen=True)
class BpeAlphabet:
    """Subword symbol table + merge list; interface-compatible with
    data.text.Alphabet ('<pad>'/blank at index 0)."""

    symbols: tuple[str, ...]
    merges: tuple[tuple[str, str], ...]

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
        """Printable text of one token (marker -> space) — used by the
        streaming path's incremental emission."""
        return self.symbols[i].replace(MARKER, " ")

    def _segment(self, word: str) -> list[str]:
        syms = tuple([MARKER] + list(word))
        for pair in self.merges:
            if len(syms) < 2:
                break
            syms = _merge_word(syms, pair)
        return list(syms)

    def encode(self, text: str) -> list[int]:
        c2i = self.char2ind
        ids: list[int] = []
        for w in text.split():
            for tok in self._segment(w):
                if tok in c2i:
                    ids.append(c2i[tok])
                else:  # unseen symbol: fall back to known chars, drop rest
                    ids.extend(c2i[ch] for ch in tok if ch in c2i)
        return ids

    def encode_batch(self, texts) -> list[list[int]]:
        """Batch encode; uses the threaded native segmenter
        (native/pgasr_bpe.cpp, exact-parity tested) when available."""
        native = getattr(self, "_native", None)
        if native is None:
            try:
                from .native_bpe import NativeBpe

                native = NativeBpe(self.symbols, self.merges)
            except Exception:
                native = False
            object.__setattr__(self, "_native", native)  # frozen dataclass
        if native:
            return native.encode_batch(list(texts))
        return [self.encode(t) for t in texts]

    def decode(self, ids) -> str:
        import re

        i2c = self.ind2char
        s = "".join(i2c[int(i)] for i in ids if int(i) != BLANK_ID)
        # collapse runs of markers (e.g. a word whose every char was
        # unknown leaves a bare marker behind)
        return re.sub(r"\s+", " ", s.replace(MARKER, " ")).strip()

    def save(self, vocab_path: str) -> None:
        with open(vocab_path, "w") as fo:
            for s in self.symbols[1:]:  # pad implicit, like alphabet.txt
                fo.write(s + "\n")
        with open(self._merges_path(vocab_path), "w") as fo:
            for a, b in self.merges:
                fo.write(f"{a} {b}\n")

    @staticmethod
    def _merges_path(vocab_path: str) -> str:
        root, _ = os.path.splitext(vocab_path)
        return root + ".merges"

    @staticmethod
    def load(vocab_path: str) -> "BpeAlphabet":
        with open(vocab_path) as fo:
            syms = [ln.rstrip("\n") for ln in fo if ln.rstrip("\n")]
        merges: list[tuple[str, str]] = []
        mp = BpeAlphabet._merges_path(vocab_path)
        if os.path.exists(mp):
            with open(mp) as fo:
                for ln in fo:
                    parts = ln.rstrip("\n").split(" ")
                    if len(parts) == 2:
                        merges.append((parts[0], parts[1]))
        return BpeAlphabet(tuple([PAD] + syms), tuple(merges))


def load_tokenizer(corpus_path: str, units: str):
    """Corpus tokenizer dispatch: 'char' -> alphabet.txt, 'bpe' ->
    bpe.vocab/bpe.merges (written by preproc)."""
    from .text import Alphabet

    if units == "bpe":
        path = os.path.join(corpus_path, "bpe.vocab")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} not found - run --mode preproc --units bpe "
                "--bpe_vocab_size N first")
        return BpeAlphabet.load(path)
    return Alphabet.load(os.path.join(corpus_path, "alphabet.txt"))
