"""Data pipeline: manifests, LibriSpeech scan, bucketing + static shape
quantization, synthetic corpus layout."""

import os

import numpy as np

from pg_asr_tpu.data.audio import write_wav
from pg_asr_tpu.data.dataset import (BatchIterator, load_manifest,
                                     make_synthetic_corpus, scan_librispeech,
                                     synthetic_batch)
from pg_asr_tpu.data.text import Alphabet


def test_synthetic_corpus_layout(tmp_path):
    root = str(tmp_path)
    make_synthetic_corpus(root, n_utts=8, seed=0)
    for f in ["train.tsv", "dev.tsv", "test.tsv", "alphabet.txt"]:
        assert os.path.exists(os.path.join(root, f)), f
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    assert len(utts) >= 4
    assert os.path.exists(utts[0].audio_path)


def test_batch_iterator_shapes_quantized(tmp_path):
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=8, seed=0,
                                        min_dur=0.1, max_dur=0.7)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, batch_size=3, wave_quantum=8000,
                       label_quantum=8, shuffle=False)
    shapes = set()
    n = 0
    for batch in it:
        assert batch.wave.shape[1] % 8000 == 0
        assert batch.labels.shape[1] % 8 == 0
        assert batch.wave.dtype == np.float32
        # padding is zero beyond each utterance's length
        for i in range(batch.size):
            assert np.all(batch.wave[i, batch.num_samples[i]:] == 0.0)
            assert np.all(batch.labels[i, batch.label_lens[i]:] == 0)
        shapes.add(batch.wave.shape[1])
        n += batch.size
    assert n == len(utts)
    # bucketing keeps the number of distinct padded shapes small
    assert len(shapes) <= 3


def test_batches_are_length_bucketed(tmp_path):
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=12, seed=3,
                                        min_dur=0.1, max_dur=1.0)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, batch_size=4, shuffle=False,
                       wave_quantum=1600)
    spans = []
    for batch in it:
        lens = batch.num_samples
        spans.append(int(lens.max()) - int(lens.min()))
    # bucketed batches group similar lengths: within-batch spread is far
    # smaller than the corpus spread
    assert np.median(spans) < 0.5 * (1.0 - 0.1) * 16000


def test_scan_librispeech(tmp_path):
    spk = tmp_path / "19" / "198"
    os.makedirs(spk)
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(spk / f"19-198-{i:04d}.wav"),
                  rng.standard_normal(1600).astype(np.float32) * 0.1, 16000)
    with open(spk / "19-198.trans.txt", "w") as fo:
        fo.write("19-198-0000 HELLO WORLD\n19-198-0001 FOO BAR\n")
    utts = scan_librispeech(str(tmp_path))
    assert len(utts) == 2
    texts = sorted(u.text for u in utts)
    assert texts == ["foo bar", "hello world"]


def test_synthetic_batch():
    alphabet = Alphabet.from_symbols(list("abcd "))
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, 4, alphabet, duration_s=0.25)
    assert b.wave.shape[0] == 4
    assert b.labels.max() < alphabet.size
    assert all(t for t in b.texts)


def test_prefetch_iterator_order_len_and_errors():
    from pg_asr_tpu.data.dataset import PrefetchIterator

    src = list(range(20))
    pf = PrefetchIterator(src, depth=3)
    assert len(pf) == 20
    assert list(pf) == src
    assert list(pf) == src  # re-iterable (fresh producer thread per epoch)

    class Boom:
        def __iter__(self):
            yield 1
            raise RuntimeError("producer failed")

        def __len__(self):
            return 2

    import pytest as _pytest

    it = iter(PrefetchIterator(Boom(), depth=1))
    assert next(it) == 1
    with _pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_prefetch_wraps_batch_iterator(tmp_path):
    from pg_asr_tpu.data.dataset import (BatchIterator, PrefetchIterator,
                                         load_manifest, make_synthetic_corpus)
    from pg_asr_tpu.data.text import Alphabet

    root = str(tmp_path / "c")
    make_synthetic_corpus(root, n_utts=8, seed=1, min_dur=0.2, max_dur=0.3)
    alphabet = Alphabet.load(os.path.join(root, "alphabet.txt"))
    it = BatchIterator(load_manifest(os.path.join(root, "train.tsv"),
                                     os.path.join(root, "clips")),
                       alphabet, 2, shuffle=False)
    direct = [b.labels.copy() for b in it]
    prefetched = [b.labels.copy() for b in PrefetchIterator(it, depth=2)]
    assert len(direct) == len(prefetched)
    for a, b in zip(direct, prefetched):
        assert np.array_equal(a, b)


def test_batch_iterator_host_sharding():
    from pg_asr_tpu.data.dataset import BatchIterator, Utterance

    utts = [Utterance(f"u{i}.wav", "ab", 100 + i) for i in range(10)]
    alphabet = Alphabet.from_symbols(list("ab"))
    shards = [BatchIterator(utts, alphabet, 2, shard_index=i, shard_count=3)
              for i in range(3)]
    counts = [len(s.utts) for s in shards]
    assert sum(counts) == 10
    paths = sorted(u.audio_path for s in shards for u in s.utts)
    assert paths == sorted(u.audio_path for u in utts)  # disjoint cover


def test_librispeech_to_corpus(tmp_path):
    from pg_asr_tpu.data.dataset import librispeech_to_corpus, load_manifest

    rng = np.random.default_rng(0)
    for split, utt_ids in (("train-clean-100", ["19-198-0000", "19-198-0001"]),
                           ("dev-clean", ["20-100-0000"]),
                           ("test-clean", ["21-101-0000"])):
        spk = tmp_path / split / utt_ids[0].split("-")[0] / utt_ids[0].split("-")[1]
        os.makedirs(spk)
        with open(spk / f"{'-'.join(utt_ids[0].split('-')[:2])}.trans.txt", "w") as fo:
            for uid in utt_ids:
                write_wav(str(spk / f"{uid}.wav"),
                          rng.standard_normal(800).astype(np.float32) * 0.1, 16000)
                fo.write(f"{uid} HELLO THERE\n")

    out = str(tmp_path / "corpus")
    counts = librispeech_to_corpus(str(tmp_path), out)
    assert counts == {"train": 2, "dev": 1, "test": 1}
    assert os.path.exists(os.path.join(out, "alphabet.txt"))
    utts = load_manifest(os.path.join(out, "train.tsv"))
    assert len(utts) == 2
    assert all(os.path.isabs(u.audio_path) and os.path.exists(u.audio_path)
               for u in utts)
    assert utts[0].text == "hello there"
