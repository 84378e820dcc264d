"""Data pipeline: manifests, LibriSpeech scan, bucketing + static shape
quantization, synthetic corpus layout."""

import os
import time

import numpy as np
import pytest

from pg_asr_tpu.data.audio import write_wav
from pg_asr_tpu.data.dataset import (BatchIterator, PrefetchIterator,
                                     load_manifest, make_synthetic_corpus,
                                     scan_librispeech, synthetic_batch)
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
        # default transfer dtype is int16 PCM (converted on-device with
        # x/32768 by ops/features.extract_features)
        assert batch.wave.dtype == np.int16
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


def test_int16_transfer_parity_and_fallbacks(tmp_path):
    """The int16 wave path (native fread fast-path OR the Python quantize
    fallback) reproduces the float32 path bit-exactly for 16-bit WAV
    sources, both raw and after on-device conversion."""
    import jax.numpy as jnp

    from pg_asr_tpu.config import FeatureConfig
    from pg_asr_tpu.ops.features import extract_features

    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=6, seed=3,
                                        min_dur=0.1, max_dur=0.4)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    kw = dict(batch_size=3, shuffle=False)
    bf = next(iter(BatchIterator(utts, alphabet, wave_dtype="float32", **kw)))
    bi = next(iter(BatchIterator(utts, alphabet, wave_dtype="int16", **kw)))
    assert bi.wave.dtype == np.int16 and bf.wave.dtype == np.float32
    np.testing.assert_array_equal(bi.num_samples, bf.num_samples)
    np.testing.assert_array_equal(bi.wave.astype(np.float32) / 32768.0,
                                  bf.wave)

    cfg = FeatureConfig(n_fft=256, win_length=256, hop_length=128, n_mels=8)
    f_f = extract_features(jnp.asarray(bf.wave),
                           jnp.asarray(bf.num_samples), cfg)[0]
    f_i = extract_features(jnp.asarray(bi.wave),
                           jnp.asarray(bi.num_samples), cfg)[0]
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_i))

    # pure-Python fallback (custom loader bypasses the native tier) agrees
    from pg_asr_tpu.data.audio import load_audio

    bp = next(iter(BatchIterator(utts, alphabet, wave_dtype="int16",
                                 loader=load_audio, **kw)))
    np.testing.assert_array_equal(bp.wave, bi.wave)

    with pytest.raises(ValueError):
        BatchIterator(utts, alphabet, wave_dtype="f64", **kw)


def test_batch_cache_across_epochs(tmp_path):
    """cache_mb > 0: epoch 2 serves the SAME Batch objects (no reload),
    the budget bounds what gets cached, and cache_mb=0 disables it."""
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=6, seed=4,
                                        min_dur=0.1, max_dur=0.3)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, batch_size=3, shuffle=False,
                       cache_mb=64.0)
    e1 = list(it)
    e2 = list(it)
    assert len(e1) == len(e2) >= 2
    for a, b in zip(e1, e2):
        assert a is b  # served from cache, not rebuilt

    it0 = BatchIterator(utts, alphabet, batch_size=3, shuffle=False)
    a1 = list(it0)
    a2 = list(it0)
    for a, b in zip(a1, a2):
        assert a is not b
        np.testing.assert_array_equal(a.wave, b.wave)

    # tiny budget: caching stops once the budget is spent, batches still flow
    it_small = BatchIterator(utts, alphabet, batch_size=3, shuffle=False,
                             cache_mb=1e-4)
    b1 = list(it_small)
    b2 = list(it_small)
    assert len(b1) == len(b2)
    assert all(a is not b for a, b in zip(b1, b2))


def test_header_only_length_probe(tmp_path):
    """Bucketing establishes num_samples from the WAV header (no decode);
    the values match what a full load reports."""
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=5, seed=6,
                                        min_dur=0.1, max_dur=0.5)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, batch_size=2, shuffle=False)
    lens_probe = [it._ensure_len(i) for i in range(len(utts))]
    from pg_asr_tpu.data.audio import load_audio

    for u, n in zip(utts, lens_probe):
        w, sr = load_audio(u.audio_path)
        assert sr == 16000 and len(w) == n


def test_prefetch_transform_and_early_break(tmp_path):
    """transform runs in the producer thread; breaking the consumer loop
    mid-epoch terminates the producer (no stuck threads across epochs)."""
    import threading

    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=8, seed=7,
                                        min_dur=0.1, max_dur=0.2)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    base = BatchIterator(utts, alphabet, batch_size=2, shuffle=False)
    tagged = PrefetchIterator(base, depth=1,
                              transform=lambda b: ("staged", b))
    before = threading.active_count()
    for tag, b in tagged:
        assert tag == "staged"
        break  # abandon the epoch after one batch
    # the producer notices within its 0.1 s put timeout and exits
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    # a fresh epoch still works after the abandoned one
    out = [b for _, b in tagged]
    assert len(out) == len(base)


def test_pooled_loader_matches_inline(tmp_path):
    """num_workers>0 builds batches on a thread pool but must preserve the
    inline path's exact batch order, composition, and contents (resume and
    batch-cache semantics depend on determinism)."""
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=10, seed=11,
                                        min_dur=0.1, max_dur=0.3)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))

    inline = BatchIterator(utts, alphabet, batch_size=3, seed=3)
    pooled = BatchIterator(load_manifest(os.path.join(root, "train.tsv"),
                                         os.path.join(root, "clips")),
                           alphabet, batch_size=3, seed=3, num_workers=3,
                           cache_mb=64.0)
    for epoch in range(2):  # epoch 2 exercises the pool + batch-cache mix
        a = list(inline)
        b = list(pooled)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x.wave, y.wave)
            np.testing.assert_array_equal(x.labels, y.labels)
            np.testing.assert_array_equal(x.num_samples, y.num_samples)
            assert x.texts == y.texts


def test_pooled_loader_early_break(tmp_path):
    """Abandoning an epoch mid-stream cancels queued decode work and a
    fresh epoch still yields the full batch list."""
    root = str(tmp_path)
    _, alphabet = make_synthetic_corpus(root, n_utts=8, seed=12,
                                        min_dur=0.1, max_dur=0.2)
    utts = load_manifest(os.path.join(root, "train.tsv"),
                         os.path.join(root, "clips"))
    it = BatchIterator(utts, alphabet, batch_size=2, num_workers=2)
    for _ in it:
        break
    assert len(list(it)) == len(it)
