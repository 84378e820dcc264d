"""Manifests, length-bucketed batching, and synthetic corpora.

Replaces the reference's torch Dataset + collate (reference data.py:107-133)
with a TPU-shaped input pipeline:
  * manifest TSVs (Common Voice style: columns `path`, `sentence`) or a
    LibriSpeech directory scan;
  * duration-sorted length bucketing so a jitted step sees only a handful of
    padded shapes (waveform length and label length each rounded up to a
    quantum) — no per-batch recompiles, minimal padding waste;
  * batches carry RAW waveforms; featurization happens on-device
    (ops/features.py), so raw audio is the only H2D transfer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

from .audio import load_audio, synth_utterance, write_wav
from .text import Alphabet, read_tsv


@dataclass
class Utterance:
    audio_path: str
    text: str
    num_samples: int  # -1 if unknown until load


@dataclass
class Batch:
    """One padded batch of raw audio + encoded transcripts."""

    wave: np.ndarray          # (B, N) zero-padded; float32 in [-1, 1] or
                              # int16 PCM (converted on-device by
                              # ops/features.extract_features with x/32768)
    num_samples: np.ndarray   # (B,) int32
    labels: np.ndarray        # (B, L) int32, 0-padded
    label_lens: np.ndarray    # (B,) int32
    texts: list[str]          # reference transcripts (for eval)
    paths: list[str] | None = None  # source audio paths (pseudo-labeling)

    @property
    def size(self) -> int:
        return self.wave.shape[0]


def load_manifest(tsv_path: str, audio_dir: str | None = None) -> list[Utterance]:
    """Common Voice style TSV (columns `path`, `sentence`) -> utterances
    (reference Data.__init__ contract, reference data.py:118-123)."""
    _, rows = read_tsv(tsv_path)
    utts = []
    for r in rows:
        p = r["path"]
        if audio_dir is not None and not os.path.isabs(p):
            p = os.path.join(audio_dir, p)
        utts.append(Utterance(audio_path=p, text=r.get("sentence", ""), num_samples=-1))
    return utts


def scan_librispeech(root: str) -> list[Utterance]:
    """Scan a LibriSpeech split dir (speaker/chapter/*.trans.txt + .flac/.wav)."""
    utts = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if fn.endswith(".trans.txt"):
                with open(os.path.join(dirpath, fn)) as fo:
                    for line in fo:
                        utt_id, _, text = line.strip().partition(" ")
                        for ext in (".flac", ".wav"):
                            ap = os.path.join(dirpath, utt_id + ext)
                            if os.path.exists(ap):
                                utts.append(Utterance(ap, text.lower(), -1))
                                break
    return utts


def librispeech_to_corpus(root: str, out_dir: str) -> dict:
    """Convert a LibriSpeech directory tree into the corpus layout the
    drivers consume (train/dev/test.tsv + alphabet.txt; audio referenced by
    absolute path, so no clips/ copy). Split subdirs are classified by name
    prefix (train-*, dev-*, test-*); multiple subdirs per split concatenate.
    Returns {"train": n, "dev": n, "test": n}.
    """
    from .text import Alphabet, write_tsv

    splits: dict[str, list[Utterance]] = {"train": [], "dev": [], "test": []}
    for entry in sorted(os.listdir(root)):
        full = os.path.join(root, entry)
        if not os.path.isdir(full):
            continue
        for split in splits:
            if entry.startswith(split):
                splits[split].extend(scan_librispeech(full))
                break
    if not any(splits.values()):  # flat tree: treat root itself as train
        splits["train"] = scan_librispeech(root)

    os.makedirs(out_dir, exist_ok=True)
    for split, utts in splits.items():
        if not utts:
            continue
        rows = [{"path": u.audio_path, "sentence": u.text} for u in utts]
        write_tsv(os.path.join(out_dir, f"{split}.tsv"),
                  ["path", "sentence"], rows)
    texts = [u.text for u in splits["train"]] or [
        u.text for us in splits.values() for u in us]
    Alphabet.from_texts(texts).save(os.path.join(out_dir, "alphabet.txt"))
    return {k: len(v) for k, v in splits.items()}


def _round_up(x: int, q: int) -> int:
    return ((x + q - 1) // q) * q


def _resample_linear(w: np.ndarray, n_out: int) -> np.ndarray:
    try:
        from . import native_io

        if native_io.native_available():
            return native_io.resample(w, n_out)
    except Exception:
        pass
    return np.interp(np.linspace(0.0, len(w) - 1.0, n_out),
                     np.arange(len(w)), w).astype(np.float32)


def default_loader(path: str) -> tuple[np.ndarray, int]:
    """Audio loader preferring the native C++ decoder (data/native_io.py)
    for WAV, falling back to the pure-Python readers."""
    if path.lower().endswith(".wav"):
        try:
            from . import native_io

            if native_io.native_available():
                return native_io.read_wav(path)
        except Exception:
            pass
    return load_audio(path)


class BatchIterator:
    """Length-bucketed padded batches of raw audio.

    Utterances are sorted by (cached) sample count, chunked into batches, and
    each batch padded to (rounded-up) max lengths. Batch order is shuffled
    per epoch; within-batch composition stays bucketed, which is the standard
    throughput/static-shape trade.
    """

    def __init__(self, utterances: list[Utterance], alphabet: Alphabet,
                 batch_size: int, *, sample_rate: int = 16000,
                 wave_quantum: int = 16000, label_quantum: int = 32,
                 max_samples: int | None = None, shuffle: bool = True,
                 drop_remainder: bool = False, seed: int = 0,
                 loader: Callable[[str], tuple[np.ndarray, int]] | None = None,
                 shard_index: int = 0, shard_count: int = 1,
                 cache_mb: float = 0.0, wave_dtype: str = "int16",
                 num_workers: int = 0):
        # multi-host data parallelism: each process iterates a disjoint
        # slice of the corpus (train() passes jax.process_index/count)
        utterances = list(utterances)
        if shard_count > 1:
            utterances = utterances[shard_index::shard_count]
        self.utts = list(utterances)
        self.alphabet = alphabet
        self.batch_size = batch_size
        self.sample_rate = sample_rate
        self.wave_quantum = wave_quantum
        self.label_quantum = label_quantum
        self.max_samples = max_samples
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.rng = np.random.default_rng(seed)
        self.loader = loader or default_loader
        self._cache: dict[str, np.ndarray] = {}
        self._epoch = 0
        self._skip_next = 0  # batches to drop at the next epoch (resume)
        # built-batch cache: bucketed chunk COMPOSITION is identical across
        # epochs (only chunk order shuffles), so finished batches can be
        # reused verbatim from epoch 2 on — disk reads, WAV decode, and
        # padding drop out of the steady-state epoch entirely. Bounded by
        # cache_mb (0 = off); once the budget is spent, remaining batches
        # keep the uncached path (partial caching still helps).
        self.cache_mb = float(cache_mb)
        self._batch_cache: dict[tuple, Batch] = {}
        self._batch_cache_bytes = 0
        # "int16": ship PCM to the device and convert with x/32768 inside
        # the jitted step (ops/features.extract_features) — host decode of
        # 16-bit WAV becomes a straight fread and the H2D transfer halves;
        # bit-exact vs float32 for 16-bit sources (the overwhelming case),
        # within one LSB of 1/32768 otherwise. "float32": host-converted.
        if wave_dtype not in ("int16", "float32"):
            raise ValueError(f"wave_dtype must be int16|float32, "
                             f"got {wave_dtype!r}")
        self.wave_dtype = wave_dtype
        # decode parallelism: >0 builds batches on a thread pool with a
        # bounded in-order sliding window (batch ORDER and composition are
        # unchanged — resume/cache semantics depend on determinism). The
        # native decoder releases the GIL, so workers scale on real hosts;
        # 0 keeps the inline single-thread path; -1 = auto (2 on hosts
        # with >= 4 cores, else 0 — on a 1-core host extra threads only
        # thrash the GIL against the staging/dispatch threads, measured
        # docs/PERF.md r3).
        if num_workers < 0:
            num_workers = 2 if (os.cpu_count() or 1) >= 4 else 0
        self.num_workers = int(num_workers)

    def _load(self, utt: Utterance) -> np.ndarray:
        w = self._cache.get(utt.audio_path)
        if w is None:
            w, sr = self.loader(utt.audio_path)
            if sr != self.sample_rate:
                # linear resample (native C++ when available; np.interp
                # fallback — identical semantics). Heavy corpora should
                # still be resampled offline.
                # +0.5 truncation, NOT round() (half-to-even): must match
                # the native resampler's output-length arithmetic exactly
                # (native/pgasr_io.cpp) or the header-only probe in
                # _ensure_len can under-count by one sample on exact-tie
                # lengths and silently clip the last sample
                n_out = int(len(w) * self.sample_rate / sr + 0.5)
                w = _resample_linear(w, n_out)
            if self.max_samples:
                w = w[: self.max_samples]
            utt.num_samples = len(w)
        return w

    def __len__(self) -> int:
        n = len(self.utts)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        # ensure lengths known for bucketing (loads once; cached thereafter
        # only if caching enabled upstream)
        order = sorted(range(len(self.utts)),
                       key=lambda i: (self._ensure_len(i), i))
        chunks = [order[i : i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        if self.drop_remainder and chunks and len(chunks[-1]) < self.batch_size:
            chunks.pop()
        if self.shuffle:
            self.rng.shuffle(chunks)
        self._epoch += 1
        if self._skip_next:
            chunks = chunks[self._skip_next:]
            self._skip_next = 0
        if self.num_workers > 0:
            yield from self._iter_pooled(chunks)
            return
        for chunk in chunks:
            key = tuple(chunk)
            cached = self._batch_cache.get(key)
            if cached is not None:
                yield cached
                continue
            batch = self._make_batch([self.utts[i] for i in chunk])
            self._maybe_cache(key, batch)
            yield batch

    def _maybe_cache(self, key: tuple, batch: Batch) -> None:
        if self.cache_mb > 0:
            nbytes = (batch.wave.nbytes + batch.num_samples.nbytes
                      + batch.labels.nbytes + batch.label_lens.nbytes)
            if self._batch_cache_bytes + nbytes <= self.cache_mb * (1 << 20):
                self._batch_cache[key] = batch
                self._batch_cache_bytes += nbytes

    def _iter_pooled(self, chunks) -> Iterator[Batch]:
        """Decode-parallel batch construction: up to num_workers batches
        build concurrently, yielded strictly IN ORDER. Cache hits are
        resolved in this (consumer) thread, so the batch cache stays
        single-writer; only misses go to the pool."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window: list[tuple[tuple, object]] = []  # (key, Batch|Future)

            def submit(chunk):
                key = tuple(chunk)
                cached = self._batch_cache.get(key)
                if cached is not None:
                    return key, cached
                utts = [self.utts[i] for i in chunk]
                return key, pool.submit(self._make_batch, utts)

            it = iter(chunks)
            try:
                for chunk in it:
                    window.append(submit(chunk))
                    if len(window) <= self.num_workers:
                        continue
                    key, item = window.pop(0)
                    if isinstance(item, Batch):
                        yield item
                    else:
                        batch = item.result()
                        self._maybe_cache(key, batch)
                        yield batch
                for key, item in window:
                    if isinstance(item, Batch):
                        yield item
                    else:
                        batch = item.result()
                        self._maybe_cache(key, batch)
                        yield batch
            finally:
                # consumer abandoned the epoch: drop queued work so the
                # pool shuts down promptly
                for _, item in window:
                    if not isinstance(item, Batch):
                        item.cancel()

    def skip_epochs(self, k: int) -> None:
        """Advance the shuffle RNG past k epochs without building batches.

        The per-epoch batch order is a pure function of (seed, epoch index):
        each epoch draws exactly one rng.shuffle of the chunk list, whose
        stream consumption depends only on its LENGTH. Mid-epoch resume
        (train.save_every_steps) replays the interrupted epoch's exact
        order by skipping the completed epochs here and the completed
        batches via skip_batches()."""
        c = len(self)  # the same count __iter__ shuffles
        for _ in range(k):
            if self.shuffle:
                self.rng.shuffle(list(range(c)))
            self._epoch += 1

    def skip_batches(self, n: int) -> None:
        """Drop the first n batches of the NEXT epoch (they were consumed
        before the interruption) without loading their audio."""
        self._skip_next = int(n)

    def _ensure_len(self, i: int) -> int:
        u = self.utts[i]
        if u.num_samples < 0:
            # header-only probe for the standard WAV path: bucketing needs
            # ONLY the post-resample sample count, so a full decode (which
            # the old path paid once per utterance) is wasted work
            if (self.loader is default_loader
                    and u.audio_path.lower().endswith(".wav")):
                try:
                    from . import native_io

                    if native_io.native_available():
                        sr, n = native_io.wav_info(u.audio_path)
                        if sr != self.sample_rate:
                            # same +0.5 truncation as the resamplers (native
                            # and Python): the probe must equal the decoded
                            # post-resample length exactly
                            n = int(n * self.sample_rate / sr + 0.5)
                        if self.max_samples:
                            n = min(n, self.max_samples)
                        u.num_samples = max(int(n), 0)
                        return u.num_samples
                except Exception:
                    pass
            self._load(u)
        return u.num_samples

    def _make_batch(self, utts: list[Utterance]) -> Batch:
        wave, lens = self._batch_waves(utts)
        enc = self.alphabet.encode_batch([u.text for u in utts])
        llens = np.array([len(e) for e in enc], np.int32)
        L = _round_up(max(int(llens.max()), 1), self.label_quantum)
        labels = np.zeros((len(utts), L), np.int32)
        for i, e in enumerate(enc):
            labels[i, : len(e)] = e
        return Batch(wave, lens, labels, llens, [u.text for u in utts],
                     paths=[u.audio_path for u in utts])

    def _batch_waves(self, utts: list[Utterance]):
        """Padded (B, N) float32 waves + lengths. Fast path: ONE native
        threaded call decodes (and resamples) every file of the batch
        straight into the zero-padded buffer — no per-file Python loop, no
        second pad-copy. Falls back per-utterance for custom loaders or
        when lengths aren't established yet (the bucketing pass in
        __iter__ normally sets them before any batch is built)."""
        if self.loader is default_loader and \
                all(u.num_samples >= 0 for u in utts):
            try:
                from . import native_io

                if native_io.native_available():
                    cap = max(int(u.num_samples) for u in utts)
                    N = _round_up(max(cap, 1), self.wave_quantum)
                    paths = [u.audio_path for u in utts]
                    if self.wave_dtype == "int16":
                        wave, lens, _ = native_io.load_batch_i16(
                            paths, N, target_rate=self.sample_rate)
                    else:
                        wave, lens, _ = native_io.load_batch(
                            paths, N, target_rate=self.sample_rate)
                    lens = np.minimum(lens, N).astype(np.int32)
                    if self.max_samples:
                        # python path truncates at max_samples; native fills
                        # to the stride — zero the (rare) overhang rows
                        over = lens > self.max_samples
                        if over.any():
                            idx = np.arange(N)[None, :]
                            wave[over] *= idx < self.max_samples
                            lens = np.minimum(lens, self.max_samples)
                    return wave, lens
            except Exception:
                pass  # any native failure -> exact Python fallback below
        waves = [self._load(u) for u in utts]
        lens = np.array([len(w) for w in waves], np.int32)
        N = _round_up(max(int(lens.max()), 1), self.wave_quantum)
        wave = np.zeros((len(utts), N), np.float32)
        for i, w in enumerate(waves):
            wave[i, : len(w)] = w
        if self.wave_dtype == "int16":
            # quantize exactly like the native path (lrintf and np.rint
            # both round half-to-even; int16-sourced floats land back on
            # integers so no ties arise anyway)
            wave = np.clip(np.rint(wave * 32768.0), -32768,
                           32767).astype(np.int16)
        return wave, lens


class PrefetchIterator:
    """Background-thread prefetch over any Batch iterable.

    Overlaps host-side batch construction (WAV decode + padding — the native
    C++ tier or the Python fallback) with the device step: while the chip
    runs step N, the host builds batches N+1..N+depth into a bounded queue.
    The TPU-shaped replacement for the reference's DataLoader worker
    processes (reference model.py:219) without pickling/fork overhead —
    decode releases the GIL in the native tier, so one thread suffices.

    Exceptions in the producer are re-raised in the consumer. Each __iter__
    spawns a fresh producer thread (one epoch).

    `transform` (optional) runs on each batch IN THE PRODUCER THREAD before
    it is queued. Its intended use is device staging (jax.device_put /
    mesh.shard_batch_arrays): host->device transfers then overlap the
    consumer's step dispatch instead of blocking it inline — measured 2x
    sustained epoch throughput under a high-latency device link. The
    consumer receives whatever transform returns.
    """

    _DONE = object()

    def __init__(self, source, depth: int = 2, transform=None):
        self.source = source
        self.depth = max(1, depth)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.source)

    def __iter__(self) -> Iterator[Batch]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list[BaseException] = []
        stop = threading.Event()  # consumer abandoned the epoch (break)

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b in self.source:
                    if not _put(b if self.transform is None
                                else self.transform(b)):
                        return  # drop queued work (and its device buffers)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                err.append(e)
            finally:
                _put(self._DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # breaking out of the epoch mid-stream: unblock + end the
            # producer, then drain the queue and join so queued
            # (device-staged) batches are released DETERMINISTICALLY before
            # a restarted epoch spawns its producer — otherwise up to
            # `depth` device buffers linger until GC alongside the new
            # epoch's staging
            stop.set()
            t.join(timeout=5.0)
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


# ---------------------------------------------------------------------------
# Synthetic corpus (tests + benchmarks, no external data needed)
# ---------------------------------------------------------------------------

def make_synthetic_corpus(root: str, n_utts: int = 16, seed: int = 0,
                          sample_rate: int = 16000,
                          min_dur: float = 0.3, max_dur: float = 1.2,
                          words=("abba", "cad", "bad", "cab", "dada")) -> tuple[str, Alphabet]:
    """Write a tiny on-disk corpus: clips/*.wav + train/dev/test.tsv +
    alphabet.txt, mirroring the Common Voice layout the reference consumes
    (reference  server.txt:1). Returns (corpus_path, alphabet)."""
    rng = np.random.default_rng(seed)
    clips = os.path.join(root, "clips")
    os.makedirs(clips, exist_ok=True)
    rows = []
    for i in range(n_utts):
        dur = float(rng.uniform(min_dur, max_dur))
        wav = synth_utterance(rng, dur, sample_rate)
        fn = f"utt{i:04d}.wav"
        write_wav(os.path.join(clips, fn), wav, sample_rate)
        text = " ".join(rng.choice(words) for _ in range(rng.integers(1, 4)))
        rows.append({"path": fn, "sentence": text})

    alphabet = Alphabet.from_texts([r["sentence"] for r in rows])
    alphabet.save(os.path.join(root, "alphabet.txt"))

    from .text import write_tsv

    n_dev = max(1, n_utts // 8)
    write_tsv(os.path.join(root, "train.tsv"), ["path", "sentence"], rows[: n_utts - 2 * n_dev])
    write_tsv(os.path.join(root, "dev.tsv"), ["path", "sentence"], rows[n_utts - 2 * n_dev : n_utts - n_dev])
    write_tsv(os.path.join(root, "test.tsv"), ["path", "sentence"], rows[n_utts - n_dev :])
    return root, alphabet


def synth_phonetic_utterance(text: str, rng: np.random.Generator,
                             sample_rate: int = 16000) -> np.ndarray:
    """Waveform that ENCODES the transcript: each character is a fixed-
    frequency tone segment (distinct per character), spaces are silence,
    plus mild amplitude/phase jitter and noise. Unlike synth_utterance
    (random tones, text-independent — only memorizable), a working ASR
    model can genuinely LEARN this mapping and reach ~0 test CER, which is
    what makes accuracy head-to-heads on synthetic data meaningful
    (BASELINE.md)."""
    char_n = int(0.090 * sample_rate)
    gap_n = int(0.020 * sample_rate)
    space_n = int(0.120 * sample_rate)
    pieces = [np.zeros(gap_n, np.float32)]
    for ch in text:
        if ch == " ":
            pieces.append(np.zeros(space_n, np.float32))
            continue
        f = 220.0 * 2.0 ** ((ord(ch) % 26) / 9.0)  # distinct per a-z
        t = np.arange(char_n, dtype=np.float32) / sample_rate
        amp = float(rng.uniform(0.25, 0.4))
        phase = float(rng.uniform(0, 2 * np.pi))
        tone = amp * np.sin(2 * np.pi * f * t + phase).astype(np.float32)
        # 5 ms fade in/out against clicks
        ramp = min(int(0.005 * sample_rate), char_n // 2)
        env = np.ones(char_n, np.float32)
        env[:ramp] = np.linspace(0, 1, ramp, dtype=np.float32)
        env[-ramp:] = np.linspace(1, 0, ramp, dtype=np.float32)
        pieces.append(tone * env)
        pieces.append(np.zeros(gap_n, np.float32))
    x = np.concatenate(pieces)
    x = x + 0.01 * rng.standard_normal(len(x)).astype(np.float32)
    return x


def make_phonetic_corpus(root: str, n_utts: int = 96, seed: int = 0,
                         sample_rate: int = 16000,
                         words=("abba", "cad", "bad", "cab", "dada"),
                         max_words: int = 3) -> tuple[str, Alphabet]:
    """Learnable on-disk corpus (synth_phonetic_utterance audio), same
    Common Voice-style layout as make_synthetic_corpus; train/dev/test
    splits share the character->tone code but not utterances, so test
    CER measures real generalization."""
    rng = np.random.default_rng(seed)
    clips = os.path.join(root, "clips")
    os.makedirs(clips, exist_ok=True)
    rows = []
    for i in range(n_utts):
        text = " ".join(rng.choice(words)
                        for _ in range(rng.integers(1, max_words + 1)))
        wav = synth_phonetic_utterance(text, rng, sample_rate)
        fn = f"utt{i:04d}.wav"
        write_wav(os.path.join(clips, fn), wav, sample_rate)
        rows.append({"path": fn, "sentence": text})

    alphabet = Alphabet.from_texts([r["sentence"] for r in rows])
    alphabet.save(os.path.join(root, "alphabet.txt"))

    from .text import write_tsv

    n_dev = max(1, n_utts // 8)
    write_tsv(os.path.join(root, "train.tsv"), ["path", "sentence"],
              rows[: n_utts - 2 * n_dev])
    write_tsv(os.path.join(root, "dev.tsv"), ["path", "sentence"],
              rows[n_utts - 2 * n_dev: n_utts - n_dev])
    write_tsv(os.path.join(root, "test.tsv"), ["path", "sentence"],
              rows[n_utts - n_dev:])
    return root, alphabet


def synthetic_batch(rng: np.random.Generator, batch_size: int, alphabet: Alphabet,
                    duration_s: float = 1.0, sample_rate: int = 16000,
                    text_len: int = 12) -> Batch:
    """In-memory synthetic batch (benchmarks / graft entry)."""
    n = int(duration_s * sample_rate)
    wave = np.stack([synth_utterance(rng, duration_s, sample_rate) for _ in range(batch_size)])
    lens = np.full(batch_size, n, np.int32)
    syms = [s for s in alphabet.symbols[1:]]
    texts = ["".join(rng.choice(syms) for _ in range(text_len)) for _ in range(batch_size)]
    enc = [alphabet.encode(t) for t in texts]
    L = _round_up(text_len, 8)
    labels = np.zeros((batch_size, L), np.int32)
    for i, e in enumerate(enc):
        labels[i, : len(e)] = e
    llens = np.array([len(e) for e in enc], np.int32)
    return Batch(wave.astype(np.float32), lens, labels, llens, texts)
