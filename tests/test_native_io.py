"""Native C++ WAV IO vs the pure-Python reader: identical samples, batch
loading fills padded buffers correctly."""

import numpy as np
import pytest

from pg_asr_tpu.data.audio import synth_utterance, write_wav, read_wav
from pg_asr_tpu.data import native_io


pytestmark = pytest.mark.skipif(not native_io.native_available(),
                                reason="native IO library unavailable")


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    paths, refs = [], []
    for i, dur in enumerate([0.11, 0.23, 0.05]):
        w = synth_utterance(rng, dur, 16000)
        p = str(root / f"f{i}.wav")
        write_wav(p, w, 16000)
        paths.append(p)
        refs.append(read_wav(p)[0])  # python decode of the quantized file
    return paths, refs


def test_wav_info(wavs):
    paths, refs = wavs
    sr, n = native_io.wav_info(paths[0])
    assert sr == 16000
    assert n == len(refs[0])


def test_read_wav_matches_python(wavs):
    paths, refs = wavs
    for p, ref in zip(paths, refs):
        got, sr = native_io.read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_load_batch(wavs):
    paths, refs = wavs
    stride = max(len(r) for r in refs) + 7
    batch, lens, srs = native_io.load_batch(paths, stride)
    assert batch.shape == (3, stride)
    for i, ref in enumerate(refs):
        assert lens[i] == len(ref)
        np.testing.assert_allclose(batch[i, : lens[i]], ref, atol=1e-6)
        assert np.all(batch[i, lens[i]:] == 0.0)
    assert list(srs) == [16000] * 3


def test_load_batch_missing_file(wavs, tmp_path):
    paths, _ = wavs
    with pytest.raises(IOError):
        native_io.load_batch([paths[0], str(tmp_path / "nope.wav")], 1000)


@pytest.mark.skipif(not native_io.native_available(), reason="no native lib")
def test_native_resample_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4801).astype(np.float32)
    for n_out in (1600, 4801, 9602, 1):
        got = native_io.resample(x, n_out)
        ref = np.interp(np.linspace(0.0, len(x) - 1.0, n_out),
                        np.arange(len(x)), x).astype(np.float32)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(not native_io.native_available(), reason="no native lib")
def test_native_batch_load_with_resample(tmp_path):
    from pg_asr_tpu.data.audio import write_wav

    rng = np.random.default_rng(1)
    paths = []
    for i, sr in enumerate((16000, 8000, 48000)):
        w = rng.standard_normal(sr // 2).astype(np.float32) * 0.5  # 0.5 s
        p = str(tmp_path / f"f{i}_{sr}.wav")
        write_wav(p, w, sr)
        paths.append(p)

    batch, lens, srs = native_io.load_batch(paths, stride=16000,
                                            target_rate=16000)
    assert batch.shape == (3, 16000)
    assert all(s == 16000 for s in srs)
    # every file is 0.5 s -> ~8000 samples at 16 kHz after resampling
    assert all(abs(int(l) - 8000) <= 1 for l in lens), lens
    # rows zero-padded past their lengths
    for r, l in zip(batch, lens):
        assert np.all(r[int(l):] == 0.0)
