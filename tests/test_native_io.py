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
