"""Native C++ data runtime tests: tar indexing, WAV decode, resampling,
batch loading — vs the pure-Python implementations."""
import numpy as np
import pytest

from mamba_tts_tpu.audio import dsp, wavio
from mamba_tts_tpu.data import native
from mamba_tts_tpu.data.dataset import make_synthetic_dataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libttsdata.so not built"
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_synth")
    return make_synthetic_dataset(str(d), n_items=6)


def test_decode_wav_bytes_matches_python(tmp_path):
    t = np.arange(16000) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    wavio.write_wav(path, wav, 16000)
    data = open(path, "rb").read()
    nat = native.decode_wav_bytes(data, target_sr=0)
    py, sr = wavio.read_wav(data)
    assert sr == 16000
    np.testing.assert_allclose(nat, py, atol=1e-6)


def test_native_resample_close_to_scipy(tmp_path):
    t = np.arange(48000) / 48000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "b.wav")
    wavio.write_wav(path, wav, 48000)
    data = open(path, "rb").read()
    nat = native.decode_wav_bytes(data, target_sr=16000)
    ref = dsp.resample(wavio.read_wav(data)[0], 48000, 16000)
    assert abs(len(nat) - len(ref)) <= 2
    n = min(len(nat), len(ref))
    # both are windowed-sinc anti-aliased resamplers; interiors agree closely
    core = slice(100, n - 100)
    err = np.abs(nat[core] - ref[core]).max()
    assert err < 5e-3, err


def test_tar_reader_index_and_read(synth):
    _, tar_path = synth
    r = native.NativeTarReader(tar_path)
    assert len(r) == 6
    names = r.names()
    assert all(n.endswith(".wav") for n in names)
    wav = r.read_wav(names[0], target_sr=16000)
    assert wav is not None and wav.shape[0] == 6400  # 0.4 s @ 16 kHz
    assert np.abs(wav).max() > 0.1
    assert r.find("missing.wav") == -1
    assert r.read_wav("missing.wav") is None


def test_tar_batch_matches_single(synth):
    _, tar_path = synth
    r = native.NativeTarReader(tar_path)
    names = r.names()
    batch = r.read_batch(names + ["missing.wav"], target_sr=16000, n_threads=4)
    assert batch[-1] is None
    for name, arr in zip(names, batch):
        single = r.read_wav(name, target_sr=16000)
        np.testing.assert_allclose(arr, single, atol=1e-7)


def test_native_matches_python_tar_pipeline(synth):
    """Native loader output == pure-Python tarfile + scipy pipeline."""
    import io
    import tarfile

    _, tar_path = synth
    r = native.NativeTarReader(tar_path)
    with tarfile.open(tar_path, "r:*") as tf:
        member = [m for m in tf.getmembers() if m.name.endswith(".wav")][0]
        data = tf.extractfile(member).read()
    py, _ = wavio.read_wav_mono(data, target_sr=16000)
    nat = r.read_wav(member.name, target_sr=16000)
    np.testing.assert_allclose(nat, py, atol=1e-6)
