"""Audio DSP tests: WAV I/O round-trip, resampling, BS.1770 loudness,
silence trimming (reference: data_utils/audio_encoder.py:30-131)."""
import numpy as np

from mamba_tts_tpu.audio import dsp, wavio
from mamba_tts_tpu.audio.preprocess import BaseAudioPreprocessor


def _sine(freq=440.0, sr=16000, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    wav = _sine()
    path = str(tmp_path / "t.wav")
    wavio.write_wav(path, wav, 16000)
    back, sr = wavio.read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=2e-4)  # int16 quantization


def test_read_wav_mono_from_bytes(tmp_path):
    stereo = np.stack([_sine(300), _sine(600)], axis=1)
    path = str(tmp_path / "s.wav")
    wavio.write_wav(path, stereo, 16000)
    data = open(path, "rb").read()
    mono, sr = wavio.read_wav_mono(data, target_sr=8000)
    assert sr == 8000
    assert mono.ndim == 1
    assert abs(mono.shape[0] - 8000) <= 1


def test_resample_length_and_content():
    wav = _sine(440, sr=48000, seconds=0.5)
    out = dsp.resample(wav, 48000, 16000)
    assert abs(out.shape[0] - 8000) <= 1
    # energy is preserved approximately
    assert abs(np.std(out) - np.std(wav)) < 0.02


def test_integrated_loudness_gain_relationship():
    """+6 dB gain must raise integrated loudness by ~6 LU."""
    wav = _sine(seconds=2.0, amp=0.25)
    l1 = dsp.integrated_loudness(wav, 16000)
    l2 = dsp.integrated_loudness(2.0 * wav, 16000)
    assert abs((l2 - l1) - 6.0206) < 0.1


def test_normalize_loudness_hits_target():
    wav = _sine(seconds=2.0, amp=0.05)
    out = dsp.normalize_loudness(wav, 16000, target_db=-20.0)
    measured = dsp.integrated_loudness(out, 16000)
    assert abs(measured - (-20.0)) < 0.5


def test_normalize_loudness_silent_guard():
    silent = np.zeros(16000, np.float32)
    out = dsp.normalize_loudness(silent, 16000)
    np.testing.assert_array_equal(out, silent)


def test_trim_silence():
    sig = _sine(seconds=0.5)
    padded = np.concatenate([np.zeros(8000, np.float32), sig, np.zeros(8000, np.float32)])
    trimmed, (start, end) = dsp.trim_silence(padded, top_db=20)
    assert trimmed.shape[0] < padded.shape[0]
    # retained region covers the tone
    assert start < 8000 + 2048 and end > 8000 + len(sig) - 2048
    assert np.abs(trimmed).max() > 0.4


def test_preprocessor_pipeline(tmp_path):
    wav = np.concatenate([np.zeros(4000, np.float32), _sine(seconds=0.5, amp=0.05),
                          np.zeros(4000, np.float32)])
    path = str(tmp_path / "in.wav")
    wavio.write_wav(path, wav, 16000)
    pre = BaseAudioPreprocessor(sample_rate=16000)
    out, sr = pre.preprocess(path)
    assert sr == 16000
    assert out.shape[0] < wav.shape[0]  # trimmed
    np.testing.assert_allclose(np.abs(out).max(), 1.0, atol=1e-4)  # peak normed
    pre.save_wav(out, str(tmp_path / "out.wav"))
    back, _ = wavio.read_wav(str(tmp_path / "out.wav"))
    assert back.shape == out.shape
