"""Stdlib WAV codec (functions/wav.py) + WavBackend: round-trip, stereo
averaging, loud rejection, and real-DSP properties (a pure sine's zero
crossings ≈ 2·f·duration; identical signal in mono vs duplicated-stereo
containers yields identical features)."""

import numpy as np
import pyarrow as pa
import pytest

from ptt_spider_go_ray.functions.wav import (
    band_energies,
    decode_wav,
    encode_wav,
    rms_e6,
    zero_crossings,
)
from ptt_spider_go_ray.stages.multimodal import AudioFeatureStage, WavBackend


def _sine(freq=440.0, rate=16000, n=1600, amp=0.5):
    t = np.arange(n) / rate
    return np.clip(amp * np.sin(2 * np.pi * freq * t) * 32767, -32768, 32767
                   ).astype(np.int16)


def test_roundtrip_mono_exact():
    s = _sine()
    rate, x = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and len(x) == len(s)
    assert np.allclose(x * 32768.0, s.astype(np.float64))


def test_stereo_averages_to_mono():
    s = _sine()
    stereo = np.stack([s, s], axis=1)
    _, x_mono = decode_wav(encode_wav(s, 16000))
    _, x_st = decode_wav(encode_wav(stereo, 16000))
    assert np.allclose(x_mono, x_st)
    assert rms_e6(x_mono) == rms_e6(x_st)
    assert zero_crossings(x_mono) == zero_crossings(x_st)


def test_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"not riff at all")
    with pytest.raises(ValueError):
        decode_wav(b"")


def test_sine_zero_crossings_and_bands():
    # 440 Hz for 0.1 s → ~2·440·0.1 = 88 sign changes
    s = _sine(freq=440.0, n=1600)
    _, x = decode_wav(encode_wav(s))
    assert abs(zero_crossings(x) - 88) <= 2
    e = band_energies(x, 8)
    # 440 Hz of an 8 kHz Nyquist → bottom band dominates
    assert e.argmax() == 0 and abs(float(e.sum()) - 1.0) < 1e-6
    # RMS of a 0.5-amp sine ≈ 0.5/√2
    assert abs(rms_e6(x) - int(0.5 / np.sqrt(2) * 1e6)) < 5000


def test_audio_stage_with_wav_backend(ray_session):
    bodies = [encode_wav(_sine(freq=f, n=n))
              for f, n in [(220.0, 800), (880.0, 1600)]]
    batch = pa.table(
        {
            "doc_id": pa.array(["d1", "d2"]),
            "span_idx": pa.array([0, 0], pa.int32()),
            "media_ref": pa.array(["a.wav", "b.wav"]),
            "body": pa.array(bodies, pa.large_binary()),
        }
    )
    out = AudioFeatureStage(backend="wav")(batch)
    assert out["sample_rate"].to_pylist() == [16000, 16000]
    assert out["n_samples"].to_pylist() == [800, 1600]
    assert out["duration_ms"].to_pylist() == [50, 100]
    f = np.array(out["feature"].to_pylist())
    assert f.shape == (2, 13) and (f[:, 0] > 0).all()  # real RMS, not noise


def test_wav_backend_feature_determinism():
    b = encode_wav(_sine())
    be = WavBackend()
    assert (be.features(b) == be.features(b)).all()
