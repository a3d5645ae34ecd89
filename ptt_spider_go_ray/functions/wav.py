"""Pure-stdlib WAV (RIFF PCM) codec — the audio analog of functions/png.py:
a REAL decode branch for AudioFeatureStage in a sandbox without soundfile.

Scope: 16-bit PCM mono/stereo via the stdlib ``wave`` module (stereo is
averaged to mono for analysis). Raises ValueError on non-WAV bytes or other
sample widths. Features are genuine DSP: RMS, zero-crossing count, and
FFT band energies over the mono signal.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 array (n,) mono or (n, 2) stereo → WAV bytes."""
    s = np.asarray(samples, np.int16)
    ch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, mono float64 signal in [-1, 1)). Stereo is
    channel-averaged; non-16-bit or non-RIFF input raises ValueError."""
    try:
        with wave.open(io.BytesIO(data or b""), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported WAV sample width {w.getsampwidth()} "
                    "(this codec handles 16-bit PCM)"
                )
            ch = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        # EOFError/RuntimeError/struct.error: the stdlib wave/chunk modules
        # leak these on truncated or bit-flipped headers (found by fuzzing)
        raise ValueError(f"not a PCM WAV: {e}") from e
    x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return rate, x


def rms_e6(x: np.ndarray) -> int:
    """Root-mean-square of the mono signal, e6 fixed point (exact int out)."""
    if not len(x):
        return 0
    return int(round(float(np.sqrt(np.mean(x * x))) * 1e6))


def zero_crossings(x: np.ndarray) -> int:
    """Count of sign changes (strict, zeros break runs) — pitch proxy."""
    s = np.sign(x)
    s = s[s != 0]
    return int(np.count_nonzero(s[1:] != s[:-1]))


def band_energies(x: np.ndarray, n_bands: int = 8) -> np.ndarray:
    """Normalized FFT band energies (float32, sums to 1 for nonzero input)."""
    if not len(x):
        return np.zeros(n_bands, np.float32)
    spec = np.abs(np.fft.rfft(x)) ** 2
    bounds = np.linspace(0, len(spec), n_bands + 1).astype(int)
    e = np.array(
        [spec[bounds[i]:bounds[i + 1]].sum() for i in range(n_bands)]
    )
    total = float(e.sum()) or 1.0
    return (e / total).astype(np.float32)
