"""Spectral features in pure JAX: framed STFT magnitudes and mel filterbanks.

Used by the codec reconstruction losses (multi-resolution STFT + mel L1).
Kept jit-friendly: static frame/hop sizes, rfft over framed windows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 80, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Triangular (HTK-style) mel filterbank (n_mels, n_fft // 2 + 1)."""
    fmax = fmax or sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_bins), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_magnitude(wav: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """|STFT| of (B, T) -> (B, frames, n_fft//2+1), Hann window, center-pad."""
    B, T = wav.shape
    pad = n_fft // 2
    x = jnp.pad(wav.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx]  # (B, frames, n_fft)
    window = jnp.hanning(n_fft).astype(jnp.float32)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec)


def multi_resolution_stft_loss(
    pred: jax.Array,
    target: jax.Array,
    resolutions=((512, 128), (1024, 256), (2048, 512)),
) -> jax.Array:
    """Spectral-convergence + log-magnitude L1 over several resolutions."""
    total = 0.0
    for n_fft, hop in resolutions:
        sp = stft_magnitude(pred, n_fft, hop)
        st = stft_magnitude(target, n_fft, hop)
        sc = jnp.linalg.norm(st - sp) / (jnp.linalg.norm(st) + 1e-6)
        mag = jnp.abs(jnp.log(st + 1e-5) - jnp.log(sp + 1e-5)).mean()
        total = total + sc + mag
    return total / len(resolutions)


def mel_l1_loss(
    pred: jax.Array, target: jax.Array, sr: int = 16000,
    n_fft: int = 1024, hop: int = 256, n_mels: int = 80,
) -> jax.Array:
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mp = jnp.log(stft_magnitude(pred, n_fft, hop) @ fb.T + 1e-5)
    mt = jnp.log(stft_magnitude(target, n_fft, hop) @ fb.T + 1e-5)
    return jnp.abs(mp - mt).mean()
