"""FFT-block text encoder + duration predictor (FastSpeech2 lineage).

Re-designs the reference's vendored-FastSpeech2 usage (reference:
text_encoder.py:21-209, which imports FFTBlock / VariancePredictor /
get_sinusoid_encoding_table from lib/FastSpeech2) as native Flax modules:

- :class:`TextEncoder`: phoneme embedding (pad row forced to zero) + fixed
  sinusoidal positional table + N x FFTBlock (post-LN self-attention with
  explicit d_k/d_v head dims + conv1d position-wise FFN with kernel (9, 1)),
  masking padded positions after every block.
- :class:`DurationPredictor`: conv1d x2 + LN + dropout + linear predicting
  LOG durations per phoneme; MSE loss in log space with target
  log(dur + 1e-8) and masked mean (reference: text_encoder.py:183-209).

Mask convention: ``mask`` is True for VALID tokens (the reference's text
stack uses True=pad — reference: text_encoder.py:93 — we standardize on
True=valid framework-wide and adapt at the data boundary).

The inference-time overflow path (sequences longer than ``max_seq_len``
recompute a longer sinusoid table — reference: text_encoder.py:107-112) is
unnecessary here: the table is a trace-time constant sized to the actual
input length, so any static length just works.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import DurationPredictorConfig, TextEncoderConfig


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sinusoidal positional encodings (FS2 semantics: sin on even
    channels, cos on odd, angle = pos / 10000^(2*(i//2)/d))."""
    pos = np.arange(n_position)[:, None].astype(np.float64)
    i = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class _SelfAttention(nn.Module):
    """Post-LN multi-head self-attention with explicit d_k/d_v (FS2-style)."""

    d_model: int
    n_heads: int
    d_k: int
    d_v: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jax.Array],
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        B, T, _ = x.shape
        H, dk, dv = self.n_heads, self.d_k, self.d_v
        q = nn.Dense(H * dk, dtype=self.dtype, name="w_q")(x).reshape(B, T, H, dk)
        k = nn.Dense(H * dk, dtype=self.dtype, name="w_k")(x).reshape(B, T, H, dk)
        v = nn.Dense(H * dv, dtype=self.dtype, name="w_v")(x).reshape(B, T, H, dv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(dk, jnp.float32))
        if mask is not None:
            logits = logits + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * dv)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="w_o")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=self.dtype)(out + x)
        return out, (probs if return_attns else None)


class FFTBlock(nn.Module):
    """Self-attention + conv1d position-wise FFN, both post-LN residual."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(
        self,
        x,
        mask: Optional[jax.Array],
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        x, attn = _SelfAttention(
            c.d_model, c.n_heads, c.d_k, c.d_v, c.dropout, dt, name="attn"
        )(x, mask, deterministic, return_attns)
        if mask is not None:
            x = x * mask[..., None]
        res = x
        h = nn.Conv(c.d_inner, (c.conv_kernel[0],), padding="SAME", dtype=dt, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(c.d_model, (c.conv_kernel[1],), padding="SAME", dtype=dt, name="conv2")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dt)(h + res)
        if mask is not None:
            x = x * mask[..., None]
        return (x, attn) if return_attns else x


class TextEncoder(nn.Module):
    """Phoneme-sequence encoder. (B, T) ids -> (B, T, d_model)."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(
        self,
        phoneme_ids: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_attns: bool = False,
    ):
        """(B, T) ids -> (B, T, d_model); with ``return_attns`` also the
        per-layer self-attention maps (reference: text_encoder.py:87-128)."""
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        emb = nn.Embed(c.vocab_size, c.d_model, dtype=dt, name="phoneme_emb")(phoneme_ids)
        # Pad embeddings are exactly zero (torch padding_idx semantics).
        emb = emb * (phoneme_ids != c.padding_idx)[..., None].astype(emb.dtype)
        T = phoneme_ids.shape[1]
        pos = jnp.asarray(sinusoid_position_table(T, c.d_model), dt)
        x = emb + pos[None]
        attns = []
        for i in range(c.n_layers):
            if return_attns:
                x, attn = FFTBlock(c, name=f"fft_{i}")(x, mask, deterministic, True)
                attns.append(attn)
            else:
                x = FFTBlock(c, name=f"fft_{i}")(x, mask, deterministic)
        if return_attns:
            return x, attns
        return x


class DurationPredictor(nn.Module):
    """Predict log-durations per phoneme. (B, T, d) -> (B, T)."""

    cfg: DurationPredictorConfig

    @nn.compact
    def __call__(
        self,
        encoder_output: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        h = nn.Conv(c.filter_size, (c.kernel_size,), padding="SAME", dtype=dt, name="conv1")(
            encoder_output
        )
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=dt)(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Conv(c.filter_size, (c.kernel_size,), padding="SAME", dtype=dt, name="conv2")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=dt)(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        log_dur = nn.Dense(1, dtype=jnp.float32, name="linear")(h)[..., 0]
        if mask is not None:
            log_dur = log_dur * mask.astype(log_dur.dtype)
        return log_dur


def duration_loss(
    log_duration_pred: jax.Array,
    duration_target: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """MSE in log space, masked mean over valid positions
    (reference: text_encoder.py:183-209; mask here is True=valid)."""
    log_target = jnp.log(duration_target.astype(jnp.float32) + 1e-8)
    err = (log_duration_pred.astype(jnp.float32) - log_target) ** 2
    if mask is not None:
        m = mask.astype(jnp.float32)
        return (err * m).sum() / jnp.maximum(m.sum(), 1.0)
    return err.mean()
