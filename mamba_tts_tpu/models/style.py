"""Style conditioning pipeline (ControlSpeech NAR branch).

Re-designs reference: style_cross_attention.py:16-354 —
  1. :class:`StyleProjection`: z_style -> single-token K, V
  2. Cross-Attention #1: text ⊗ style (before the duration predictor)
  3. :class:`length_regulate`: phoneme-level -> frame-level upsampling
  4. Cross-Attention #2: frames ⊗ style (style K/V reused)

The reference LengthRegulator is a per-sample Python double loop
(reference: style_cross_attention.py:183-196) — a host-bound O(B*T) loop
that cannot jit.  Here it is a fully vectorized gather: output position j
belongs to the phoneme t with cumsum boundary start_t <= j < end_t, found by
a batched ``searchsorted`` over the duration cumsum — static output shape,
jit/TPU friendly (SURVEY §7 build step 4).

Mask convention: True = valid.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mamba_tts_tpu.config import StylePipelineConfig


class StyleProjection(nn.Module):
    """(B, d_style) -> single-token K, V each (B, 1, d_model)
    (reference: style_cross_attention.py:16-66)."""

    cfg: StylePipelineConfig

    @nn.compact
    def __call__(self, style_emb: jax.Array, deterministic: bool = True):
        c = self.cfg
        dt = jnp.dtype(c.dtype)

        def proj(name):
            h = nn.Dense(c.d_model, dtype=dt, name=f"{name}_dense")(style_emb)
            h = nn.LayerNorm(dtype=dt, name=f"{name}_ln")(h)
            h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
            return h[:, None, :]

        return proj("key"), proj("value")


class StyleCrossAttnBlock(nn.Module):
    """MHA(query=x, key/value=style token) + residual/LN + 4x FFN + LN.

    Shared structure of Cross-Attention #1 and #2
    (reference: style_cross_attention.py:69-141, 215-286).
    """

    cfg: StylePipelineConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        style_K: jax.Array,
        style_V: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        B, T, _ = x.shape
        H = c.num_heads
        hd = c.d_model // H

        q = nn.Dense(c.d_model, dtype=dt, name="q_proj")(x).reshape(B, T, H, hd)
        k = nn.Dense(c.d_model, dtype=dt, name="k_proj")(style_K).reshape(B, -1, H, hd)
        v = nn.Dense(c.d_model, dtype=dt, name="v_proj")(style_V).reshape(B, -1, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(hd)), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, c.d_model)
        attn = nn.Dense(c.d_model, dtype=dt, name="o_proj")(attn)
        attn = nn.Dropout(c.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dt, name="attn_ln")(x + attn)

        h = nn.Dense(4 * c.d_model, dtype=dt, name="ffn1")(x)
        h = nn.gelu(h, approximate=False)  # exact erf GELU (torch nn.GELU parity)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.d_model, dtype=dt, name="ffn2")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=dt, name="ffn_ln")(x + h)


def length_regulate(
    hidden: jax.Array,
    durations: jax.Array,
    max_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Expand phoneme-level features to frame-level by repeating each phoneme
    ``round(duration)`` times (reference: style_cross_attention.py:156-198),
    vectorized as a cumsum + searchsorted gather.

    Args:
        hidden:    (B, T, D) phoneme-level features.
        durations: (B, T) predicted durations in frames (float or int).
        max_len:   static output length (required for jit; frames beyond a
                   sample's total duration are zero-padded).

    Returns:
        expanded:       (B, max_len, D)
        output_lengths: (B,) total frames per sample (clipped to max_len in
                        the expansion but reported unclipped, matching the
                        reference's semantics).
    """
    dur = jnp.maximum(jnp.round(durations.astype(jnp.float32)), 0.0).astype(jnp.int32)
    ends = jnp.cumsum(dur, axis=1)  # (B, T)
    output_lengths = ends[:, -1]

    positions = jnp.arange(max_len, dtype=jnp.int32)  # (max_len,)
    # phoneme index owning each output frame: first t with end_t > j
    idx = jax.vmap(lambda e: jnp.searchsorted(e, positions, side="right"))(ends)
    idx = jnp.minimum(idx, hidden.shape[1] - 1)
    expanded = jnp.take_along_axis(hidden, idx[..., None], axis=1)
    valid = positions[None, :] < output_lengths[:, None]
    expanded = expanded * valid[..., None].astype(expanded.dtype)
    return expanded, output_lengths


class StyleConditioningPipeline(nn.Module):
    """Full pipeline: project -> CA#1 -> length-regulate -> CA#2
    (reference: style_cross_attention.py:289-354).

    Returns (styled_frames, output_lengths, style_K, style_V).
    """

    cfg: StylePipelineConfig

    def setup(self):
        self.style_proj = StyleProjection(self.cfg, name="style_proj")
        self.cross_attn_1 = StyleCrossAttnBlock(self.cfg, name="cross_attn_1")
        self.cross_attn_2 = StyleCrossAttnBlock(self.cfg, name="cross_attn_2")

    def __call__(
        self,
        text_hidden: jax.Array,
        style_emb: jax.Array,
        durations: jax.Array,
        text_mask: Optional[jax.Array] = None,
        max_frame_len: int = 1024,
        deterministic: bool = True,
    ):
        style_K, style_V = self.style_proj(style_emb, deterministic=deterministic)
        styled_text = self.cross_attn_1(text_hidden, style_K, style_V, deterministic)
        if text_mask is not None:
            durations = durations * text_mask.astype(durations.dtype)
        upsampled, output_lengths = length_regulate(styled_text, durations, max_frame_len)
        styled_frames = self.cross_attn_2(upsampled, style_K, style_V, deterministic)
        return styled_frames, output_lengths, style_K, style_V

    def forward_with_target(
        self,
        text_hidden: jax.Array,
        style_emb: jax.Array,
        target_durations: jax.Array,
        text_mask: Optional[jax.Array] = None,
        max_frame_len: int = 1024,
    ):
        """Training mode with ground-truth (e.g. MFA) durations
        (reference: style_cross_attention.py:200-212)."""
        return self(text_hidden, style_emb, target_durations, text_mask, max_frame_len)
