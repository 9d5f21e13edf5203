"""Style pipeline tests: vectorized LengthRegulator vs naive loop, pipeline
shapes (reference contracts from style_cross_attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import StylePipelineConfig
from mamba_tts_tpu.models.style import (
    StyleConditioningPipeline,
    StyleProjection,
    length_regulate,
)

CFG = StylePipelineConfig(d_style=16, d_model=32, num_heads=4, dtype="float32")


def _naive_length_regulate(hidden, durations, max_len):
    """Direct port of the reference double loop
    (reference: style_cross_attention.py:183-196) as ground truth."""
    B, T, D = hidden.shape
    dur = np.maximum(np.round(np.asarray(durations, np.float64)), 0).astype(int)
    out = np.zeros((B, max_len, D), hidden.dtype)
    lengths = dur.sum(1)
    for b in range(B):
        pos = 0
        for t in range(T):
            d = dur[b, t]
            if d > 0 and pos < max_len:
                end = min(pos + d, max_len)
                out[b, pos:end] = np.asarray(hidden[b, t])
                pos = end
            if pos >= max_len:
                break
    return out, lengths


def test_length_regulate_matches_naive():
    key = jax.random.PRNGKey(0)
    hidden = jax.random.normal(key, (3, 5, 4))
    durations = jnp.array([
        [1.0, 2.0, 0.0, 3.0, 1.0],
        [2.4, 2.6, 1.0, 0.0, 0.0],  # rounding: 2, 3, 1
        [0.0, 0.0, 0.0, 0.0, 0.0],  # empty
    ])
    max_len = 10
    exp, lens = length_regulate(hidden, durations, max_len)
    exp_np, lens_np = _naive_length_regulate(hidden, durations, max_len)
    np.testing.assert_allclose(np.asarray(exp), exp_np, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(lens), lens_np)


def test_length_regulate_truncation():
    hidden = jnp.ones((1, 3, 2)) * jnp.arange(1, 4)[None, :, None]
    durations = jnp.array([[5.0, 5.0, 5.0]])
    exp, lens = length_regulate(hidden, durations, max_len=7)
    assert int(lens[0]) == 15  # unclipped total, reference semantics
    np.testing.assert_allclose(np.asarray(exp[0, :5, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(exp[0, 5:7, 0]), 2.0)


def test_length_regulate_jits():
    f = jax.jit(length_regulate, static_argnums=2)
    hidden = jnp.ones((2, 4, 8))
    durations = jnp.full((2, 4), 2.0)
    exp, lens = f(hidden, durations, 16)
    assert exp.shape == (2, 16, 8)
    np.testing.assert_array_equal(np.asarray(lens), [8, 8])


def test_style_projection_shapes():
    sp = StyleProjection(CFG)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, CFG.d_style))
    variables = sp.init(jax.random.PRNGKey(1), z)
    K, V = sp.apply(variables, z)
    assert K.shape == (4, 1, CFG.d_model) and V.shape == (4, 1, CFG.d_model)
    assert not np.allclose(np.asarray(K), np.asarray(V))


def test_pipeline_end_to_end():
    pipe = StyleConditioningPipeline(CFG)
    B, T = 4, 20
    text_hidden = jax.random.normal(jax.random.PRNGKey(0), (B, T, CFG.d_model))
    style_emb = jax.random.normal(jax.random.PRNGKey(1), (B, CFG.d_style))
    durations = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, 5).astype(jnp.float32)
    variables = pipe.init(jax.random.PRNGKey(3), text_hidden, style_emb, durations)
    frames, lengths, K, V = pipe.apply(
        variables, text_hidden, style_emb, durations, max_frame_len=96
    )
    assert frames.shape == (B, 96, CFG.d_model)
    assert lengths.shape == (B,)
    assert K.shape == (B, 1, CFG.d_model)
    assert bool(jnp.isfinite(frames).all())


def test_pipeline_masks_durations():
    """Durations at padded text positions must not contribute frames."""
    pipe = StyleConditioningPipeline(CFG)
    B, T = 2, 6
    text_hidden = jax.random.normal(jax.random.PRNGKey(0), (B, T, CFG.d_model))
    style_emb = jax.random.normal(jax.random.PRNGKey(1), (B, CFG.d_style))
    durations = jnp.full((B, T), 2.0)
    mask = jnp.array([[True] * 6, [True] * 3 + [False] * 3])
    variables = pipe.init(jax.random.PRNGKey(3), text_hidden, style_emb, durations)
    _, lengths, _, _ = pipe.apply(
        variables, text_hidden, style_emb, durations, mask, max_frame_len=16
    )
    np.testing.assert_array_equal(np.asarray(lengths), [12, 6])
