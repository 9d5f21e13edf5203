"""TextEncoder / DurationPredictor tests (reference contracts from
text_encoder.py:87-128,170-209)."""
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import DurationPredictorConfig, TextEncoderConfig
from mamba_tts_tpu.models.text_encoder import (
    DurationPredictor,
    TextEncoder,
    duration_loss,
    sinusoid_position_table,
)

CFG = TextEncoderConfig(vocab_size=79, d_model=32, n_layers=2, n_heads=2, d_k=8, d_v=8,
                        d_inner=64, dtype="float32")


def test_sinusoid_table_properties():
    t = sinusoid_position_table(10, 8)
    assert t.shape == (10, 8)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    assert np.abs(t).max() <= 1.0 + 1e-6


def test_encoder_shapes_and_mask_invariance():
    enc = TextEncoder(CFG)
    ids = jnp.array([[5, 6, 7, 8, 0, 0], [9, 10, 0, 0, 0, 0]])
    mask = ids != 0
    variables = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(variables, ids, mask)
    assert out.shape == (2, 6, CFG.d_model)

    # Changing pad-position token ids must not change valid outputs.
    ids2 = ids.at[1, 2:].set(42)
    mask2 = mask  # mask unchanged: positions still marked padding
    out2 = enc.apply(variables, ids2, mask2)
    np.testing.assert_allclose(
        np.asarray(out[1, :2]), np.asarray(out2[1, :2]), rtol=1e-5, atol=1e-5
    )
    # Padded positions are zeroed.
    np.testing.assert_allclose(np.asarray(out[1, 2:]), 0.0, atol=1e-6)


def test_encoder_dropout_rng():
    enc = TextEncoder(CFG)
    ids = jnp.ones((2, 5), jnp.int32) * 3
    variables = enc.init(jax.random.PRNGKey(0), ids)
    o1 = enc.apply(variables, ids, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = enc.apply(variables, ids, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_duration_predictor_and_loss():
    dp = DurationPredictor(DurationPredictorConfig(d_model=32, filter_size=16, dtype="float32"))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    mask = jnp.array([[True] * 6, [True] * 3 + [False] * 3])
    variables = dp.init(jax.random.PRNGKey(1), x, mask)
    log_dur = dp.apply(variables, x, mask)
    assert log_dur.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(log_dur[1, 3:]), 0.0, atol=1e-6)

    # Masked-mean MSE in log space against a closed-form numpy computation.
    target = jnp.array([[1.0, 2, 3, 4, 5, 6], [2.0, 2, 2, 9, 9, 9]])
    loss = duration_loss(log_dur, target, mask)
    ld, tg, m = map(np.asarray, (log_dur, target, mask))
    expect = (((ld - np.log(tg + 1e-8)) ** 2) * m).sum() / m.sum()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_duration_loss_no_mask():
    pred = jnp.zeros((2, 4))
    target = jnp.ones((2, 4))
    loss = duration_loss(pred, target)
    np.testing.assert_allclose(float(loss), (np.log(1 + 1e-8)) ** 2, atol=1e-9)
