"""MambaBlock contract tests: (y, state) = mamba(x[, state]) and
step-vs-forward parity (SURVEY §4c at block level)."""
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import MambaConfig
from mamba_tts_tpu.models.mamba import MambaBlock, init_mamba_state

CFG = MambaConfig(d_model=32, d_state=4, d_conv=4, expand=2)


def _block(dtype=jnp.float32):
    m = MambaBlock(CFG, dtype=dtype, scan_chunk=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, CFG.d_model), dtype)
    variables = m.init(jax.random.PRNGKey(1), x)
    return m, variables, x


def test_forward_shapes_and_contract():
    m, variables, x = _block()
    y, state = m.apply(variables, x)
    assert y.shape == x.shape
    assert state.conv.shape == (2, CFG.d_conv - 1, CFG.d_inner)
    assert state.ssm.shape == (2, CFG.d_state, CFG.d_inner)
    assert bool(jnp.isfinite(y).all())


def test_forward_with_state_continuation():
    m, variables, x = _block()
    y_full, s_full = m.apply(variables, x)
    y1, s1 = m.apply(variables, x[:, :10])
    y2, s2 = m.apply(variables, x[:, 10:], s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(s2.ssm), np.asarray(s_full.ssm), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.conv), np.asarray(s_full.conv), rtol=1e-6, atol=1e-6)


def test_step_matches_forward():
    """Token-by-token .step reproduces the full-sequence forward — the
    single most valuable invariant of the architecture (SURVEY §4c)."""
    m, variables, x = _block()
    y_full, s_full = m.apply(variables, x)

    state = init_mamba_state(CFG, batch=2, dtype=jnp.float32)
    ys = []
    for t in range(x.shape[1]):
        y_t, state = m.apply(variables, x[:, t : t + 1], state, method=MambaBlock.step)
        ys.append(y_t)
    y_step = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state.ssm), np.asarray(s_full.ssm), rtol=2e-4, atol=2e-4)


def test_causality():
    """Output at position t must not depend on inputs after t."""
    m, variables, x = _block()
    y1, _ = m.apply(variables, x)
    x2 = x.at[:, 12:].set(jax.random.normal(jax.random.PRNGKey(7), x[:, 12:].shape))
    y2, _ = m.apply(variables, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, :12]), np.asarray(y2[:, :12]), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(y1[:, 12:]), np.asarray(y2[:, 12:]))


def test_bf16_forward():
    m, variables, x = _block(dtype=jnp.bfloat16)
    y, state = m.apply(variables, x)
    assert y.dtype == jnp.bfloat16
    assert state.ssm.dtype == jnp.float32
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
