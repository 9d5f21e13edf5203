"""Pallas selective-scan kernel parity tests (interpret mode on CPU; the
same kernel code compiles on TPU — SURVEY §4b numerical parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tts_tpu.ops.pallas_scan import selective_scan_pallas
from mamba_tts_tpu.ops.selective_scan import selective_scan_chunked, selective_scan_ref


def _inputs(key, Bz=2, T=37, D=24, N=8, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (Bz, T, D), dtype)
    delta = jax.nn.softplus(jax.random.normal(ks[1], (Bz, T, D), dtype) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32))
    B = jax.random.normal(ks[3], (Bz, T, N), dtype)
    C = jax.random.normal(ks[4], (Bz, T, N), dtype)
    Dsk = jax.random.normal(ks[5], (D,), jnp.float32)
    return u, delta, A, B, C, Dsk


@pytest.mark.parametrize("T,chunk", [(37, 8), (64, 16), (130, 32)])
def test_pallas_matches_ref(T, chunk):
    args = _inputs(jax.random.PRNGKey(0), T=T)
    y_ref, h_ref = selective_scan_ref(*args)
    y_p, h_p = selective_scan_pallas(*args, chunk=chunk)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_pallas_with_initial_state():
    args = _inputs(jax.random.PRNGKey(1), T=48)
    h0 = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 24))
    y_ref, h_ref = selective_scan_ref(*args, h0=h0)
    y_p, h_p = selective_scan_pallas(*args, h0=h0, chunk=16)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_pallas_gradients_match_chunked():
    """Custom VJP: grads through the Pallas path equal grads through the
    XLA chunked path for every input."""
    args = _inputs(jax.random.PRNGKey(2), T=32, D=16, N=4)

    def loss_pallas(*a):
        y, h = selective_scan_pallas(*a, chunk=8)
        return (y.astype(jnp.float32) ** 2).sum() + (h**2).sum()

    def loss_chunked(*a):
        y, h = selective_scan_chunked(*a, chunk=8)
        return (y.astype(jnp.float32) ** 2).sum() + (h**2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_c = jax.grad(loss_chunked, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for gp, gc, name in zip(g_p, g_c, "u delta A B C D".split()):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gc), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_pallas_bf16():
    args = _inputs(jax.random.PRNGKey(3), T=40, dtype=jnp.bfloat16)
    y_p, h_p = selective_scan_pallas(*args, chunk=8)
    assert y_p.dtype == jnp.bfloat16
    assert h_p.dtype == jnp.float32
    y_ref, _ = selective_scan_ref(
        *(a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a for a in args)
    )
    np.testing.assert_allclose(
        np.asarray(y_p, np.float32), np.asarray(y_ref), rtol=5e-2, atol=5e-2
    )


def test_pallas_gradients_ragged_T_and_h0():
    """Backward with T not divisible by chunk AND a nonzero initial state:
    grads (incl. dh0) match the chunked path."""
    args = _inputs(jax.random.PRNGKey(7), T=21, D=16, N=4)
    h0 = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 16))

    def loss_p(h0, *a):
        y, h = selective_scan_pallas(*a, h0=h0, chunk=8)
        return (y.astype(jnp.float32) ** 2).sum() + (h**2).sum()

    def loss_c(h0, *a):
        y, h = selective_scan_chunked(*a, h0=h0, chunk=8)
        return (y.astype(jnp.float32) ** 2).sum() + (h**2).sum()

    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(h0, *args)
    g_c = jax.grad(loss_c, argnums=(0, 1, 2, 3))(h0, *args)
    for gp, gc, name in zip(g_p, g_c, "h0 u delta A".split()):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gc), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_pallas_grad_from_final_state_only():
    """Cotangent flowing only through h_final (y unused) is handled."""
    args = _inputs(jax.random.PRNGKey(9), T=16, D=16, N=4)

    def loss_p(*a):
        _, h = selective_scan_pallas(*a, chunk=8)
        return (h**2).sum()

    def loss_c(*a):
        _, h = selective_scan_chunked(*a, chunk=8)
        return (h**2).sum()

    g_p = jax.grad(loss_p, argnums=(0, 1))(*args)
    g_c = jax.grad(loss_c, argnums=(0, 1))(*args)
    for gp, gc in zip(g_p, g_c):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gc), rtol=2e-3, atol=2e-3)


def test_pallas_T_smaller_than_chunk():
    args = _inputs(jax.random.PRNGKey(10), T=5)
    y_ref, h_ref = selective_scan_ref(*args)
    y_p, h_p = selective_scan_pallas(*args, chunk=16)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_mamba_block_pallas_flag_runs():
    """MambaBlock(use_pallas=True) falls back to the XLA path off-TPU and
    still produces identical results to use_pallas=False."""
    from mamba_tts_tpu.config import MambaConfig
    from mamba_tts_tpu.models.mamba import MambaBlock

    cfg = MambaConfig(d_model=16, d_state=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    m1 = MambaBlock(cfg, dtype=jnp.float32, scan_chunk=8, use_pallas=True)
    m2 = MambaBlock(cfg, dtype=jnp.float32, scan_chunk=8, use_pallas=False)
    v = m1.init(jax.random.PRNGKey(1), x)
    y1, _ = m1.apply(v, x)
    y2, _ = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)
