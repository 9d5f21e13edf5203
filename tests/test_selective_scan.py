"""Numerical parity tests for the selective-scan kernel pair (SURVEY §4b)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tts_tpu.ops import (
    selective_scan_chunked,
    selective_scan_ref,
    selective_scan_step,
)


def _random_inputs(key, Bz=2, T=37, D=24, N=8, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    u = jax.random.normal(ks[0], (Bz, T, D), dtype)
    delta = jax.nn.softplus(jax.random.normal(ks[1], (Bz, T, D), dtype) - 1.0)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N), jnp.float32))
    B = jax.random.normal(ks[3], (Bz, T, N), dtype)
    C = jax.random.normal(ks[4], (Bz, T, N), dtype)
    Dskip = jax.random.normal(ks[5], (D,), jnp.float32)
    return u, delta, A, B, C, Dskip


def test_ref_matches_numpy():
    """The lax.scan reference matches a plain numpy loop implementing the
    documented recurrence h_t = exp(dA)h + (d u)B, y = <C,h> + D u."""
    u, delta, A, B, C, Dskip = _random_inputs(jax.random.PRNGKey(0), Bz=1, T=11, D=5, N=3)
    y, hT = selective_scan_ref(u, delta, A, B, C, Dskip)

    un, dn, An, Bn, Cn, Dn = map(np.asarray, (u, delta, A, B, C, Dskip))
    Bz, T, D = un.shape
    N = An.shape[1]
    h = np.zeros((Bz, D, N))
    ys = np.zeros((Bz, T, D))
    for t in range(T):
        a = np.exp(dn[:, t, :, None] * An[None])  # (Bz, D, N)
        b = (dn[:, t] * un[:, t])[:, :, None] * Bn[:, t][:, None, :]
        h = a * h + b
        ys[:, t] = (h * Cn[:, t][:, None, :]).sum(-1) + Dn * un[:, t]
    np.testing.assert_allclose(np.asarray(y), ys, rtol=1e-5, atol=1e-5)
    # hT is in (Bz, N, D) layout
    np.testing.assert_allclose(np.asarray(hT), h.transpose(0, 2, 1), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [8, 16, 64])
@pytest.mark.parametrize("T", [7, 37, 64, 130])
def test_chunked_matches_ref(chunk, T):
    u, delta, A, B, C, Dskip = _random_inputs(jax.random.PRNGKey(1), T=T)
    y_ref, h_ref = selective_scan_ref(u, delta, A, B, C, Dskip)
    y_chk, h_chk = selective_scan_chunked(u, delta, A, B, C, Dskip, chunk=chunk)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_chk), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_chunked_with_initial_state():
    key = jax.random.PRNGKey(2)
    u, delta, A, B, C, Dskip = _random_inputs(key, T=48)
    h0 = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 24))
    y_ref, h_ref = selective_scan_ref(u, delta, A, B, C, Dskip, h0=h0)
    y_chk, h_chk = selective_scan_chunked(u, delta, A, B, C, Dskip, h0=h0, chunk=16)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_chk), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_step_matches_prefix():
    """Stepping token-by-token reproduces the full-sequence scan — the
    decode_step-vs-forward invariant at the kernel level (SURVEY §4c)."""
    u, delta, A, B, C, Dskip = _random_inputs(jax.random.PRNGKey(3), T=21)
    y_ref, h_ref = selective_scan_ref(u, delta, A, B, C, Dskip)

    Bz, T, D = u.shape
    N = A.shape[1]
    h = jnp.zeros((Bz, N, D))
    ys = []
    for t in range(T):
        y_t, h = selective_scan_step(u[:, t], delta[:, t], A, B[:, t], C[:, t], Dskip, h)
        ys.append(y_t)
    y_step = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


def test_state_continuation():
    """Scanning [first half] then [second half with carried state] equals one scan."""
    u, delta, A, B, C, Dskip = _random_inputs(jax.random.PRNGKey(4), T=40)
    y_full, h_full = selective_scan_ref(u, delta, A, B, C, Dskip)
    y1, h1 = selective_scan_chunked(
        u[:, :20], delta[:, :20], A, B[:, :20], C[:, :20], Dskip, chunk=8
    )
    y2, h2 = selective_scan_chunked(
        u[:, 20:], delta[:, 20:], A, B[:, 20:], C[:, 20:], Dskip, h0=h1, chunk=8
    )
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)), np.asarray(y_full), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full), rtol=2e-4, atol=2e-4)


def test_bf16_inputs_f32_accumulation():
    u, delta, A, B, C, Dskip = _random_inputs(jax.random.PRNGKey(5), T=32, dtype=jnp.bfloat16)
    y, h = selective_scan_chunked(u, delta, A, B, C, Dskip, chunk=16)
    assert y.dtype == jnp.bfloat16
    assert h.dtype == jnp.float32
    y32, _ = selective_scan_ref(
        u.astype(jnp.float32), delta.astype(jnp.float32), A, B.astype(jnp.float32),
        C.astype(jnp.float32), Dskip,
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y32), rtol=5e-2, atol=5e-2
    )
