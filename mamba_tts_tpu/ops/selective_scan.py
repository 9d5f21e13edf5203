"""Selective-scan (Mamba SSM) kernel pair for TPU.

Implements the input-dependent linear recurrence at the heart of the Mamba
block (the role played by the ``selective_scan_cuda`` CUDA kernel inside the
``mamba-ssm`` package the reference imports — reference: mamba_decoder.py:4,29):

    h_t = exp(delta_t * A) * h_{t-1} + (delta_t * u_t) * B_t
    y_t = <C_t, h_t> + D * u_t

Three TPU-native implementations sharing one state layout:

- :func:`selective_scan_ref`     — exact ``lax.scan`` over time. Ground truth
  for parity tests; also usable for short sequences.
- :func:`selective_scan_chunked` — ``lax.scan`` over time-chunks with a
  parallel ``lax.associative_scan`` inside each chunk.  This is the training
  path: it bounds the materialized state tensor to (B, chunk, N, D) instead
  of (B, T, N, D), keeping HBM traffic flat while exposing chunk-level
  parallelism to the VPU.
- :func:`selective_scan_step`    — O(1)-state single-token recurrence used by
  the autoregressive decode loop.

Layout note (TPU): all (…, N, D) intermediates keep the model/channel axis D
last so it maps onto the 128-wide lane dimension; the small SSM state axis
N (=16) rides the sublane dimension.  Accumulation is float32 regardless of
input dtype.

State layout: ``h`` has shape (B, N, D) float32.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _prep(u, delta, A, B, C, D):
    """Cast to f32 and transpose A to the internal (N, D) layout."""
    f32 = jnp.float32
    return (
        u.astype(f32),
        delta.astype(f32),
        A.astype(f32).T,  # (N, D)
        B.astype(f32),
        C.astype(f32),
        D.astype(f32),
    )


def selective_scan_ref(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    h0: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact sequential reference scan.

    Args:
        u:     (Bz, T, D) input sequence (post conv/SiLU).
        delta: (Bz, T, D) positive step sizes (post softplus).
        A:     (D, N) negative real state matrix.
        B:     (Bz, T, N) input projection.
        C:     (Bz, T, N) output projection.
        D:     (D,) skip gain.
        h0:    optional (Bz, N, D) initial state.

    Returns:
        y:   (Bz, T, D) output, dtype of ``u``.
        h_T: (Bz, N, D) final state, float32.
    """
    out_dtype = u.dtype
    u, delta, A_nd, B, C, D = _prep(u, delta, A, B, C, D)
    Bz, T, Dm = u.shape
    N = A_nd.shape[0]
    h = jnp.zeros((Bz, N, Dm), jnp.float32) if h0 is None else h0.astype(jnp.float32)

    def step(h, inp):
        u_t, d_t, B_t, C_t = inp  # (Bz,D) (Bz,D) (Bz,N) (Bz,N)
        a = jnp.exp(d_t[:, None, :] * A_nd[None])  # (Bz, N, D)
        b = (d_t * u_t)[:, None, :] * B_t[:, :, None]  # (Bz, N, D)
        h = a * h + b
        y = jnp.einsum("bnd,bn->bd", h, C_t)
        return h, y

    xs = (
        jnp.moveaxis(u, 1, 0),
        jnp.moveaxis(delta, 1, 0),
        jnp.moveaxis(B, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    h, ys = jax.lax.scan(step, h, xs)
    y = jnp.moveaxis(ys, 0, 1) + u * D[None, None, :]
    return y.astype(out_dtype), h


def _assoc_combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


@partial(jax.jit, static_argnames=("chunk",))
def selective_scan_chunked(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    h0: Optional[jax.Array] = None,
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked parallel scan: sequential over chunks, associative within.

    Semantics identical to :func:`selective_scan_ref`. T is padded up to a
    multiple of ``chunk`` with delta=0 steps (identity state transitions).
    """
    out_dtype = u.dtype
    u, delta, A_nd, B, C, D = _prep(u, delta, A, B, C, D)
    Bz, T, Dm = u.shape
    N = A_nd.shape[0]

    Tp = -(-T // chunk) * chunk
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        u_p = jnp.pad(u, pad)
        delta_p = jnp.pad(delta, pad)
        B_p = jnp.pad(B, ((0, 0), (0, Tp - T), (0, 0)))
        C_p = jnp.pad(C, ((0, 0), (0, Tp - T), (0, 0)))
    else:
        u_p, delta_p, B_p, C_p = u, delta, B, C
    nc = Tp // chunk

    # (nc, Bz, L, ...) so lax.scan iterates chunks.
    u_c = u_p.reshape(Bz, nc, chunk, Dm).swapaxes(0, 1)
    d_c = delta_p.reshape(Bz, nc, chunk, Dm).swapaxes(0, 1)
    B_c = B_p.reshape(Bz, nc, chunk, N).swapaxes(0, 1)
    C_c = C_p.reshape(Bz, nc, chunk, N).swapaxes(0, 1)

    h_init = jnp.zeros((Bz, N, Dm), jnp.float32) if h0 is None else h0.astype(jnp.float32)

    def chunk_step(h, inp):
        u_t, d_t, B_t, C_t = inp  # (Bz,L,D) (Bz,L,D) (Bz,L,N) (Bz,L,N)
        # Elementwise transition / input terms in (Bz, L, N, D) layout.
        a = jnp.exp(d_t[:, :, None, :] * A_nd[None, None])  # decay in (0, 1]
        b = (d_t * u_t)[:, :, None, :] * B_t[:, :, :, None]
        cum_a, cum_b = jax.lax.associative_scan(_assoc_combine, (a, b), axis=1)
        h_t = cum_a * h[:, None] + cum_b  # (Bz, L, N, D)
        y = jnp.einsum("blnd,bln->bld", h_t, C_t)
        return h_t[:, -1], y

    h_final, ys = jax.lax.scan(chunk_step, h_init, (u_c, d_c, B_c, C_c))
    y = ys.swapaxes(0, 1).reshape(Bz, Tp, Dm)[:, :T]
    y = y + u * D[None, None, :]
    return y.astype(out_dtype), h_final


def selective_scan_step(
    u_t: jax.Array,
    delta_t: jax.Array,
    A: jax.Array,
    B_t: jax.Array,
    C_t: jax.Array,
    D: jax.Array,
    h: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Single recurrence step for autoregressive decoding.

    Args:
        u_t:     (Bz, D)
        delta_t: (Bz, D)
        A:       (D, N)
        B_t:     (Bz, N)
        C_t:     (Bz, N)
        D:       (D,)
        h:       (Bz, N, D) carried state (float32).

    Returns:
        y_t:   (Bz, D), dtype of ``u_t``.
        h_new: (Bz, N, D) float32.
    """
    out_dtype = u_t.dtype
    f32 = jnp.float32
    u32, d32 = u_t.astype(f32), delta_t.astype(f32)
    A_nd = A.astype(f32).T  # (N, D)
    a = jnp.exp(d32[:, None, :] * A_nd[None])
    b = (d32 * u32)[:, None, :] * B_t.astype(f32)[:, :, None]
    h_new = a * h.astype(f32) + b
    y = jnp.einsum("bnd,bn->bd", h_new, C_t.astype(f32)) + u32 * D.astype(f32)[None]
    return y.astype(out_dtype), h_new


def selective_scan(
    u, delta, A, B, C, D, h0=None, chunk: int = 64, use_pallas: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Dispatching entry point used by the Mamba block.

    ``use_pallas`` selects the fused Pallas TPU kernel; the selection is made
    per *lowering platform* (``lax.platform_dependent``), so one jitted graph
    runs the Pallas kernel on TPU devices and the chunked XLA scan on CPU
    meshes (e.g. the virtual 8-device mesh used by the multi-chip dryrun) —
    ``jax.default_backend()`` alone is wrong when the default backend is TPU
    but the computation is placed on CPU devices.
    """
    if use_pallas:
        from mamba_tts_tpu.ops.pallas_scan import selective_scan_pallas

        def _pallas(u, delta, A, B, C, D):
            return selective_scan_pallas(u, delta, A, B, C, D, h0=h0, chunk=chunk)

        def _xla(u, delta, A, B, C, D):
            return selective_scan_chunked(u, delta, A, B, C, D, h0=h0, chunk=chunk)

        return jax.lax.platform_dependent(
            u, delta, A, B, C, D, tpu=_pallas, default=_xla
        )
    return selective_scan_chunked(u, delta, A, B, C, D, h0=h0, chunk=chunk)
