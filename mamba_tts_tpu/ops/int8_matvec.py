"""Int8 weight-streaming matvec Pallas kernel (decode hot path).

Autoregressive decode at small batch is HBM-bandwidth-bound: every step
re-reads every weight matrix to multiply a (B<=16, K) activation.  bf16
weights put the flagship at ~86% of v5e HBM peak (bench.py roofline) — the
only way past that wall is FEWER BYTES.  This kernel streams weights as int8
(+ per-output-channel f32 scales), dequantizes in VMEM, and hits the MXU in
bfloat16 — halving the dominant traffic term.

Measured (see benchmarks/int8_bench.py): plain-XLA int8 matvecs are NOT
faster (the dequant breaks XLA's weight-streaming fusion and round-trips a
f32 copy through HBM); the fused Pallas version is, which is why this kernel
exists (DESIGN.md "future work" item, now present).

Weight layout: (K, N) int8, scale (N,) f32 with w ~= w_q * scale[None, :]
(symmetric per-out-channel).  ``quantize_weight`` produces the pair.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K, N) float -> ((K, N) int8, (N,) f32 scale), symmetric per column."""
    w = w.astype(jnp.float32)
    amax = jnp.abs(w).max(axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return w_q, scale


def _matvec_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:].astype(jnp.bfloat16)
    w = w_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 dequant (unit scale)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_n", "out_dtype"))
def int8_matvec(
    x: jax.Array,
    w_q: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
):
    """y = (x @ (w_q * scale)) [+ bias].

    x: (B, K) bf16/f32; w_q: (K, N) int8; scale: (N,) f32.
    The full K (contraction) axis stays in one block; the grid tiles N so
    weight streaming overlaps the MXU.  Returns (B, N) in ``out_dtype``.
    """
    B, K = x.shape
    K2, N = w_q.shape
    assert K == K2, (x.shape, w_q.shape)
    bn = min(block_n, N)
    grid = (pl.cdiv(N, bn),)

    def _pallas(x, w_q, scale):
        return pl.pallas_call(
            _matvec_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0)),
                pl.BlockSpec((K, bn), lambda i: (0, i)),
                pl.BlockSpec((1, bn), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((B, bn), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((B, N), out_dtype),
        )(x, w_q, scale[None, :])

    def _ref(x, w_q, scale):
        return int8_matvec_ref(x, w_q, scale, out_dtype=out_dtype)

    # Pallas on TPU; jnp reference on CPU meshes (per lowering platform).
    y = jax.lax.platform_dependent(x, w_q, scale, tpu=_pallas, default=_ref)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def int8_matvec_ref(x, w_q, scale, bias=None, out_dtype=jnp.bfloat16):
    """Pure-jnp reference (and the measured-slower XLA fallback)."""
    w = w_q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)
    y = (x.astype(jnp.float32) @ w).astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
