"""Pallas TPU kernel: fused chunked selective scan (training path).

Why a kernel at all: the pure-XLA chunked scan (ops/selective_scan.py)
round-trips the (B, L, N, D) transition/input tensors through HBM once per
log-step of the associative scan — ~log2(L) x 2 full passes over a tensor
N x larger than the activations.  This kernel keeps the entire per-chunk
scan state in VMEM: HBM traffic drops to exactly one read of (u, delta, B,
C) and one write of y, independent of chunk size.

Layout / schedule:
- grid = (batch, D/block_d, T/chunk); the time-chunk axis iterates fastest
  and sequentially (TPU grid order), so the carried SSM state lives in a
  persistent VMEM scratch across chunk steps — the chunk-boundary state
  handoff of SURVEY §7 "hard part 1".
- per grid cell the kernel materializes a = exp(dt*A), b = dt*u*B as
  (chunk, N, block_d) f32 in VMEM, runs a Hillis-Steele inclusive scan over
  the chunk axis (log2(chunk) fused VPU steps), applies the carried state,
  contracts with C, and adds the D skip.
- last two dims (N, block_d) ride (sublane, lane); f32 accumulation
  regardless of input dtype.

Same contract as selective_scan_chunked: (y, h_final) with h (B, N, D) f32.
Falls back to interpret mode off-TPU so CPU tests exercise identical code.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(u_ref, d_ref, B_ref, C_ref, A_ref, Dskip_ref, h0_ref,
                 y_ref, hout_ref, h_scratch):
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    u = u_ref[0].astype(jnp.float32)  # (L, BD)
    dt = d_ref[0].astype(jnp.float32)  # (L, BD)
    Bm = B_ref[0].astype(jnp.float32)  # (L, N)
    Cm = C_ref[0].astype(jnp.float32)  # (L, N)
    A = A_ref[...].astype(jnp.float32)  # (N, BD)

    a = jnp.exp(dt[:, None, :] * A[None])  # (L, N, BD), decay in (0, 1]
    b = (dt * u)[:, None, :] * Bm[:, :, None]  # (L, N, BD)

    # Hillis-Steele inclusive scan of the affine recurrence along the chunk.
    L = a.shape[0]
    off = 1
    while off < L:
        pad_a = jnp.ones((off,) + a.shape[1:], a.dtype)
        pad_b = jnp.zeros((off,) + b.shape[1:], b.dtype)
        a_prev = jnp.concatenate([pad_a, a[:-off]], axis=0)
        b_prev = jnp.concatenate([pad_b, b[:-off]], axis=0)
        b = a * b_prev + b
        a = a * a_prev
        off *= 2

    h = a * h_scratch[...][None] + b  # (L, N, BD)
    y = (h * Cm[:, :, None]).sum(axis=1)  # (L, BD)
    y_ref[0] = (y + u * Dskip_ref[...]).astype(y_ref.dtype)
    h_scratch[:] = jax.lax.slice_in_dim(h, L - 1, L, axis=0)[0]

    @pl.when(c == nc - 1)
    def _():
        hout_ref[0] = h_scratch[...]


@functools.partial(jax.jit, static_argnames=("chunk", "block_d", "interpret"))
def _scan_pallas(u, delta, A_nd, B, C, Dskip, h0, chunk, block_d, interpret):
    Bz, T, Dm = u.shape
    N = A_nd.shape[0]
    nc = T // chunk
    ndb = Dm // block_d

    grid = (Bz, ndb, nc)
    out_dtype = u.dtype

    y, h_final = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),  # u
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, c, 0),
                         memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, c, 0),
                         memory_space=pltpu.VMEM),  # C
            pl.BlockSpec((N, block_d), lambda b, j, c: (0, j),
                         memory_space=pltpu.VMEM),  # A^T
            pl.BlockSpec((1, block_d), lambda b, j, c: (0, j),
                         memory_space=pltpu.VMEM),  # D skip
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),  # h0
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),  # y
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),  # h_final
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bz, T, Dm), out_dtype),
            jax.ShapeDtypeStruct((Bz, N, Dm), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, block_d), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, A_nd, Dskip, h0)
    return y, h_final


def _scan_kernel_ckpt(u_ref, d_ref, B_ref, C_ref, A_ref, Dskip_ref, h0_ref,
                      y_ref, hout_ref, ckpt_ref, h_scratch):
    """Forward kernel that also records the chunk-START state (the
    rematerialization checkpoint the backward kernel scans from)."""
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    ckpt_ref[0, 0] = h_scratch[...]

    u = u_ref[0].astype(jnp.float32)
    dt = d_ref[0].astype(jnp.float32)
    Bm = B_ref[0].astype(jnp.float32)
    Cm = C_ref[0].astype(jnp.float32)
    A = A_ref[...].astype(jnp.float32)

    a = jnp.exp(dt[:, None, :] * A[None])
    b = (dt * u)[:, None, :] * Bm[:, :, None]
    L = a.shape[0]
    off = 1
    while off < L:
        pad_a = jnp.ones((off,) + a.shape[1:], a.dtype)
        pad_b = jnp.zeros((off,) + b.shape[1:], b.dtype)
        b = a * jnp.concatenate([pad_b, b[:-off]], axis=0) + b
        a = a * jnp.concatenate([pad_a, a[:-off]], axis=0)
        off *= 2
    h = a * h_scratch[...][None] + b
    y = (h * Cm[:, :, None]).sum(axis=1)
    y_ref[0] = (y + u * Dskip_ref[...]).astype(y_ref.dtype)
    h_scratch[:] = jax.lax.slice_in_dim(h, L - 1, L, axis=0)[0]

    @pl.when(c == nc - 1)
    def _():
        hout_ref[0] = h_scratch[...]


def _scan_bwd_kernel(u_ref, d_ref, B_ref, C_ref, A_ref, ckpt_ref, dy_ref, dhT_ref,
                     du_ref, ddt_ref, dB_ref, dC_ref, dA_ref, dh0_ref,
                     hhat_carry, dA_scratch):
    """Backward kernel: chunks iterate in REVERSE time order (via index_map).

    Recomputes within-chunk states h from the chunk-start checkpoint, runs
    the reverse adjoint scan  hhat_t = dy_t (x) C_t + a_{t+1} * hhat_{t+1}
    (Hillis-Steele on flipped arrays), and emits all input gradients.
    The cross-chunk adjoint carry a_{first} * hhat_{first} and the dA
    accumulator live in persistent VMEM scratch.
    """
    c = pl.program_id(2)  # reversed position: actual chunk = nc - 1 - c
    nc = pl.num_programs(2)

    u = u_ref[0].astype(jnp.float32)  # (L, BD)
    dt = d_ref[0].astype(jnp.float32)
    Bm = B_ref[0].astype(jnp.float32)  # (L, N)
    Cm = C_ref[0].astype(jnp.float32)
    A = A_ref[...].astype(jnp.float32)  # (N, BD)
    dy = dy_ref[0].astype(jnp.float32)  # (L, BD)
    h_start = ckpt_ref[0, 0]  # (N, BD) chunk-start state

    @pl.when(c == 0)
    def _():
        # Adjoint seed at the sequence end: cotangent of the final state.
        hhat_carry[:] = dhT_ref[0]
        dA_scratch[:] = jnp.zeros_like(dA_scratch)

    # --- recompute within-chunk forward (same Hillis-Steele as forward) ---
    a0 = jnp.exp(dt[:, None, :] * A[None])  # (L, N, BD)
    b0 = (dt * u)[:, None, :] * Bm[:, :, None]
    L = a0.shape[0]
    a, b = a0, b0
    off = 1
    while off < L:
        pad_a = jnp.ones((off,) + a.shape[1:], a.dtype)
        pad_b = jnp.zeros((off,) + b.shape[1:], b.dtype)
        b = a * jnp.concatenate([pad_b, b[:-off]], axis=0) + b
        a = a * jnp.concatenate([pad_a, a[:-off]], axis=0)
        off *= 2
    h = a * h_start[None] + b  # (L, N, BD) states h_t
    h_prev = jnp.concatenate(
        [h_start[None], jax.lax.slice_in_dim(h, 0, L - 1, axis=0)], axis=0
    )

    # --- reverse adjoint scan ---
    g = dy[:, None, :] * Cm[:, :, None]  # (L, N, BD)
    # inject the carry (a_{next0} * hhat_{next0}, or dh_T at c==0) at t=L-1
    last_mask = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0) == L - 1
    g = g + jnp.where(last_mask, hhat_carry[...][None], 0.0)
    # coefficients: hhat_t = g_t + a_{t+1} * hhat_{t+1}  (suffix scan — a
    # Hillis-Steele shifting from the END; Mosaic has no `rev`)
    ra = jnp.concatenate(
        [jax.lax.slice_in_dim(a0, 1, L, axis=0), jnp.ones((1,) + a0.shape[1:], a0.dtype)],
        axis=0,
    )  # ra_t = a_{t+1}, ra_{L-1} = 1 (unused)
    rg = g
    off = 1
    while off < L:
        pad_a = jnp.ones((off,) + ra.shape[1:], ra.dtype)
        pad_b = jnp.zeros((off,) + rg.shape[1:], rg.dtype)
        rg = rg + ra * jnp.concatenate([rg[off:], pad_b], axis=0)
        ra = ra * jnp.concatenate([ra[off:], pad_a], axis=0)
        off *= 2
    hhat = rg  # (L, N, BD)

    # --- gradients ---
    ddt_ref[0] = (
        (hhat * (a0 * h_prev * A[None] + u[:, None, :] * Bm[:, :, None])).sum(axis=1)
    ).astype(ddt_ref.dtype)
    du_ref[0] = (dt * (hhat * Bm[:, :, None]).sum(axis=1)).astype(du_ref.dtype)
    dB_ref[0, 0] = ((hhat * (dt * u)[:, None, :]).sum(axis=2)).astype(dB_ref.dtype)
    dC_ref[0, 0] = ((h * dy[:, None, :]).sum(axis=2)).astype(dC_ref.dtype)
    dA_scratch[:] = dA_scratch[...] + (hhat * h_prev * a0 * dt[:, None, :]).sum(axis=0)

    # carry for the next (earlier) chunk: a_{t0} * hhat_{t0}
    a_first = jax.lax.slice_in_dim(a0, 0, 1, axis=0)[0]
    hhat_first = jax.lax.slice_in_dim(hhat, 0, 1, axis=0)[0]
    hhat_carry[:] = a_first * hhat_first

    @pl.when(c == nc - 1)
    def _():
        dA_ref[0] = dA_scratch[...]
        dh0_ref[0] = hhat_carry[...]


@functools.partial(jax.jit, static_argnames=("chunk", "block_d", "interpret"))
def _scan_pallas_bwd(u, delta, A_nd, B, C, ckpt, dy, dhT, chunk, block_d, interpret):
    Bz, T, Dm = u.shape
    N = A_nd.shape[0]
    nc = T // chunk
    ndb = Dm // block_d
    grid = (Bz, ndb, nc)

    # time-dependent blocks iterate in reverse chunk order
    def rev_t(b, j, c):
        return (b, grid[2] - 1 - c, j)

    def rev_tn(b, j, c):
        return (b, j, grid[2] - 1 - c, 0)

    du, ddt, dB_p, dC_p, dA_b, dh0 = pl.pallas_call(
        _scan_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), rev_t, memory_space=pltpu.VMEM),  # u
            pl.BlockSpec((1, chunk, block_d), rev_t, memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, grid[2] - 1 - c, 0),
                         memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, grid[2] - 1 - c, 0),
                         memory_space=pltpu.VMEM),  # C
            pl.BlockSpec((N, block_d), lambda b, j, c: (0, j),
                         memory_space=pltpu.VMEM),  # A^T
            pl.BlockSpec((1, 1, N, block_d), lambda b, j, c: (b, grid[2] - 1 - c, 0, j),
                         memory_space=pltpu.VMEM),  # ckpt
            pl.BlockSpec((1, chunk, block_d), rev_t, memory_space=pltpu.VMEM),  # dy
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),  # dh_T
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), rev_t, memory_space=pltpu.VMEM),  # du
            pl.BlockSpec((1, chunk, block_d), rev_t, memory_space=pltpu.VMEM),  # ddt
            pl.BlockSpec((1, 1, chunk, N), rev_tn, memory_space=pltpu.VMEM),  # dB partial
            pl.BlockSpec((1, 1, chunk, N), rev_tn, memory_space=pltpu.VMEM),  # dC partial
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),  # dA per-batch
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),  # dh0
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bz, T, Dm), jnp.float32),
            jax.ShapeDtypeStruct((Bz, T, Dm), jnp.float32),
            jax.ShapeDtypeStruct((Bz, ndb, T, N), jnp.float32),
            jax.ShapeDtypeStruct((Bz, ndb, T, N), jnp.float32),
            jax.ShapeDtypeStruct((Bz, N, Dm), jnp.float32),
            jax.ShapeDtypeStruct((Bz, N, Dm), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, block_d), jnp.float32),  # adjoint carry
            pltpu.VMEM((N, block_d), jnp.float32),  # dA accumulator
        ],
        interpret=interpret,
    )(u, delta, B, C, A_nd, ckpt, dy, dhT)
    return du, ddt, dB_p.sum(axis=1), dC_p.sum(axis=1), dA_b, dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_with_vjp(u, delta, A, B, C, D, h0, chunk, block_d, interpret):
    return _pallas_forward(u, delta, A, B, C, D, h0, chunk, block_d, interpret)


def _scan_vjp_fwd(u, delta, A, B, C, D, h0, chunk, block_d, interpret):
    y, h_final, ckpt = _pallas_forward(
        u, delta, A, B, C, D, h0, chunk, block_d, interpret, with_ckpt=True
    )
    return (y, h_final), (u, delta, A, B, C, D, h0, ckpt)


def _scan_vjp_bwd(chunk, block_d, interpret, residuals, cotangents):
    u, delta, A, B, C, D, h0, ckpt = residuals
    dy, dhT = cotangents
    Bz, T, Dm = u.shape
    N = A.shape[1]
    dy = jnp.zeros((Bz, T, Dm), jnp.float32) if dy is None else dy.astype(jnp.float32)
    dhT = jnp.zeros((Bz, N, Dm), jnp.float32) if dhT is None else dhT.astype(jnp.float32)

    Tp = ckpt.shape[1] * chunk
    if Tp != T:
        pad3 = ((0, 0), (0, Tp - T), (0, 0))
        u_p = jnp.pad(u, pad3)
        delta_p = jnp.pad(delta, pad3)
        B_p = jnp.pad(B, ((0, 0), (0, Tp - T), (0, 0)))
        C_p = jnp.pad(C, ((0, 0), (0, Tp - T), (0, 0)))
        dy_p = jnp.pad(dy, pad3)
    else:
        u_p, delta_p, B_p, C_p, dy_p = u, delta, B, C, dy

    A_nd = A.astype(jnp.float32).T
    du, ddt, dB, dC, dA_b, dh0 = _scan_pallas_bwd(
        u_p, delta_p, A_nd, B_p, C_p, ckpt, dy_p, dhT, chunk, block_d, interpret
    )
    # D skip: y += D * u  =>  du += D*dy, dD = sum(dy*u)
    du = du[:, :T] + D.astype(jnp.float32)[None, None, :] * dy
    dD = (dy * u.astype(jnp.float32)).sum(axis=(0, 1))
    dA = dA_b.sum(axis=0).T  # (N, D) -> (D, N)
    return (
        du.astype(u.dtype),
        ddt[:, :T].astype(delta.dtype),
        dA.astype(A.dtype),
        dB[:, :T].astype(B.dtype),
        dC[:, :T].astype(C.dtype),
        dD.astype(D.dtype),
        dh0.astype(jnp.float32),
    )


_scan_with_vjp.defvjp(_scan_vjp_fwd, _scan_vjp_bwd)


def selective_scan_pallas(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    h0: Optional[jax.Array] = None,
    chunk: int = 64,
    block_d: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``selective_scan_chunked`` backed by the
    fused Pallas kernel (12.6x faster than the XLA chunked scan at flagship
    shapes on v5e), differentiable via custom VJP.  Pads T to a multiple of
    ``chunk`` and picks a lane-aligned d-block."""
    Bz, T, Dm = u.shape
    N = A.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_d is None:
        block_d = 256 if Dm % 256 == 0 else (128 if Dm % 128 == 0 else Dm)
    h0_arr = (
        jnp.zeros((Bz, N, Dm), jnp.float32) if h0 is None else h0.astype(jnp.float32)
    )
    return _scan_with_vjp(u, delta, A, B, C, D, h0_arr, chunk, block_d, interpret)


def _pallas_forward(u, delta, A, B, C, D, h0, chunk, block_d, interpret,
                    with_ckpt: bool = False):
    """Pad + block + invoke the kernel (no autodiff)."""
    Bz, T, Dm = u.shape
    N = A.shape[1]
    assert Dm % block_d == 0, f"d_inner {Dm} not divisible by block_d {block_d}"

    Tp = -(-T // chunk) * chunk
    if Tp != T:
        pad3 = ((0, 0), (0, Tp - T), (0, 0))
        u_p = jnp.pad(u, pad3)
        delta_p = jnp.pad(delta, pad3)
        B_p = jnp.pad(B, ((0, 0), (0, Tp - T), (0, 0)))
        C_p = jnp.pad(C, ((0, 0), (0, Tp - T), (0, 0)))
    else:
        u_p, delta_p, B_p, C_p = u, delta, B, C

    A_nd = A.astype(jnp.float32).T  # (N, D)
    Dskip = D.astype(jnp.float32).reshape(1, Dm)
    if with_ckpt:
        y, h_final, ckpt = _scan_pallas_ckpt(
            u_p, delta_p, A_nd, B_p, C_p, Dskip, h0, chunk, block_d, interpret
        )
        return y[:, :T], h_final, ckpt
    y, h_final = _scan_pallas(
        u_p, delta_p, A_nd, B_p, C_p, Dskip, h0, chunk, block_d, interpret
    )
    return y[:, :T], h_final


@functools.partial(jax.jit, static_argnames=("chunk", "block_d", "interpret"))
def _scan_pallas_ckpt(u, delta, A_nd, B, C, Dskip, h0, chunk, block_d, interpret):
    """Forward kernel variant that also emits chunk-start state checkpoints
    (B, nc, N, D) for the backward kernel's rematerialization."""
    Bz, T, Dm = u.shape
    N = A_nd.shape[0]
    nc = T // chunk
    ndb = Dm // block_d
    grid = (Bz, ndb, nc)

    y, h_final, ckpt = pl.pallas_call(
        _scan_kernel_ckpt,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, N), lambda b, j, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, block_d), lambda b, j, c: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, j, c: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, block_d), lambda b, j, c: (b, c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, block_d), lambda b, j, c: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, block_d), lambda b, j, c: (b, c, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bz, T, Dm), u.dtype),
            jax.ShapeDtypeStruct((Bz, N, Dm), jnp.float32),
            jax.ShapeDtypeStruct((Bz, nc, N, Dm), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, block_d), jnp.float32)],
        interpret=interpret,
    )(u, delta, B, C, A_nd, Dskip, h0)
    return y, h_final, ckpt
