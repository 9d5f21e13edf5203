"""Sequence-parallel selective scan (context parallelism for Mamba).

The SSM analogue of ring attention (SURVEY §5 "long-context / sequence
parallelism"): shard the TIME axis across mesh devices and hand the chunk
-boundary SSM state across shards over ICI.

Because the recurrence is a first-order affine map, the cross-device fix-up
is exact and cheap:

  1. local pass: each device scans its time shard from h0 = 0, producing its
     local transition summary (P_i, h_i) where P_i = prod(exp(dt A)) over the
     shard and h_i is the shard-final state;
  2. device-level exclusive associative scan over the (P, h) pairs
     (all_gather over the sequence axis — log/linear in #devices, tiny
     payload: one (B, N, D) state per device);
  3. second local pass with the correct incoming state.

Pass 1 only needs the final state (XLA dead-code-eliminates the y
projection), so the total cost is <2x a single scan while enabling sequence
lengths that do not fit one chip.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mamba_tts_tpu.ops.selective_scan import selective_scan_chunked


def _combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def sp_selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Selective scan with the time axis sharded over ``mesh[axis]``.

    Shapes as :func:`selective_scan_chunked`; T must divide by the axis size.
    Returns (y (B, T, D) sharded on time, h_final (B, N, D) replicated).
    """
    n_shards = mesh.shape[axis]
    Bz, T, Dm = u.shape
    N = A.shape[1]
    assert T % n_shards == 0, f"T={T} must divide across {n_shards} shards"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),  # u
            P(None, axis, None),  # delta
            P(),  # A
            P(None, axis, None),  # B
            P(None, axis, None),  # C
            P(),  # D
        ),
        out_specs=(P(None, axis, None), P()),
        # h_final is an all_gather result (identical on every shard); the
        # vma checker cannot prove that, so it is disabled here.
        check_vma=False,
    )
    def _sp(u_l, d_l, A_g, B_l, C_l, D_g):
        idx = jax.lax.axis_index(axis)
        Bz_l = u_l.shape[0]
        # zero initial state, typed as varying over the sequence axis (the
        # scan carry mixes with per-shard data — shard_map vma typing)
        h_zero = jax.lax.pcast(
            jnp.zeros((Bz_l, N, Dm), jnp.float32), (axis,), to="varying"
        )

        # pass 1: local shard-final state from zero (y is DCE'd)
        _, h_local = selective_scan_chunked(
            u_l, d_l, A_g, B_l, C_l, D_g, h0=h_zero, chunk=chunk
        )
        # local total transition product: prod_t exp(dt_t A) = exp(A * sum dt)
        sum_dt = d_l.astype(jnp.float32).sum(axis=1)  # (B, D)
        P_local = jnp.exp(A_g.astype(jnp.float32).T[None] * sum_dt[:, None, :])  # (B,N,D)

        # device-level exclusive prefix over (P, h): gather all shard
        # summaries (tiny) and fold the predecessors of this shard.
        P_all = jax.lax.all_gather(P_local, axis)  # (S, B, N, D)
        h_all = jax.lax.all_gather(h_local, axis)
        S = P_all.shape[0]

        def fold(i, carry):
            take = i < idx
            a_i = jnp.where(take, P_all[i], jnp.ones_like(P_all[i]))
            b_i = jnp.where(take, h_all[i], jnp.zeros_like(h_all[i]))
            return _combine(carry, (a_i, b_i))

        # ones_like/zeros_like inherit the varying type from their sources
        ones = jnp.ones_like(P_local)
        zeros = jnp.zeros_like(h_local)
        _, h0 = jax.lax.fori_loop(0, S, fold, (ones, zeros))

        # pass 2: the real scan with the carried-in state
        y_l, h_l = selective_scan_chunked(u_l, d_l, A_g, B_l, C_l, D_g, h0=h0, chunk=chunk)
        # final state is the last shard's output
        h_final = jax.lax.all_gather(h_l, axis)[-1]
        return y_l, h_final

    return _sp(u, delta, A, B, C, D)
