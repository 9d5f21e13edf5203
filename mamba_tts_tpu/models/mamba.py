"""Mamba (selective-SSM) block, TPU-native.

Implements the layer contract the reference documents but its dependency does
not actually provide (reference: mamba_decoder.py:9-15 — "Calling signature:
``out, new_state = mamba(x)`` for full-sequence or ``out, new_state =
mamba(x, state)`` for step-wise updates"); the reference's tuple-unpacking of
``mamba_ssm.Mamba`` is a latent bug this build fixes by implementing exactly
the documented contract (SURVEY §7 defect 1).

Block structure (mamba-ssm ``Mamba(d_model)`` defaults: d_state=16, d_conv=4,
expand=2):

    x -> in_proj -> (x, z)
    x -> causal depthwise conv(d_conv) -> SiLU
      -> x_proj -> (dt_raw, B, C);  dt = softplus(dt_proj(dt_raw))
      -> selective_scan(x, dt, A=-exp(A_log), B, C, D)
    y = scan_out * SiLU(z) -> out_proj

TPU notes:
- The depthwise conv is unrolled into d_conv shifted multiply-adds (d_conv=4)
  — XLA fuses these into the surrounding elementwise chain; no conv op.
- The scan is the chunked associative scan from ``mamba_tts_tpu.ops`` (or the
  Pallas kernel when enabled); accumulation is f32, activations bf16.
- Decode carries ``MambaState`` = (conv ring buffer, SSM state) — O(1) per
  step, matching the CUDA step kernel's role in the reference stack.

State layout:
    conv_state: (B, d_conv-1, d_inner)  last inputs of the conv window
    ssm_state:  (B, d_state, d_inner)   float32
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mamba_tts_tpu.config import MambaConfig
from mamba_tts_tpu.ops.selective_scan import selective_scan, selective_scan_step


class MambaState(NamedTuple):
    conv: jax.Array  # (B, d_conv-1, d_inner), compute dtype
    ssm: jax.Array  # (B, d_state, d_inner), float32


def _softplus_inverse(x):
    return x + jnp.log(-jnp.expm1(-x))


class MambaBlock(nn.Module):
    """``sp_mesh``/``sp_axis`` turn on sequence (context) parallelism: the
    full-sequence scan shards its TIME axis over ``sp_mesh[sp_axis]`` via
    ``parallel.sp_scan.sp_selective_scan`` (exact chunk-boundary state
    handoff over ICI).  Training-path only — ``step`` and calls carrying an
    incoming state use the regular scan."""

    cfg: MambaConfig
    dtype: jnp.dtype = jnp.bfloat16
    scan_chunk: int = 64
    use_pallas: bool = False
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh
    sp_axis: str = "data"

    def setup(self):
        c = self.cfg
        d_in = c.d_inner
        self.in_proj = nn.Dense(2 * d_in, use_bias=c.use_bias, dtype=self.dtype, name="in_proj")
        # Depthwise causal conv weights: (d_conv, d_inner).
        self.conv_w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (c.d_conv, d_in),
            jnp.float32,
        )
        self.conv_b = (
            self.param("conv_b", nn.initializers.zeros, (d_in,), jnp.float32)
            if c.conv_bias
            else None
        )
        self.x_proj = nn.Dense(
            c.dt_rank_actual + 2 * c.d_state, use_bias=False, dtype=self.dtype, name="x_proj"
        )

        # dt_proj with mamba-ssm's initialization: weights scaled by
        # dt_rank**-0.5, bias set so softplus(bias) ~ Uniform(dt_min, dt_max)
        # in log space.
        def dt_bias_init(key, shape, dtype=jnp.float32):
            u = jax.random.uniform(key, shape, jnp.float32)
            dt = jnp.exp(
                u * (jnp.log(c.dt_max) - jnp.log(c.dt_min)) + jnp.log(c.dt_min)
            )
            dt = jnp.maximum(dt, c.dt_init_floor)
            return _softplus_inverse(dt).astype(dtype)

        self.dt_proj = nn.Dense(
            d_in,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            bias_init=dt_bias_init,
            name="dt_proj",
        )

        # S4D-real initialization: A[d, n] = -(n + 1).
        def a_log_init(key, shape, dtype=jnp.float32):
            n = jnp.arange(1, shape[1] + 1, dtype=jnp.float32)
            return jnp.log(jnp.broadcast_to(n, shape)).astype(dtype)

        self.A_log = self.param("A_log", a_log_init, (d_in, c.d_state), jnp.float32)
        self.D = self.param("D", nn.initializers.ones, (d_in,), jnp.float32)
        self.out_proj = nn.Dense(
            c.d_model, use_bias=c.use_bias, dtype=self.dtype, name="out_proj"
        )

    def _conv_full(self, x: jax.Array, conv_init: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        """Causal depthwise conv over the full sequence.

        x: (B, T, d_inner). conv_init: optional (B, d_conv-1, d_inner) history
        (zeros if None). Returns (conv_out (B,T,d_inner), new conv state).
        """
        c = self.cfg
        B, T, D = x.shape
        k = c.d_conv
        if conv_init is None:
            conv_init = jnp.zeros((B, k - 1, D), x.dtype)
        xp = jnp.concatenate([conv_init.astype(x.dtype), x], axis=1)  # (B, T+k-1, D)
        w = self.conv_w.astype(x.dtype)
        out = jnp.zeros((B, T, D), x.dtype)
        for i in range(k):  # k=4: unrolled shifted MACs, fused by XLA
            out = out + xp[:, i : i + T] * w[i]
        if self.conv_b is not None:
            out = out + self.conv_b.astype(x.dtype)
        new_state = xp[:, T:]  # last k-1 inputs
        return out, new_state

    def _ssm_inputs(self, x_conv: jax.Array):
        c = self.cfg
        r = c.dt_rank_actual
        proj = self.x_proj(x_conv)
        dt_raw, Bm, Cm = jnp.split(proj, [r, r + c.d_state], axis=-1)
        dt = jax.nn.softplus(self.dt_proj(dt_raw).astype(jnp.float32))
        return dt, Bm, Cm

    def __call__(
        self, x: jax.Array, state: Optional[MambaState] = None
    ) -> Tuple[jax.Array, MambaState]:
        """Full-sequence forward. x: (B, T, d_model) -> (y, new_state)."""
        c = self.cfg
        xz = self.in_proj(x.astype(self.dtype))
        xin, z = jnp.split(xz, 2, axis=-1)
        conv_init = state.conv if state is not None else None
        h0 = state.ssm if state is not None else None
        x_conv, conv_state = self._conv_full(xin, conv_init)
        x_conv = nn.silu(x_conv)
        dt, Bm, Cm = self._ssm_inputs(x_conv)
        A = -jnp.exp(self.A_log)
        if self.sp_mesh is not None and h0 is None:
            from mamba_tts_tpu.parallel.sp_scan import sp_selective_scan

            y, ssm_state = sp_selective_scan(
                x_conv, dt, A, Bm, Cm, self.D,
                mesh=self.sp_mesh, axis=self.sp_axis, chunk=self.scan_chunk,
            )
        else:
            y, ssm_state = selective_scan(
                x_conv, dt, A, Bm, Cm, self.D,
                h0=h0, chunk=self.scan_chunk, use_pallas=self.use_pallas,
            )
        y = y * nn.silu(z)
        out = self.out_proj(y)
        return out, MambaState(conv=conv_state, ssm=ssm_state)

    def step(self, x_t: jax.Array, state: MambaState) -> Tuple[jax.Array, MambaState]:
        """Single-token decode step. x_t: (B, 1, d_model) -> (y (B,1,d_model), state)."""
        c = self.cfg
        B = x_t.shape[0]
        xz = self.in_proj(x_t.astype(self.dtype))[:, 0]  # (B, 2*d_inner)
        xin, z = jnp.split(xz, 2, axis=-1)
        # Conv ring buffer: window = [conv_state, x_t].
        window = jnp.concatenate([state.conv.astype(xin.dtype), xin[:, None]], axis=1)
        w = self.conv_w.astype(xin.dtype)
        conv_out = jnp.einsum("bkd,kd->bd", window, w)
        if self.conv_b is not None:
            conv_out = conv_out + self.conv_b.astype(xin.dtype)
        x_conv = nn.silu(conv_out)
        dt, Bm, Cm = self._ssm_inputs(x_conv)
        A = -jnp.exp(self.A_log)
        y, ssm_state = selective_scan_step(x_conv, dt, A, Bm, Cm, self.D, state.ssm)
        y = y * nn.silu(z)
        out = self.out_proj(y)
        return out[:, None], MambaState(conv=window[:, 1:], ssm=ssm_state)

    def init_state(self, batch: int) -> MambaState:
        c = self.cfg
        return MambaState(
            conv=jnp.zeros((batch, c.d_conv - 1, c.d_inner), self.dtype),
            ssm=jnp.zeros((batch, c.d_state, c.d_inner), jnp.float32),
        )


def init_mamba_state(cfg: MambaConfig, batch: int, dtype=jnp.bfloat16) -> MambaState:
    """Build a zeroed MambaState outside a module context."""
    return MambaState(
        conv=jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner), dtype),
        ssm=jnp.zeros((batch, cfg.d_state, cfg.d_inner), jnp.float32),
    )
