"""Single-Pallas-call autoregressive decode ("megakernel").

The step-scan decodes (models/decoder.py greedy_decode, infer/quant_decode)
dispatch ~64 XLA/Pallas ops per token; measured per-step cost at B=1 is
~105 us against ~56 us of int8 weight-read HBM time — the gap is pipeline
flushes between kernels, not bytes.  This kernel runs the ENTIRE greedy
decode as ONE ``pallas_call`` with ``grid=(Q*F,)``:

- every weight and K/V tensor is an input whose ``index_map`` is constant,
  so Pallas DMAs it into VMEM once and keeps it resident for all grid
  steps; residency dtypes shrink as batch grows (bf16 weights at B<=2,
  int8 weights, then int8 K/V whose per-channel scales fold into the query
  row / the attention output row — no in-kernel dequant of the big
  tensors);
- the SSM / conv states, and the previous tokens (one-hot rows), live in
  persistent VMEM scratch across grid steps;
- per step the kernel embeds the tokens (one-hot matmul — no dynamic
  gather), runs all ``n_layers`` (Mamba step -> 1-query cross-attention
  -> FiLM FFN) inline, projects the vocab head, and emits the masked
  logits rows; the greedy argmax (or Gumbel-max sample, via a streamed
  pre-scaled noise row) feeds the next step's one-hots.

Per-token HBM traffic drops to an embedding-row read and a logits-row
write — decode becomes issue/op-latency-bound instead of bandwidth-bound,
so the kernel is shaped to MINIMIZE OP COUNT: activations ride sublanes
(B rows per matmul), and attention computes every head at once as two
block-diagonal matmuls (heads on sublanes) with one row-wise softmax for
all (sequence, head) pairs.  Measured on v5e (12.8 s utterance, 5120
tokens): 29k tok/s at B=1 (RTF 0.014), 99.9k aggregate at B=8 — vs
9.6k / 22.4k for the step scans.

Numerics in weight_dtype="int8" mode mirror
``infer/quant_decode.quant_step_with_kv`` (same int8 per-output-channel
weight quantization from ``quantize_decoder_params``, same f32
LayerNorm/softmax/accumulation points, exact erf GELU); parity is pinned
by ``tests/test_decode_megakernel.py`` against the step-scan path.
weight_dtype="bfloat16" pre-folds the scales into bf16 weights (faster;
adds only bf16 weight rounding).

Reference: the synthesis loop the upstream repo documents but never ships
(reference: mamba_decoder.py:188-256, README.md:14-28).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamba_tts_tpu.config import DecoderConfig
from mamba_tts_tpu.models.decoder import DecodeResult, MambaTTSDecoder


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _Plan(NamedTuple):
    """Everything the kernel needs, shaped for VMEM residency (B=1)."""

    emb_pq: jax.Array      # (total, d) bf16: pos+quant embedding per step
    token_embed: jax.Array # (Vpad, d) bf16
    norms: jax.Array       # (L, 6, d) f32: [m_s, m_b, c_s, c_b, f_s, f_b]
    in_w: jax.Array        # (L, d, 2*di) int8
    in_s: jax.Array        # (L, 1, 2*di) f32
    conv_w: jax.Array      # (L, dc, di) bf16
    conv_b: jax.Array      # (L, 1, di) f32
    xp_dt: jax.Array       # (L, di, r) bf16
    xp_B: jax.Array        # (L, di, N) bf16
    xp_C: jax.Array        # (L, di, N) bf16
    dt_w: jax.Array        # (L, r, di) bf16
    dt_b: jax.Array        # (L, 1, di) f32
    A: jax.Array           # (L, N, di) f32 (= -exp(A_log), transposed)
    D: jax.Array           # (L, 1, di) f32
    out_w: jax.Array       # (L, di, d) int8
    out_s: jax.Array       # (L, 1, d) f32
    q_w: jax.Array         # (L, d, d) int8
    q_s: jax.Array         # (L, 1, d) f32
    q_b: jax.Array         # (L, 1, d) f32
    headmask: jax.Array    # (H, d) bf16: 1 where channel c belongs to head h
    K: jax.Array           # (L, B, d, Tmp) bf16 or int8: heads on channels
    V: jax.Array           # (L, B, Tmp, d) bf16 or int8
    k_scale: jax.Array     # (L, B, 1, d) f32 per-channel K scale (1s if bf16)
    v_scale: jax.Array     # (L, B, 1, d) f32 per-channel V scale (1s if bf16)
    mask_row: jax.Array    # (B, Tmp) f32 additive bias (0 valid / -1e9)
    o_w: jax.Array         # (L, d, d) int8
    o_s: jax.Array         # (L, 1, d) f32
    o_b: jax.Array         # (L, 1, d) f32
    gamma: jax.Array       # (L, B, d) f32 FiLM scale
    beta: jax.Array        # (L, B, d) f32 FiLM shift
    ff1_w: jax.Array       # (L, d, dff) int8
    ff1_s: jax.Array       # (L, 1, dff) f32
    ff1_b: jax.Array       # (L, 1, dff) f32
    ff2_w: jax.Array       # (L, dff, d) int8
    ff2_s: jax.Array       # (L, 1, d) f32
    ff2_b: jax.Array       # (L, 1, d) f32
    norm_out: jax.Array    # (2, d) f32
    head_w: jax.Array      # (d, Vpad) bf16 (f32 MXU passes cost 4-6x bf16;
                           #   rounding ~4e-3 rel, far under greedy margins)
    head_b: jax.Array      # (1, Vpad) f32, -1e9 at specials and pad columns


class _WeightPlan(NamedTuple):
    """The weight-side _Plan fields — a pure function of (cfg, qparams,
    weight_dtype), independent of the utterance.  Serving precomputes one
    per residency dtype at session setup and passes it as a runtime jit
    argument, so the per-call decode jit does no weight stacking, casting
    or scale folding, and the serialized compile request carries no weight
    constants (the remote-compile service rejects >~128 MB bodies)."""

    token_embed: jax.Array  # (Vpad, d) bf16
    pos_embed: jax.Array    # (max_seq, d) — emb_pq gathers per frame budget
    quant_embed: jax.Array  # (Q, d)
    norms: jax.Array
    in_w: jax.Array
    in_s: jax.Array
    conv_w: jax.Array
    conv_b: jax.Array
    xp_dt: jax.Array
    xp_B: jax.Array
    xp_C: jax.Array
    dt_w: jax.Array
    dt_b: jax.Array
    A: jax.Array
    D: jax.Array
    out_w: jax.Array
    out_s: jax.Array
    q_w: jax.Array
    q_s: jax.Array
    q_b: jax.Array
    headmask: jax.Array
    o_w: jax.Array
    o_s: jax.Array
    o_b: jax.Array
    ff1_w: jax.Array
    ff1_s: jax.Array
    ff1_b: jax.Array
    ff2_w: jax.Array
    ff2_s: jax.Array
    ff2_b: jax.Array
    norm_out: jax.Array
    head_w: jax.Array
    head_b: jax.Array


def build_weight_plan(cfg: DecoderConfig, qparams: dict,
                      weight_dtype: str = "bfloat16") -> _WeightPlan:
    """Stack per-layer decode params into kernel-resident (L, ...) arrays.

    ``qparams`` is ``infer.quant_decode.quantize_decoder_params`` output.

    ``weight_dtype``: "bfloat16" pre-folds each int8 weight's per-channel
    scale into a bf16 weight — the per-use int8->bf16 convert + scale-mul
    inside the kernel (~4M elements per layer per token) was ~25% of step
    time, and at B=1 the bf16 weights (67 MB) still fit VMEM comfortably.
    "int8" keeps int8-resident weights (exact parity with the int8 step
    scan; half the weight VMEM — needed when batched K/V gets large).
    """
    c = cfg
    m = c.with_mamba_dims().mamba
    L, d, di, N, r = c.n_layers, c.d_model, m.d_inner, m.d_state, m.dt_rank_actual
    H = c.n_heads
    hd = d // H
    bf = jnp.bfloat16

    Vreal = c.vocab_size_audio
    Vpad = _round_up(Vreal, 128)

    te = jnp.zeros((Vpad, d), bf).at[:Vreal].set(qparams["token_embed"].astype(bf))

    def stack(fn):
        return jnp.stack([fn(qparams["layers"][i]) for i in range(L)])

    norms = stack(lambda lp: jnp.stack([
        lp["norm_mamba"]["scale"], lp["norm_mamba"]["bias"],
        lp["norm_cross"]["scale"], lp["norm_cross"]["bias"],
        lp["norm_ff"]["scale"], lp["norm_ff"]["bias"],
    ]).astype(jnp.float32))

    xp = stack(lambda lp: lp["x_proj_k"].astype(bf))  # (L, di, r+2N)

    headmask = (jnp.arange(d)[None, :] // hd
                == jnp.arange(H)[:, None]).astype(bf)

    head_w = jnp.zeros((d, Vpad), bf).at[:, :Vreal].set(
        qparams["head_k"].astype(bf)
    )
    head_b = jnp.full((Vpad,), -1e9, jnp.float32).at[:Vreal].set(
        qparams["head_b"].astype(jnp.float32)
    )
    head_b = head_b.at[: c.num_special_tokens].set(-1e9)[None]

    wp = _WeightPlan(
        token_embed=te,
        pos_embed=qparams["pos_embed"],
        quant_embed=qparams["quant_embed"],
        norms=norms,
        in_w=stack(lambda lp: lp["in_proj"]["w_q"]),
        in_s=stack(lambda lp: lp["in_proj"]["scale"])[:, None, :],
        conv_w=stack(lambda lp: lp["conv_w"].astype(bf)),
        conv_b=stack(
            lambda lp: (lp["conv_b"] if lp["conv_b"] is not None
                        else jnp.zeros((di,))).astype(jnp.float32)
        )[:, None, :],
        xp_dt=xp[:, :, :r],
        xp_B=xp[:, :, r:r + N],
        xp_C=xp[:, :, r + N:],
        dt_w=stack(lambda lp: lp["dt_proj_k"].astype(bf)),
        dt_b=stack(lambda lp: lp["dt_proj_b"].astype(jnp.float32))[:, None, :],
        A=jnp.stack([qparams["layers"][i]["A"].T for i in range(L)]).astype(jnp.float32),
        D=stack(lambda lp: lp["D"].astype(jnp.float32))[:, None, :],
        out_w=stack(lambda lp: lp["out_proj"]["w_q"]),
        out_s=stack(lambda lp: lp["out_proj"]["scale"])[:, None, :],
        q_w=stack(lambda lp: lp["q_proj"]["w_q"]),
        q_s=stack(lambda lp: lp["q_proj"]["scale"])[:, None, :],
        q_b=stack(lambda lp: lp["q_proj"]["bias"])[:, None, :],
        headmask=headmask,
        o_w=stack(lambda lp: lp["o_proj"]["w_q"]),
        o_s=stack(lambda lp: lp["o_proj"]["scale"])[:, None, :],
        o_b=stack(lambda lp: lp["o_proj"]["bias"])[:, None, :],
        ff1_w=stack(lambda lp: lp["ff1"]["w_q"]),
        ff1_s=stack(lambda lp: lp["ff1"]["scale"])[:, None, :],
        ff1_b=stack(lambda lp: lp["ff1"]["bias"])[:, None, :],
        ff2_w=stack(lambda lp: lp["ff2"]["w_q"]),
        ff2_s=stack(lambda lp: lp["ff2"]["scale"])[:, None, :],
        ff2_b=stack(lambda lp: lp["ff2"]["bias"])[:, None, :],
        norm_out=jnp.stack(
            [qparams["norm_out"]["scale"], qparams["norm_out"]["bias"]]
        ).astype(jnp.float32),
        head_w=head_w,
        head_b=head_b,
    )
    if weight_dtype == "bfloat16":
        def fold(w, s):  # (L, K, Nc) int8, (L, 1, Nc) f32 -> bf16, pre-scaled
            return (w.astype(jnp.float32) * s).astype(bf)

        wp = wp._replace(
            in_w=fold(wp.in_w, wp.in_s),
            out_w=fold(wp.out_w, wp.out_s),
            q_w=fold(wp.q_w, wp.q_s),
            o_w=fold(wp.o_w, wp.o_s),
            ff1_w=fold(wp.ff1_w, wp.ff1_s),
            ff2_w=fold(wp.ff2_w, wp.ff2_s),
        )
    elif weight_dtype != "int8":
        raise ValueError(f"weight_dtype must be bfloat16|int8: {weight_dtype}")
    return wp


def _build_plan(cfg: DecoderConfig, qparams: dict, KV, memory_mask,
                films, frames_per_stream: int,
                weight_dtype: str = "bfloat16",
                kv_dtype: str = "bfloat16",
                weight_plan: Optional[_WeightPlan] = None) -> _Plan:
    """Merge the (precomputable) weight plan with the per-utterance
    conditioning side — K/V memories, memory mask, FiLM rows, per-step
    pos+quant embedding — into the kernel-resident _Plan.

    ``KV``/``memory_mask``/``films`` come from
    ``MambaTTSDecoder.project_memories``.  ``weight_plan`` skips the weight
    stacking entirely (serving passes a session-precomputed one as a jit
    argument); None rebuilds it inline from ``qparams``.
    """
    c = cfg
    bf = jnp.bfloat16
    wp = (build_weight_plan(cfg, qparams, weight_dtype)
          if weight_plan is None else weight_plan)
    # A dtype-mismatched precomputed plan would silently bypass the VMEM
    # fit planner's residency choice (bf16 weights are 2x the int8 budget).
    want = jnp.int8 if weight_dtype == "int8" else bf
    if wp.in_w.dtype != want:
        raise ValueError(
            f"weight_plan dtype {wp.in_w.dtype} does not match "
            f"weight_dtype={weight_dtype!r}"
        )
    d, L = c.d_model, c.n_layers
    total = c.num_quantizers * frames_per_stream

    # --- per-step pos+quant embedding (streamed (1, d) per grid step) ---
    steps = jnp.arange(total, dtype=jnp.int32)
    q_id = jnp.minimum(steps // frames_per_stream, c.num_quantizers - 1)
    pos_id = steps % frames_per_stream
    emb_pq = (wp.pos_embed[pos_id] + wp.quant_embed[q_id]).astype(bf)

    # all-heads attention layout (heads ride SUBLANES in the kernel):
    #   K (L, B, d, Tmp): channel h*hd+j, position t  <- KV[l][0][b, h, t, j]
    #   V (L, B, Tmp, d)
    # so scores for every head come from ONE (H, d) @ (d, Tmp) matmul per
    # sequence with a block-diagonal lhs (head h's q in channels
    # [h*hd, (h+1)*hd)), and the V-contraction is ONE (H, Tmp) @ (Tmp, d)
    # whose diagonal blocks are selected with `headmask` — 2 MXU ops per
    # layer per sequence instead of 2 per head.
    Bsz, _, Tm, _ = KV[0][0].shape
    Tmp = _round_up(Tm, 128)
    Kst = jnp.stack([kv[0] for kv in KV])  # (L, B, H, Tm, hd)
    Vst = jnp.stack([kv[1] for kv in KV])
    pad_t = ((0, 0), (0, 0), (0, 0), (0, Tmp - Tm), (0, 0))
    Kst = jnp.pad(Kst.astype(bf), pad_t)  # (L, B, H, Tmp, hd)
    Vst = jnp.pad(Vst.astype(bf), pad_t)
    Kst = jnp.transpose(Kst, (0, 1, 2, 4, 3)).reshape(L, Bsz, d, Tmp)
    Vst = jnp.transpose(Vst, (0, 1, 3, 2, 4)).reshape(L, Bsz, Tmp, d)
    if kv_dtype == "int8":
        # per-channel symmetric int8.  The kernel never dequantizes the big
        # tensors: K's scale folds into q BEFORE the score matmul (scores
        # contract over channels), V's folds into the attention output row
        # AFTER the diagonal-block extraction — Mosaic takes the mixed
        # bf16 x int8 dots natively.
        k_amax = jnp.abs(Kst.astype(jnp.float32)).max(axis=3) + 1e-8  # (L,B,d)
        v_amax = jnp.abs(Vst.astype(jnp.float32)).max(axis=2) + 1e-8
        k_scale = (k_amax / 127.0)[:, :, None, :]
        v_scale = (v_amax / 127.0)[:, :, None, :]
        Kst = jnp.round(
            Kst.astype(jnp.float32) / jnp.transpose(k_scale, (0, 1, 3, 2))
        ).astype(jnp.int8)
        Vst = jnp.round(Vst.astype(jnp.float32) / v_scale).astype(jnp.int8)
    elif kv_dtype == "bfloat16":
        k_scale = jnp.ones((L, Bsz, 1, d), jnp.float32)
        v_scale = jnp.ones((L, Bsz, 1, d), jnp.float32)
    else:
        raise ValueError(f"kv_dtype must be bfloat16|int8: {kv_dtype}")

    if memory_mask is None:
        valid = jnp.ones((Bsz, Tm), bool)
    else:
        valid = memory_mask
    mask_row = jnp.where(
        jnp.pad(valid, ((0, 0), (0, Tmp - Tm))), 0.0, -1e9
    ).astype(jnp.float32)

    gamma = jnp.stack([g.astype(jnp.float32) for g, _ in films])  # (L, B, d)
    beta = jnp.stack([b.astype(jnp.float32) for _, b in films])

    return _Plan(
        emb_pq=emb_pq,
        K=Kst, V=Vst, k_scale=k_scale, v_scale=v_scale, mask_row=mask_row,
        gamma=gamma, beta=beta,
        **{f: getattr(wp, f) for f in _WeightPlan._fields
           if f not in ("pos_embed", "quant_embed")},
    )


# v5e VMEM per core; _megakernel_call passes this as vmem_limit_bytes.
TPU_VMEM_BYTES = 128 * 1024 * 1024
# Head-room for Mosaic temporaries (per-step activation rows, matmul
# accumulators, relayout buffers).  128 MiB - 5 MiB reproduces every
# measured fit boundary at the flagship shape: B=2 bf16/bf16 (110 MB) fits,
# B=3 bf16 (131 MB) does not; B=8 int8/int8 (122 MB) fits and runs at
# 114.7k tok/s, B=9 (132 MB) does not compile.
_VMEM_MARGIN_BYTES = 5 * 1024 * 1024


def plan_resident_bytes(
    cfg: DecoderConfig,
    batch: int,
    memory_len: int,
    weight_dtype: str = "bfloat16",
    kv_dtype: str = "bfloat16",
    unroll_steps: int = 1,
    sampled: bool = False,
    teacher_force: bool = False,
) -> int:
    """VMEM bytes the megakernel keeps resident across grid steps.

    Shape-level mirror of ``_build_plan`` + ``_megakernel_call``: the
    constant-index operands (weights, K/V, scales), the double-buffered
    streamed blocks (pos/quant embedding row, logits out, optional gumbel /
    teacher-forcing rows), and the persistent scratch (one-hots, conv and
    SSM state).  ``memory_len`` is the unpadded cross-attention memory
    length (ref tokens + text tokens); K/V pad it to a lane multiple.
    Exactness is pinned against real plan ``nbytes`` by
    tests/test_decode_megakernel.py.
    """
    c = cfg
    m = c.with_mamba_dims().mamba
    L, d, di, N = c.n_layers, c.d_model, m.d_inner, m.d_state
    r, dc, H, dff = m.dt_rank_actual, m.d_conv, c.n_heads, c.d_ff
    B, U = batch, unroll_steps
    Vpad = _round_up(c.vocab_size_audio, 128)
    Tmp = _round_up(memory_len, 128)
    wb = 1 if weight_dtype == "int8" else 2
    kb = 1 if kv_dtype == "int8" else 2

    n = Vpad * d * 2                           # token_embed
    n += L * 6 * d * 4                         # norms
    n += L * d * 2 * di * wb + L * 2 * di * 4  # in_w, in_s
    n += L * dc * di * 2 + L * di * 4          # conv_w, conv_b
    n += L * di * r * 2 + 2 * L * di * N * 2   # xp_dt, xp_B, xp_C
    n += L * r * di * 2 + L * di * 4           # dt_w, dt_b
    n += L * N * di * 4 + L * di * 4           # A, D
    n += L * di * d * wb + L * d * 4           # out_w, out_s
    n += L * d * d * wb + 2 * L * d * 4        # q_w, q_s, q_b
    n += H * d * 2                             # headmask
    n += 2 * L * B * d * Tmp * kb              # K, V
    n += 2 * L * B * d * 4                     # k_scale, v_scale
    n += B * Tmp * 4                           # mask_row
    n += L * d * d * wb + 2 * L * d * 4        # o_w, o_s, o_b
    n += 2 * L * B * d * 4                     # gamma, beta
    n += L * d * dff * wb + 2 * L * dff * 4    # ff1_w, ff1_s, ff1_b
    n += L * dff * d * wb + 2 * L * d * 4      # ff2_w, ff2_s, ff2_b
    n += 2 * d * 4                             # norm_out
    n += d * Vpad * 2 + Vpad * 4               # head_w, head_b

    # streamed blocks: Pallas double-buffers non-constant index maps
    n += 2 * (U * 1 * d * 2)                   # emb_pq row
    n += 2 * (U * B * Vpad * 4)                # logits out
    if sampled:
        n += 2 * (U * B * Vpad * 4)            # gumbel rows
    if teacher_force:
        n += 2 * (U * B * Vpad * 2)            # forced one-hot rows

    # persistent scratch
    n += B * Vpad * 2                          # one-hot last tokens
    n += L * (dc - 1) * B * di * 2             # conv state
    n += L * B * N * di * 4                    # SSM state
    return n


# residency ladder, fastest first: bf16 weights skip the per-use int8
# convert (~25% of step time); int8 K/V folds scales into the query /
# attention-output rows, adding only rounding noise (parity-tested).
_DTYPE_LADDER = (
    ("bfloat16", "bfloat16"),
    ("int8", "bfloat16"),
    ("int8", "int8"),
)


def megakernel_fit(
    cfg: DecoderConfig,
    batch: int,
    memory_len: int,
    unroll_steps: int = 1,
    sampled: bool = False,
    budget_bytes: Optional[int] = None,
) -> Optional[tuple]:
    """Fastest (weight_dtype, kv_dtype) whose residency fits VMEM, else None.

    Replaces the fixed B<=8 serving table: the fit is a function of batch
    AND memory length, so short voice prompts admit larger megakernel
    batches (e.g. B=16 at a 64-frame prompt bucket) while the flagship 3 s
    prompt reproduces the measured ladder (bf16<=2, int8 weights<=4,
    int8 K/V<=8).
    """
    budget = (TPU_VMEM_BYTES - _VMEM_MARGIN_BYTES
              if budget_bytes is None else budget_bytes)
    for wd, kvd in _DTYPE_LADDER:
        if plan_resident_bytes(cfg, batch, memory_len, wd, kvd,
                               unroll_steps, sampled) <= budget:
            return (wd, kvd)
    return None


def megakernel_max_batch(
    cfg: DecoderConfig,
    memory_len: int,
    unroll_steps: int = 1,
    sampled: bool = False,
    cap: int = 64,
) -> int:
    """Largest batch the megakernel can serve at ``memory_len`` (0 if none).

    Serving chunks big batches by this (infer.synthesize._run_chunked)."""
    b = 0
    while b < cap and megakernel_fit(
        cfg, b + 1, memory_len, unroll_steps, sampled
    ) is not None:
        b += 1
    return b


def _ln(x, scale, bias, eps=1e-6):
    """f32 LayerNorm over lanes; mirrors quant_decode._layer_norm."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def _dq_dot(x, w_q, scale, bias=None):
    """x (1, K) bf16 @ weight (K, N): f32 accumulate.

    int8 weights: per-use convert + per-channel dequant, the same op order
    as ops/int8_matvec's kernel.  bf16 weights (scale pre-folded by
    ``_build_plan``): a plain matmul — no per-use conversion traffic."""
    if w_q.dtype == jnp.int8:
        acc = jax.lax.dot_general(
            x, w_q.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = (acc * scale).astype(jnp.bfloat16)
    else:
        y = jax.lax.dot_general(
            x, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _silu(x):
    """x * sigmoid(x), sigmoid evaluated in f32 — Mosaic's bf16 ``logistic``
    lowering emits a type-mismatched vector.broadcast (f32 constant into a
    bf16 vector) and fails verification; explicit f32 exp avoids it."""
    xf = x.astype(jnp.float32)
    return (xf / (1.0 + jnp.exp(-xf))).astype(x.dtype)


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) with a rational-polynomial erf.

    Mosaic lowers neither ``erfc`` (jax.nn.gelu exact path) nor ``erf``, so
    the kernel evaluates Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 —
    three orders below the int8 path's own quantization noise; pinned by the
    parity tests, which compare against the true-erf step scan)."""
    xf = x.astype(jnp.float32)
    u = jnp.abs(xf) * (2.0 ** -0.5)
    t = 1.0 / (1.0 + 0.3275911 * u)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-u * u)
    erf = jnp.sign(xf) * erf_abs
    y = 0.5 * xf * (1.0 + erf)
    return y.astype(x.dtype)


def _make_kernel(cfg: DecoderConfig, bos_id: int, teacher_force: bool,
                 unroll_steps: int, batch: int, sample: bool):
    c = cfg
    m = c.with_mamba_dims().mamba
    L, d, di, N = c.n_layers, c.d_model, m.d_inner, m.d_state
    H = c.n_heads
    hd = d // H
    dc = m.d_conv
    B = batch
    att_scale = hd ** -0.5

    def kernel(*refs):
        if teacher_force:
            forced_ref, refs = refs[0], refs[1:]
        if sample:
            gumbel_ref, refs = refs[0], refs[1:]
        (
            emb_ref, te_ref, norms_ref, in_w_ref, in_s_ref, conv_w_ref,
            conv_b_ref, xp_dt_ref, xp_B_ref, xp_C_ref, dt_w_ref, dt_b_ref,
            A_ref, D_ref, out_w_ref, out_s_ref, q_w_ref, q_s_ref, q_b_ref,
            hm_ref, K_ref, V_ref, ks_ref, vs_ref, mask_ref, o_w_ref,
            o_s_ref, o_b_ref, gamma_ref,
            beta_ref, ff1_w_ref, ff1_s_ref, ff1_b_ref, ff2_w_ref, ff2_s_ref,
            ff2_b_ref, no_ref, head_w_ref, head_b_ref,
            logits_ref,
            oh_s, conv_s, ssm_s,
        ) = refs
        t = pl.program_id(0)
        Vpad = oh_s.shape[1]

        @pl.when(t == 0)
        def _():
            iota = jax.lax.broadcasted_iota(jnp.int32, (B, Vpad), 1)
            oh_s[:] = (iota == bos_id).astype(jnp.bfloat16)
            conv_s[:] = jnp.zeros_like(conv_s)
            ssm_s[:] = jnp.zeros_like(ssm_s)

        for u in range(unroll_steps):
            _decode_one(u, refs=refs,
                        forced_ref=forced_ref if teacher_force else None,
                        gumbel_ref=gumbel_ref if sample else None)

    def _decode_one(u, refs, forced_ref, gumbel_ref):
        (
            emb_ref, te_ref, norms_ref, in_w_ref, in_s_ref, conv_w_ref,
            conv_b_ref, xp_dt_ref, xp_B_ref, xp_C_ref, dt_w_ref, dt_b_ref,
            A_ref, D_ref, out_w_ref, out_s_ref, q_w_ref, q_s_ref, q_b_ref,
            hm_ref, K_ref, V_ref, ks_ref, vs_ref, mask_ref, o_w_ref,
            o_s_ref, o_b_ref, gamma_ref,
            beta_ref, ff1_w_ref, ff1_s_ref, ff1_b_ref, ff2_w_ref, ff2_s_ref,
            ff2_b_ref, no_ref, head_w_ref, head_b_ref,
            logits_ref,
            oh_s, conv_s, ssm_s,
        ) = refs

        # ---- embed: one-hot matmul + per-step pos/quant row -------------
        oh = forced_ref[u] if forced_ref is not None else oh_s[...]
        x = jax.lax.dot_general(
            oh, te_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + emb_ref[u]  # (B, d); emb row is shared

        kv_int8 = K_ref.dtype == jnp.int8
        hm = hm_ref[...]
        hm_f = hm.astype(jnp.float32)

        # The layer stack runs as a lax.fori_loop with DYNAMIC leading-dim
        # indexing into the stacked (L, ...) weight refs, so Mosaic code size
        # is ONE layer body instead of n_layers copies — this is what keeps
        # compile time flat in depth (the python-unrolled r2 kernel took
        # ~3.5 min at B=8 and crashed the remote-compile helper at B>=12).
        def _layer(l, x):
            nb = norms_ref[l]  # (6, d) f32
            # ---- Mamba step --------------------------------------------
            h = _ln(x, nb[0:1], nb[1:2])
            xz = _dq_dot(h, in_w_ref[l], in_s_ref[l])  # (B, 2*di)
            xin, z = xz[:, :di], xz[:, di:]
            # depthwise causal conv as per-tap MACs; taps k<dc-1 read the
            # ring state (L, dc-1, B, di), the last tap is this step's input
            conv_out = xin * conv_w_ref[l, dc - 1:dc]
            for k in range(dc - 1):
                conv_out = conv_out + (
                    conv_s[l, k].astype(xin.dtype) * conv_w_ref[l, k:k + 1]
                )
            conv_out = conv_out + conv_b_ref[l].astype(xin.dtype)
            for k in range(dc - 2):
                conv_s[l, k] = conv_s[l, k + 1]
            conv_s[l, dc - 2] = xin
            xc = _silu(conv_out)  # (B, di)
            # bf16-rounded projections, exactly as the step-scan path
            # (Mosaic requires a 32-bit matmul accumulator, so accumulate f32
            # and round to bf16 — same result as XLA's bf16-out dot)
            def _dot_bf16(a, w):
                return jax.lax.dot_general(
                    a, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

            dt_raw = _dot_bf16(xc, xp_dt_ref[l])  # (B, r) bf16
            Bm = _dot_bf16(xc, xp_B_ref[l]).astype(jnp.float32)  # (B, N)
            Cm = _dot_bf16(xc, xp_C_ref[l]).astype(jnp.float32)
            dt = jax.nn.softplus(
                _dot_bf16(dt_raw, dt_w_ref[l]).astype(jnp.float32)
                + dt_b_ref[l]
            )  # (B, di) f32
            dtx = dt * xc.astype(jnp.float32)
            # state update vectorized over B as broadcast VPU ops on
            # (B, N, di) — rank-1 per sequence, no per-b code replication:
            #   h_new = exp(dt (x) A) * h + Bm (x) (dt * x)
            #   y     = sum_n Cm[:, n] * h_new[:, n]   (f32 throughout)
            a = jnp.exp(dt[:, None, :] * A_ref[l][None, :, :])  # (B, N, di)
            b_in = Bm[:, :, None] * dtx[:, None, :]             # (B, N, di)
            h_new = a * ssm_s[l] + b_in
            ssm_s[l] = h_new
            y = (Cm[:, :, None] * h_new).sum(axis=1)            # (B, di)
            y = (y + xc.astype(jnp.float32) * D_ref[l]).astype(jnp.bfloat16)
            y = y * _silu(z)
            x = x + _dq_dot(y, out_w_ref[l], out_s_ref[l])

            # ---- 1-query cross-attention, all heads on sublanes ---------
            # Q8 row h carries head h's q channels (zeros elsewhere), so one
            # (H, d) @ (d, Tmp) matmul yields every head's scores; the
            # all-heads V contraction computes an (H, d) block matrix whose
            # diagonal blocks (selected by headmask) are the per-head outputs.
            # Sequences have distinct memories, so scores/outputs loop over
            # B — but all B*H softmax rows run as ONE vectorized op.
            h = _ln(x, nb[2:3], nb[3:4])
            q_all = _dq_dot(h, q_w_ref[l], q_s_ref[l], q_b_ref[l])  # (B, d)
            Ss = []
            for b in range(B):
                q_b = q_all[b:b + 1]
                if kv_int8:  # fold K's per-channel scale into q (contraction
                    # runs over channels, so scaling q is exact)
                    q_b = (q_b.astype(jnp.float32)
                           * ks_ref[l, b]).astype(jnp.bfloat16)
                Q8 = hm * q_b  # (H, d) block-diag rows
                Ss.append(jax.lax.dot_general(
                    Q8, K_ref[l, b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * att_scale + mask_ref[b:b + 1])  # (H, Tmp)
            S = Ss[0] if B == 1 else jnp.concatenate(Ss, axis=0)
            P = jax.nn.softmax(S, axis=1).astype(jnp.bfloat16)  # (B*H, Tmp)
            outs = []
            for b in range(B):
                O = jax.lax.dot_general(
                    P[b * H:(b + 1) * H], V_ref[l, b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (H, d); [h, c] = head-h weights applied to head(c)'s V
                o_row = (O * hm_f).sum(axis=0, keepdims=True)
                if kv_int8:  # V's per-channel scale applies to the output row
                    o_row = o_row * vs_ref[l, b]
                outs.append(o_row)
            attn = (outs[0] if B == 1
                    else jnp.concatenate(outs, axis=0)).astype(jnp.bfloat16)
            x = x + _dq_dot(attn, o_w_ref[l], o_s_ref[l], o_b_ref[l])

            # ---- FiLM FFN ----------------------------------------------
            h = _ln(x, nb[4:5], nb[5:6])
            h = gamma_ref[l].astype(h.dtype) * h + beta_ref[l].astype(h.dtype)
            h1 = _gelu_exact(_dq_dot(h, ff1_w_ref[l], ff1_s_ref[l], ff1_b_ref[l]))
            x = x + _dq_dot(h1, ff2_w_ref[l], ff2_s_ref[l], ff2_b_ref[l])
            return x

        x = jax.lax.fori_loop(0, L, _layer, x)

        # ---- vocab head + greedy token ----------------------------------
        xf = _ln(x, no_ref[0:1], no_ref[1:2]).astype(jnp.bfloat16)
        logits = jax.lax.dot_general(
            xf, head_w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + head_b_ref[...]  # (B, Vpad) f32, masked at specials/pads
        logits_ref[u] = logits
        if forced_ref is None:
            # greedy argmax, or Gumbel-max categorical sampling when a
            # temperature-scaled noise stream rides along (the argmax of
            # logits/T + g equals that of logits + T*g; the noise is
            # jax.random.gumbel generated OUTSIDE the kernel, streamed one
            # (B, Vpad) row per step, so sampling numerics are ordinary
            # jax.random and the kernel stays interpret-mode testable)
            choice = logits + gumbel_ref[u] if gumbel_ref is not None else logits
            mx = choice.max(axis=1, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, choice.shape, 1)
            idx = jnp.where(choice == mx, iota, jnp.int32(2 ** 30)).min(
                axis=1, keepdims=True
            )  # first argmax per row, (B, 1)
            oh_s[:] = (iota == idx).astype(jnp.bfloat16)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "frames_per_stream", "interpret", "unroll_steps"),
)
def _megakernel_call(cfg: DecoderConfig, plan: _Plan, frames_per_stream: int,
                     interpret: bool, forced_oh: Optional[jax.Array] = None,
                     unroll_steps: int = 1,
                     gumbel: Optional[jax.Array] = None):
    c = cfg
    total = c.num_quantizers * frames_per_stream
    Vpad = plan.token_embed.shape[0]
    m = c.with_mamba_dims().mamba
    L, di, N = c.n_layers, m.d_inner, m.d_state
    B = plan.K.shape[1]
    teacher_force = forced_oh is not None
    U = unroll_steps
    if total % U:
        raise ValueError(f"unroll_steps={U} must divide total={total}")

    def const_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(
            arr.shape, lambda t, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM
        )

    def step_spec(arr):
        # streamed per-step rows ride a (total, B, d) layout: the TPU
        # lowering requires the LAST TWO block dims to divide (8, 128) or
        # equal the array dims, so the step axis must be a leading dim.
        # Each grid step covers U consecutive token rows.
        return pl.BlockSpec((U,) + arr.shape[1:], lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    operands = []
    in_specs = []
    if teacher_force:
        operands.append(forced_oh)  # (total, B, Vpad)
        in_specs.append(step_spec(operands[-1]))
    if gumbel is not None:
        operands.append(gumbel)  # (total, B, Vpad) f32, already T-scaled
        in_specs.append(step_spec(operands[-1]))
    for name, arr in plan._asdict().items():
        if name == "emb_pq":
            operands.append(arr[:, None, :])
            in_specs.append(step_spec(operands[-1]))
        else:
            operands.append(arr)
            in_specs.append(const_spec(arr))

    logits = pl.pallas_call(
        _make_kernel(c, c.bos_id, teacher_force, U, B, gumbel is not None),
        grid=(total // U,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((U, B, Vpad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, B, Vpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, Vpad), jnp.bfloat16),        # one-hot last tokens
            pltpu.VMEM((L, m.d_conv - 1, B, di), jnp.bfloat16),  # conv state
            pltpu.VMEM((L, B, N, di), jnp.float32),     # SSM state
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=TPU_VMEM_BYTES,
        ),
        interpret=interpret,
    )(*operands)
    return logits


def megakernel_greedy_decode(
    decoder: MambaTTSDecoder,
    variables,
    qparams: dict,
    text_hidden: jax.Array,
    z_style: jax.Array,
    frames_per_stream: int,
    text_mask: Optional[jax.Array] = None,
    ref_hidden: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    collect_logits: bool = False,
    interpret: Optional[bool] = None,
    forced_tokens: Optional[jax.Array] = None,
    unroll_steps: int = 1,
    weight_dtype: str = "bfloat16",
    kv_dtype: str = "bfloat16",
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    weight_plan: Optional[_WeightPlan] = None,
) -> DecodeResult:
    """Greedy (or Gumbel-max sampled) decode of the full utterance in one
    fused Pallas kernel.

    Same contract as ``infer.quant_decode.greedy_decode_int8``.
    ``temperature > 0`` samples categorically via streamed pre-scaled
    jax.random.gumbel noise (distribution-identical to the step scan's
    ``categorical``; the RNG stream differs — one (total, B, V) draw instead
    of per-step key splits).  B=1 is the latency serving shape; small batches ride the
    same kernel (activation rows batch on sublanes, attention/SSM state
    updates loop per sequence) — but per-sequence K/V must stay VMEM-resident
    (~5.3 MB per sequence per layer at the flagship memory length in bf16),
    so shrink residency as B grows: ``weight_dtype="int8"`` (B<=4 flagship)
    and/or ``kv_dtype="int8"`` (halves K/V; B=8 fits with bf16 weights).
    ``interpret=None`` auto-selects interpret mode off-TPU so CPU tests run
    the identical kernel code.

    ``forced_tokens`` (total,) or (B, total) switches to teacher forcing:
    step t embeds ``forced_tokens[..., t]`` instead of the previous argmax
    (tests pin per-step logits against the step-scan path without feedback
    divergence).
    """
    c = decoder.cfg
    B = text_hidden.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    total = c.num_quantizers * frames_per_stream
    while total % unroll_steps:  # largest feasible unroll <= requested
        unroll_steps -= 1

    # Callers close weights + conditioning over an outer jit (serving bakes
    # them per checkpoint), which makes every input here a compile-time
    # constant — and XLA then CONSTANT-FOLDS project_memories + the whole
    # quantized plan on the compiler host: tens of GFLOPs of K/V projections
    # that scale with batch (measured: B=1 compile 80 s, B=8 >10 min).  The
    # megakernel's VMEM residency comes from its constant-index BlockSpecs,
    # not from folded constants, so breaking the fold costs ~nothing at run
    # time (plan construction is a few ms of on-device work per call).
    barrier = [variables, qparams, text_hidden, z_style]
    barrier += [x for x in (text_mask, ref_hidden, ref_mask, weight_plan)
                if x is not None]
    barrier = list(jax.lax.optimization_barrier(tuple(barrier)))
    variables, qparams, text_hidden, z_style = barrier[:4]
    it = iter(barrier[4:])
    text_mask = next(it) if text_mask is not None else None
    ref_hidden = next(it) if ref_hidden is not None else None
    ref_mask = next(it) if ref_mask is not None else None
    weight_plan = next(it) if weight_plan is not None else None

    KV, memory_mask, films = decoder.apply(
        variables, text_hidden, text_mask, ref_hidden, ref_mask, z_style,
        method=MambaTTSDecoder.project_memories,
    )
    plan = _build_plan(c, qparams, KV, memory_mask, films, frames_per_stream,
                       weight_dtype=weight_dtype, kv_dtype=kv_dtype,
                       weight_plan=weight_plan)
    Vpad = plan.token_embed.shape[0]
    forced_oh = None
    if forced_tokens is not None:
        ft = jnp.atleast_2d(forced_tokens)  # (B, total)
        forced_oh = jax.nn.one_hot(ft.T, Vpad, dtype=jnp.bfloat16)
    gumbel = None
    if temperature > 0.0:
        # Gumbel-max categorical sampling: argmax(logits/T + g) has the same
        # distribution as categorical(logits/T); equivalently argmax of
        # logits + T*g, so the kernel adds a pre-scaled streamed noise row.
        if rng is None:
            raise ValueError("temperature > 0 requires an rng key")
        gumbel = temperature * jax.random.gumbel(
            rng, (total, B, Vpad), jnp.float32
        )
    logits = _megakernel_call(c, plan, frames_per_stream, interpret, forced_oh,
                              unroll_steps=unroll_steps,
                              gumbel=gumbel)  # (total, B, Vpad)
    choice = logits if gumbel is None else logits + gumbel
    tokens = jnp.argmax(choice, axis=2).astype(jnp.int32).T  # (B, total)
    if collect_logits:
        return DecodeResult(
            tokens=tokens,
            logits=jnp.transpose(logits, (1, 0, 2))[:, :, : c.vocab_size_audio],
        )
    return DecodeResult(tokens=tokens, logits=jnp.zeros((B, 0)))
