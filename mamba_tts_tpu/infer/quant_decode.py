"""Int8 weight-streaming greedy decode (serving fast path).

The standard decode (models/decoder.py greedy_decode) streams bf16 weights
at ~86% of v5e HBM peak — bandwidth-bound, so the remaining speedup must
come from fewer bytes.  This module decodes with the big per-step matvecs
(mamba in/out projections, attention q/o, FFN) streamed as INT8 via the
Pallas kernel in ops/int8_matvec.py, halving the dominant traffic term.
The numerically sensitive small tensors stay full precision: x_proj/dt_proj
(SSM dynamics), conv taps, A/D, LayerNorms, embeddings (gathers), and the
f32 vocab head.

The step function mirrors MambaTTSDecoder.step_with_kv / MambaBlock.step /
CrossAttention.attend exactly (same op order, same f32 accumulation points);
``tests/test_quant_decode.py`` pins the hand-rolled step against the module
path with dequantized weights.

Usage:
    qparams = quantize_decoder_params(variables["params"], cfg)
    res = greedy_decode_int8(decoder, variables, qparams, text_hidden,
                             z_style, frames, ...)
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mamba_tts_tpu.config import DecoderConfig
from mamba_tts_tpu.models.decoder import DecodeResult, MambaTTSDecoder
from mamba_tts_tpu.models.mamba import MambaState, init_mamba_state
from mamba_tts_tpu.ops.int8_matvec import int8_matvec, quantize_weight
from mamba_tts_tpu.ops.selective_scan import selective_scan_step


def _q(kernel) -> dict:
    w_q, scale = quantize_weight(jnp.asarray(kernel))
    return {"w_q": w_q, "scale": scale}


def quantize_decoder_params(params, cfg: DecoderConfig) -> dict:
    """Flax MambaTTSDecoder params -> int8 decode tree.  Non-quantized
    tensors are stored at the decoder compute dtype."""
    bf = jnp.dtype(cfg.dtype)

    def ln(p):
        return {"scale": jnp.asarray(p["scale"], jnp.float32),
                "bias": jnp.asarray(p["bias"], jnp.float32)}

    layers = []
    for i in range(cfg.n_layers):
        lp = params[f"layer_{i}"]
        m, ca = lp["mamba"], lp["cross_attn"]
        layers.append({
            "norm_mamba": ln(lp["norm_mamba"]),
            "norm_cross": ln(lp["norm_cross"]),
            "norm_ff": ln(lp["norm_ff"]),
            "in_proj": _q(m["in_proj"]["kernel"]),
            "conv_w": jnp.asarray(m["conv_w"], bf),
            "conv_b": jnp.asarray(m["conv_b"], bf) if "conv_b" in m else None,
            "x_proj_k": jnp.asarray(m["x_proj"]["kernel"], bf),
            "dt_proj_k": jnp.asarray(m["dt_proj"]["kernel"], bf),
            "dt_proj_b": jnp.asarray(m["dt_proj"]["bias"], jnp.float32),
            "A": -jnp.exp(jnp.asarray(m["A_log"], jnp.float32)),
            "D": jnp.asarray(m["D"], jnp.float32),
            "out_proj": _q(m["out_proj"]["kernel"]),
            "q_proj": {**_q(ca["q_proj"]["kernel"]),
                       "bias": jnp.asarray(ca["q_proj"]["bias"], jnp.float32)},
            "o_proj": {**_q(ca["o_proj"]["kernel"]),
                       "bias": jnp.asarray(ca["o_proj"]["bias"], jnp.float32)},
            "ff1": {**_q(lp["ff1"]["kernel"]),
                    "bias": jnp.asarray(lp["ff1"]["bias"], jnp.float32)},
            "ff2": {**_q(lp["ff2"]["kernel"]),
                    "bias": jnp.asarray(lp["ff2"]["bias"], jnp.float32)},
        })
    return {
        "token_embed": jnp.asarray(params["token_embed"]["embedding"], bf),
        "pos_embed": jnp.asarray(params["pos_embed"]["embedding"], bf),
        "quant_embed": jnp.asarray(params["quant_embed"]["embedding"], bf),
        "layers": layers,
        "norm_out": {"scale": jnp.asarray(params["norm_out"]["scale"], jnp.float32),
                     "bias": jnp.asarray(params["norm_out"]["bias"], jnp.float32)},
        "head_k": jnp.asarray(params["head"]["kernel"], jnp.float32),
        "head_b": jnp.asarray(params["head"]["bias"], jnp.float32),
    }


def _layer_norm(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _mv(x, q, dtype=jnp.bfloat16):
    return int8_matvec(x, q["w_q"], q["scale"], bias=q.get("bias"), out_dtype=dtype)


def _mamba_step(lp, x_t, state: MambaState, cfg: DecoderConfig):
    """Mirror of MambaBlock.step with int8 in/out projections. x_t: (B, d)."""
    dt_c = jnp.dtype(cfg.dtype)
    m = cfg.with_mamba_dims().mamba
    xz = _mv(x_t, lp["in_proj"], dt_c)  # (B, 2*d_inner)
    xin, z = jnp.split(xz, 2, axis=-1)
    window = jnp.concatenate([state.conv.astype(xin.dtype), xin[:, None]], axis=1)
    conv_out = jnp.einsum("bkd,kd->bd", window, lp["conv_w"].astype(xin.dtype))
    if lp["conv_b"] is not None:
        conv_out = conv_out + lp["conv_b"].astype(xin.dtype)
    x_conv = jax.nn.silu(conv_out)
    r = m.dt_rank_actual
    proj = x_conv @ lp["x_proj_k"]
    dt_raw, Bm, Cm = jnp.split(proj, [r, r + m.d_state], axis=-1)
    dt = jax.nn.softplus(
        (dt_raw @ lp["dt_proj_k"]).astype(jnp.float32) + lp["dt_proj_b"]
    )
    y, ssm_state = selective_scan_step(x_conv, dt, lp["A"], Bm, Cm, lp["D"], state.ssm)
    y = y * jax.nn.silu(z)
    out = _mv(y, lp["out_proj"], dt_c)
    return out, MambaState(conv=window[:, 1:], ssm=ssm_state)


def quantize_kv(KV):
    """Per-(batch, head, channel) symmetric int8 over the memory axis.

    Both attention contractions run over the memory axis T, so the scales
    attach to the NON-contracted hd axis: K's scale folds into q BEFORE the
    q.K dot, V's scale applies AFTER the probs.V dot — the dots read int8
    tensors directly (XLA fuses the int8->bf16 convert into the dot operand),
    halving the dominant K/V traffic of batched decode.
    """
    out = []
    for K, V in KV:
        ks = jnp.maximum(jnp.abs(K.astype(jnp.float32)).max(axis=2, keepdims=True), 1e-8) / 127.0
        vs = jnp.maximum(jnp.abs(V.astype(jnp.float32)).max(axis=2, keepdims=True), 1e-8) / 127.0
        k_q = jnp.clip(jnp.round(K.astype(jnp.float32) / ks), -127, 127).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(V.astype(jnp.float32) / vs), -127, 127).astype(jnp.int8)
        out.append({"k_q": k_q, "k_s": ks, "v_q": v_q, "v_s": vs})
    return out


def _attend_step(lp, x_t, KVe, memory_mask, cfg: DecoderConfig):
    """1-query attention against precomputed K/V (naive path of
    CrossAttention.attend), q/o projections int8; K/V either full-precision
    (K, V) tuples or int8 dicts from :func:`quantize_kv`. x_t: (B, d)."""
    B, d = x_t.shape
    dt_c = jnp.dtype(cfg.dtype)
    H = cfg.n_heads
    hd = d // H
    q = _mv(x_t, lp["q_proj"], dt_c).reshape(B, H, 1, hd)
    scale = hd ** -0.5
    if isinstance(KVe, dict):
        # fold K's per-channel scale (B,H,1,hd) into the single query row
        qk = (q.astype(jnp.float32) * KVe["k_s"]).astype(dt_c)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qk, KVe["k_q"].astype(dt_c),
            preferred_element_type=jnp.float32,
        ) * scale
    else:
        K, _ = KVe
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, K, preferred_element_type=jnp.float32
        ) * scale
    if memory_mask is not None:
        logits = logits + jnp.where(memory_mask[:, None, None, :], 0.0, -1e9)
    if isinstance(KVe, dict):
        probs = jax.nn.softmax(logits, axis=-1).astype(dt_c)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, KVe["v_q"].astype(dt_c))
        out = (out.astype(jnp.float32) * KVe["v_s"]).astype(dt_c).reshape(B, d)
    else:
        _, V = KVe
        probs = jax.nn.softmax(logits, axis=-1).astype(V.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, V).reshape(B, d)
    return _mv(out, lp["o_proj"], dt_c)


def quant_step_with_kv(
    qparams: dict,
    cfg: DecoderConfig,
    last_token: jax.Array,  # (B, 1)
    KV,
    memory_mask,
    films,
    states: List[MambaState],
    step_index: jax.Array,
    frames_per_stream: int,
) -> Tuple[jax.Array, List[MambaState]]:
    """Int8 mirror of MambaTTSDecoder.step_with_kv; logits (B, 1, V)."""
    step = jnp.asarray(step_index, jnp.int32)
    q_id = jnp.minimum(step // frames_per_stream, cfg.num_quantizers - 1)
    pos_id = step % frames_per_stream
    x = (
        qparams["token_embed"][last_token[:, 0]]
        + qparams["pos_embed"][pos_id]
        + qparams["quant_embed"][q_id]
    ).astype(jnp.dtype(cfg.dtype))  # (B, d)
    new_states = []
    for lp, KVe, (gamma, beta), st in zip(qparams["layers"], KV, films, states):
        h, ns = _mamba_step(lp, _layer_norm(x, lp["norm_mamba"]), st, cfg)
        x = x + h
        x = x + _attend_step(lp, _layer_norm(x, lp["norm_cross"]), KVe, memory_mask, cfg)
        h = _layer_norm(x, lp["norm_ff"])
        h = gamma.astype(h.dtype) * h + beta.astype(h.dtype)  # FiLM (B, d)
        h = jax.nn.gelu(_mv(h, lp["ff1"], jnp.dtype(cfg.dtype)), approximate=False)
        x = x + _mv(h, lp["ff2"], jnp.dtype(cfg.dtype))
        new_states.append(ns)
    xf = _layer_norm(x, qparams["norm_out"]).astype(jnp.float32)
    logits = xf @ qparams["head_k"] + qparams["head_b"]
    return logits[:, None, :], new_states


def greedy_decode_int8(
    decoder: MambaTTSDecoder,
    variables,
    qparams: dict,
    text_hidden: jax.Array,
    z_style: jax.Array,
    frames_per_stream: int,
    text_mask: Optional[jax.Array] = None,
    ref_hidden: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    collect_logits: bool = False,
    unroll: int = 4,
    int8_kv: bool = False,
) -> DecodeResult:
    """greedy_decode with the int8 step.  Memory K/V, mask, and FiLM are
    projected once at full precision (outside the scan, exactly as the bf16
    path does).  ``int8_kv`` additionally quantizes the per-layer K/V to
    int8 (per-channel, see :func:`quantize_kv`) — the dominant traffic term
    of BATCHED decode (B x 20.5 MB re-read per step at flagship shape)."""
    c = decoder.cfg
    B = text_hidden.shape[0]
    total = c.num_quantizers * frames_per_stream

    KV, memory_mask, films = decoder.apply(
        variables, text_hidden, text_mask, ref_hidden, ref_mask, z_style,
        method=MambaTTSDecoder.project_memories,
    )
    if int8_kv:
        KV = quantize_kv(KV)
    cc = c.with_mamba_dims()
    states0 = [
        init_mamba_state(cc.mamba, B, dtype=jnp.dtype(c.dtype))
        for _ in range(c.n_layers)
    ]
    token0 = jnp.full((B, 1), c.bos_id, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, step):
        token, states, key = carry
        logits, new_states = quant_step_with_kv(
            qparams, c, token, KV, memory_mask, films, states, step, frames_per_stream
        )
        step_logits = logits[:, 0]
        step_logits = step_logits.at[:, : c.num_special_tokens].set(-1e9)
        if temperature > 0.0:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, step_logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(step_logits, axis=-1)
        nxt = nxt.astype(jnp.int32)[:, None]
        out = (nxt[:, 0], step_logits) if collect_logits else (nxt[:, 0], jnp.zeros((B, 0)))
        return (nxt, new_states, key), out

    (_, _, _), (tokens, logits) = jax.lax.scan(
        body, (token0, states0, rng), jnp.arange(total), unroll=unroll
    )
    return DecodeResult(tokens=tokens.T, logits=jnp.moveaxis(logits, 0, 1))
