"""Benchmark: autoregressive decode throughput on the flagship decoder.

Prints ONE JSON line:
    {"metric": "decode_tokens_per_sec_per_chip", "value": N,
     "unit": "tokens/s", "vs_baseline": N / 5000}

Scenario (the synthesis hot path, BASELINE.md north-star): greedy-decode a
full 12.8 s utterance — 1024 codec frames x 5 quantizer streams = 5120 audio
tokens — conditioned on a 3 s voice prompt (240 frames x 5 = 1200 reference
tokens) and a 50-phoneme text, batch 1, on one chip.  RTF = wall / 12.8 s.

Extras include the roofline accounting: AR decode at small batch is HBM
-bandwidth-bound (every step re-reads all weights + the per-example memory
K/V), so the meaningful utilization number is achieved bytes/s vs peak HBM
bandwidth; MFU is reported too (it is inherently tiny for matvec decode).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# TPU v5e (this bench's target chip): 819 GB/s HBM, 197 bf16 TFLOP/s.
HBM_PEAK = 819e9
FLOPS_PEAK = 197e12


def _cast_params_bf16(params):
    """Cast f32 params to bf16 for the bandwidth-bound decode, except the
    small f32 vocab head."""

    def cast(path, x):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        if "head" in path_str or x.dtype != jnp.float32:
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def main():
    from __graft_entry__ import _flagship_cfg
    from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode

    cfg = _flagship_cfg()
    dec = MambaTTSDecoder(cfg)

    B = 1
    F = 1024  # frames per stream (12.8 s of audio)
    Q = cfg.num_quantizers
    T_text, T_ref = 50, 1200  # 3 s voice prompt x 5 streams

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    audio_tokens = jax.random.randint(ks[0], (B, Q, 8), 2, cfg.vocab_size_audio)
    text_hidden = jax.random.normal(ks[1], (B, T_text, cfg.d_model), jnp.bfloat16)
    z_style = jax.random.normal(ks[2], (B, cfg.d_style), jnp.bfloat16)
    ref_hidden = jax.random.normal(ks[3], (B, T_ref, cfg.d_model), jnp.bfloat16)
    text_mask = jnp.ones((B, T_text), bool)
    ref_mask = jnp.ones((B, T_ref), bool)

    variables = dec.init(
        ks[4], audio_tokens, text_hidden, z_style, text_mask, ref_hidden, ref_mask
    )
    variables = {"params": _cast_params_bf16(variables["params"])}

    def decode(variables, text_hidden, z_style, text_mask, ref_hidden, ref_mask):
        # unroll=4 wins at B=1 (weight-streaming overlap); batched decode is
        # KV-bound and prefers no unrolling.
        unroll = 4 if text_hidden.shape[0] == 1 else 1
        return greedy_decode(
            dec, variables, text_hidden, z_style, F,
            text_mask=text_mask, ref_hidden=ref_hidden, ref_mask=ref_mask,
            unroll=unroll,
        ).tokens

    decode_jit = jax.jit(decode)
    args = (variables, text_hidden, z_style, text_mask, ref_hidden, ref_mask)

    # device_get (not block_until_ready) — the tunneled TPU backend's
    # block_until_ready does not reliably block.
    jax.device_get(decode_jit(*args))  # compile + warm-up

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(decode_jit(*args))
        best = min(best, time.perf_counter() - t0)

    # Batched synthesis throughput (production serving shape).
    batched_tps = None
    try:
        B8 = 8
        th8 = jnp.broadcast_to(text_hidden, (B8, T_text, cfg.d_model))
        z8 = jnp.broadcast_to(z_style, (B8, cfg.d_style))
        rh8 = jnp.broadcast_to(ref_hidden, (B8, T_ref, cfg.d_model))
        tm8 = jnp.ones((B8, T_text), bool)
        rm8 = jnp.ones((B8, T_ref), bool)
        args8 = (variables, th8, z8, tm8, rh8, rm8)
        jax.device_get(decode_jit(*args8))
        best8 = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(decode_jit(*args8))
            best8 = min(best8, time.perf_counter() - t0)
        batched_tps = round(B8 * Q * F / best8, 1)
    except Exception:
        pass

    total_tokens = B * Q * F
    tps = total_tokens / best
    audio_seconds = F / 80.0  # 80 codec frames per second
    rtf = best / audio_seconds

    # ---- roofline accounting (per decode step = one token per sequence) ---
    def _bytes(t):
        return int(t.size) * t.dtype.itemsize

    param_bytes = sum(_bytes(p) for p in jax.tree.leaves(variables))
    # per-layer memory K/V, read per step per example (bf16)
    kv_bytes_per_example = cfg.n_layers * 2 * (T_ref + T_text) * cfg.d_model * 2
    # SSM state + conv ring buffer carried per step (f32 h, read+write)
    m = cfg.with_mamba_dims().mamba
    state_bytes_per_example = cfg.n_layers * (
        2 * m.d_state * m.d_inner * 4 + m.d_conv * m.d_inner * 2
    )
    matmul_params = sum(
        p.size for path, p in jax.tree_util.tree_leaves_with_path(variables)
        if p.ndim >= 2
    )

    def roofline(batch, wall, steps):
        step_bytes = param_bytes + batch * (kv_bytes_per_example + state_bytes_per_example)
        achieved_bw = step_bytes * steps / wall
        flops_step = batch * (
            2 * matmul_params + cfg.n_layers * 2 * 2 * (T_ref + T_text) * cfg.d_model
        )
        return {
            "achieved_gb_per_s": round(achieved_bw / 1e9, 1),
            "hbm_roofline_frac": round(achieved_bw / HBM_PEAK, 3),
            "mfu": round(flops_step * steps / wall / FLOPS_PEAK, 4),
        }

    result = {
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tps / 5000.0, 3),
        "extra": {
            "rtf": round(rtf, 4),
            "wall_s": round(best, 3),
            "tokens": total_tokens,
            "batch": B,
            "vocab": cfg.vocab_size_audio,
            "batched_tokens_per_sec_b8": batched_tps,
            "roofline_b1": roofline(1, best, Q * F),
            "roofline_b8": (
                roofline(8, 8 * Q * F / batched_tps, Q * F) if batched_tps else None
            ),
            "param_mb": round(param_bytes / 1e6, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
