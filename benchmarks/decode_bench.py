"""Decode throughput/latency sweep (reproduces README perf numbers).

    python benchmarks/decode_bench.py [--batches 1 2 4 8] [--frames 1024]

Per batch size: tokens/s/chip, RTF per stream, ms/token.  Timing uses
jax.device_get (the tunneled backend's block_until_ready does not block) and
token-only outputs (the tunnel ships call outputs at ~0.4 GB/s).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--ref_frames", type=int, default=240)
    parser.add_argument("--text_len", type=int, default=50)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from __graft_entry__ import _flagship_cfg
    from bench import _cast_params_bf16
    from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode

    cfg = _flagship_cfg()
    dec = MambaTTSDecoder(cfg)
    Q, F = cfg.num_quantizers, args.frames
    T_ref = args.ref_frames * Q

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    init_tokens = jax.random.randint(ks[0], (1, Q, 8), 2, cfg.vocab_size_audio)
    th1 = jax.random.normal(ks[1], (1, args.text_len, cfg.d_model), jnp.bfloat16)
    z1 = jax.random.normal(ks[2], (1, cfg.d_style), jnp.bfloat16)
    rh1 = jax.random.normal(ks[3], (1, T_ref, cfg.d_model), jnp.bfloat16)
    variables = dec.init(
        ks[4], init_tokens, th1, z1, jnp.ones((1, args.text_len), bool), rh1,
        jnp.ones((1, T_ref), bool),
    )
    variables = {"params": _cast_params_bf16(variables["params"])}

    results = []
    for B in args.batches:
        th = jnp.broadcast_to(th1, (B, args.text_len, cfg.d_model))
        z = jnp.broadcast_to(z1, (B, cfg.d_style))
        rh = jnp.broadcast_to(rh1, (B, T_ref, cfg.d_model))
        tm = jnp.ones((B, args.text_len), bool)
        rm = jnp.ones((B, T_ref), bool)
        unroll = 4 if B == 1 else 1

        f = jax.jit(
            lambda v, th, z, tm, rh, rm: greedy_decode(
                dec, v, th, z, F, text_mask=tm, ref_hidden=rh, ref_mask=rm,
                unroll=unroll,
            ).tokens
        )
        jax.device_get(f(variables, th, z, tm, rh, rm))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.device_get(f(variables, th, z, tm, rh, rm))
            best = min(best, time.perf_counter() - t0)
        tokens = B * Q * F
        row = {
            "batch": B,
            "tokens_per_sec": round(tokens / best, 1),
            "rtf_per_stream": round(best / (F / 80.0), 4),
            "us_per_step": round(best / (Q * F) * 1e6, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
