"""Batched-decode sweep: tokens/s vs batch size and scan unroll.

B=8 serving decode is K/V-traffic-bound (see docs/DESIGN.md roofline); this
sweep measures whether unrolling the decode scan lets XLA amortize the K/V
reads across adjacent steps, and where the throughput-per-chip sweet spot
sits.  Prints one JSON line per configuration.

    python -m benchmarks.batched_decode_bench [--frames 1024]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--batches", type=str, default="1,4,8,16")
    parser.add_argument("--unrolls", type=str, default="1,2,4,8")
    args = parser.parse_args()

    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_cfg
    from bench import _cast_params_bf16
    from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode

    cfg = _flagship_cfg()
    dec = MambaTTSDecoder(cfg)
    F = args.frames
    Q = cfg.num_quantizers
    T_text, T_ref = 50, 1200

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    audio_tokens = jax.random.randint(ks[0], (1, Q, 8), 2, cfg.vocab_size_audio)
    th1 = jax.random.normal(ks[1], (1, T_text, cfg.d_model), jnp.bfloat16)
    z1 = jax.random.normal(ks[2], (1, cfg.d_style), jnp.bfloat16)
    rh1 = jax.random.normal(ks[3], (1, T_ref, cfg.d_model), jnp.bfloat16)
    variables = dec.init(
        ks[4], audio_tokens, th1, z1, jnp.ones((1, T_text), bool), rh1,
        jnp.ones((1, T_ref), bool),
    )
    variables = {"params": _cast_params_bf16(variables["params"])}

    for B in [int(x) for x in args.batches.split(",")]:
        th = jnp.broadcast_to(th1, (B, T_text, cfg.d_model))
        z = jnp.broadcast_to(z1, (B, cfg.d_style))
        rh = jnp.broadcast_to(rh1, (B, T_ref, cfg.d_model))
        tm = jnp.ones((B, T_text), bool)
        rm = jnp.ones((B, T_ref), bool)
        for unroll in [int(x) for x in args.unrolls.split(",")]:
            fn = jax.jit(
                lambda v, th, z, tm, rh, rm, u=unroll: greedy_decode(
                    dec, v, th, z, F, text_mask=tm, ref_hidden=rh, ref_mask=rm,
                    unroll=u,
                ).tokens
            )
            a = (variables, th, z, tm, rh, rm)
            jax.device_get(fn(*a))  # compile + warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                jax.device_get(fn(*a))
                best = min(best, time.perf_counter() - t0)
            tps = B * Q * F / best
            print(json.dumps({
                "batch": B, "unroll": unroll, "tokens_per_sec": round(tps, 1),
                "wall_s": round(best, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
