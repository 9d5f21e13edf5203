"""Selective-scan kernel benchmark: Pallas vs XLA chunked, fwd and fwd+bwd.

    python benchmarks/scan_bench.py [--batch 8 --seq 5120 --dim 1024]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=5120)
    parser.add_argument("--dim", type=int, default=1024)
    parser.add_argument("--state", type=int, default=16)
    parser.add_argument("--chunk", type=int, default=64)
    parser.add_argument("--block_d", type=int, default=256)
    parser.add_argument("--with_bwd", action="store_true")
    args = parser.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from mamba_tts_tpu.ops.pallas_scan import selective_scan_pallas
    from mamba_tts_tpu.ops.selective_scan import selective_scan_chunked

    Bz, T, D, N = args.batch, args.seq, args.dim, args.state
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    u = jax.random.normal(ks[0], (Bz, T, D), jnp.bfloat16)
    delta = jax.nn.softplus(jax.random.normal(ks[1], (Bz, T, D), jnp.bfloat16) - 4)
    A = -jnp.exp(jax.random.normal(ks[2], (D, N)))
    B = jax.random.normal(ks[3], (Bz, T, N), jnp.bfloat16)
    C = jax.random.normal(ks[4], (Bz, T, N), jnp.bfloat16)
    Dk = jax.random.normal(ks[5], (D,))
    operands = (u, delta, A, B, C, Dk)

    variants = {
        "pallas": lambda *a: selective_scan_pallas(*a, chunk=args.chunk, block_d=args.block_d),
        "xla_chunked": lambda *a: selective_scan_chunked(*a, chunk=args.chunk),
    }

    def timed(f, n=5):
        jax.device_get(f(*operands))
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*operands)
        jax.device_get(o)
        return (time.perf_counter() - t0) / n * 1e3

    out = {}
    for name, scan in variants.items():
        fwd = jax.jit(lambda *a, s=scan: s(*a)[0].astype(jnp.float32).sum())
        out[f"{name}_fwd_ms"] = round(timed(fwd), 2)
        if args.with_bwd:
            g = jax.grad(
                lambda *a, s=scan: (s(*a)[0].astype(jnp.float32) ** 2).mean(),
                argnums=(0, 1, 2, 3, 4, 5),
            )
            bwd = jax.jit(lambda *a, g=g: sum(x.astype(jnp.float32).sum() for x in g(*a)))
            out[f"{name}_fwd_bwd_ms"] = round(timed(bwd), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
