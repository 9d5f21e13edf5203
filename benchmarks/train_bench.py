"""Training-step throughput benchmark (reproduces README perf numbers).

    python benchmarks/train_bench.py [--batch 8] [--target_frames 512]
        [--voice_frames 256] [--no_pallas]
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
    parser.add_argument("--target_frames", type=int, default=512)
    parser.add_argument("--voice_frames", type=int, default=256)
    parser.add_argument("--text_len", type=int, default=64)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--no_pallas", action="store_true")
    args = parser.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import _enable_compile_cache

    _enable_compile_cache()  # the train-step compile is the most expensive
    from mamba_tts_tpu import config as cl
    from mamba_tts_tpu.models.tts import MambaTTS
    from mamba_tts_tpu.train import state as state_lib
    from mamba_tts_tpu.train.train import init_params, make_train_step_fn

    B, L, St, Sv = args.batch, args.text_len, args.target_frames, args.voice_frames
    cfg = cl.TTSConfig(decoder=cl.DecoderConfig(use_pallas=not args.no_pallas))
    Q = cfg.decoder.num_quantizers

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    batch = {
        "phoneme_ids": jax.random.randint(ks[0], (B, L), 1, 79),
        "text_mask": jnp.ones((B, L), bool),
        "style_bert": jax.random.normal(ks[1], (B, cfg.smsd.bert_dim)),
        "spk_embs": jax.random.normal(ks[2], (B, cfg.smsd.style_dim)),
        "target_codec": jax.random.randint(ks[3], (B, St, Q), 2, cfg.decoder.vocab_size_audio),
        "target_frames": jnp.full((B,), St, jnp.int32),
        "voice_codec": jax.random.randint(ks[4], (B, Sv, Q), 2, cfg.decoder.vocab_size_audio),
    }
    model = MambaTTS(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = state_lib.make_optimizer(cfg.train.lr, cfg.train.grad_clip_norm)
    opt = tx.init(params)
    step_fn = make_train_step_fn(model, tx)

    # Time N steps inside ONE jitted scan with a SCALAR output: the
    # tunneled TPU backend ships every call's outputs to the host
    # (~0.4 GB/s), so a per-step loop returning the param/opt pytrees
    # times the tunnel (measured ~1.6 s/step at shapes whose real step is
    # ~0.2 s).  device_get on the scalar is the only reliable sync.
    @jax.jit
    def run_n(params, opt):
        def body(carry, k):
            p, o = carry
            p, o, losses = step_fn(p, o, batch, k)
            return (p, o), losses["loss_total"]
        keys = jax.random.split(jax.random.PRNGKey(2), args.steps)
        (_, _), ls = jax.lax.scan(body, (params, opt), keys)
        return ls

    t0 = time.perf_counter()
    ls = jax.device_get(run_n(params, opt))
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ls = jax.device_get(run_n(params, opt))
    loss = float(ls[-1])
    dt = (time.perf_counter() - t0) / args.steps
    # Coarse matmul-FLOPs estimate for MFU accounting (bench meta): 6·N·T
    # (fwd 2·N·T + bwd 4·N·T) over the decoded target tokens, plus the
    # quadratic attention terms over the [ref‖text] memory.  Embedding and
    # frozen-BERT params are included in N (small at this scale); treat the
    # resulting MFU as ±20% indicative, not exact.
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))
    tokens_per_step = B * St * Q
    t_mem = Sv * Q + L
    attn_flops = (
        cfg.decoder.n_layers * 4 * cfg.decoder.d_model * t_mem
        * tokens_per_step * 3  # fwd + bwd
    )
    train_flops_per_step = 6 * n_params * tokens_per_step + attn_flops
    print(
        json.dumps(
            {
                "ms_per_step": round(dt * 1e3, 1),
                "train_tokens_per_sec": round(B * St * Q / dt, 1),
                "train_flops_per_step": train_flops_per_step,
                "loss": round(loss, 3),
                "pallas": not args.no_pallas,
                "batch": B,
                "target_frames": St,
                "voice_frames": Sv,
            }
        )
    )


if __name__ == "__main__":
    main()
