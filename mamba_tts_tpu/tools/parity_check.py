"""Greedy-decode vs teacher-forcing parity measurement (BASELINE north-star
row 4: "greedy-token parity").

The decode path re-runs the decoder step-by-step on its own argmax stream;
this tool feeds that SAME stream back through the batched teacher-forcing
forward and reports:

  - max / mean relative logit difference between the two paths, and
  - the argmax flip rate (fraction of positions where the two paths would
    pick different tokens),

in the model's serving dtype (bf16 activations) and, for attribution, with
the forward's scan kernel switched between the Pallas chunked kernel and the
sequential-equivalent XLA chunked scan.

Usage:
    python -m mamba_tts_tpu.tools.parity_check [--checkpoint_dir D]
        [--frames 64] [--train_steps 200] [--dtype bfloat16]

Without a checkpoint it first trains the (small-by-default) model on
synthetic data for ``--train_steps`` so the measurement reflects a TRAINED
logit landscape, not random init (trained logit gaps dominate rounding).
"""
from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np


def measure_parity(model, params, cfg, frames: int, seed: int = 0,
                   batch: int = 2):
    """Returns dict of parity metrics between greedy decode and forward.

    ``batch`` sets the decode batch — ``--batch 16`` measures the B=16
    short-prompt VMEM-fit residency config's flip rate (VERDICT r4 #8; the
    megakernel int8w/int8kv entry is that config)."""
    from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode
    from mamba_tts_tpu.models.tts import MambaTTS

    dec_cfg = cfg.decoder.with_mamba_dims()
    decoder = MambaTTSDecoder(dec_cfg)
    Q = dec_cfg.num_quantizers
    B, L, S = batch, 12, 8
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    batch = {
        "phoneme_ids": jax.random.randint(ks[0], (B, L), 1, cfg.text_encoder.vocab_size),
        "text_mask": jnp.ones((B, L), bool),
        "style_bert": jax.random.normal(ks[1], (B, cfg.smsd.bert_dim)),
        "voice_codec": jax.random.randint(
            ks[2], (B, S, Q), dec_cfg.num_special_tokens, dec_cfg.vocab_size_audio
        ),
    }
    mvars = {"params": params}
    text_hidden = model.apply(
        mvars, batch["phoneme_ids"], batch["text_mask"], method=MambaTTS.encode_text
    )
    z_style = model.apply(mvars, batch["style_bert"], ks[3], method=MambaTTS.sample_style)
    ref_hidden, ref_mask = model.apply(mvars, batch["voice_codec"], method=MambaTTS.embed_voice)

    dec_vars = {"params": params["decoder"]}
    quant_ids = np.repeat(np.arange(Q), frames)[None].astype(np.int32)
    pos_ids = np.tile(np.arange(frames), Q)[None].astype(np.int32)

    def fwd_run(kernel, tokens):
        """Teacher-forcing re-run on a decoded stream: inputs
        [BOS, y_0..y_{n-2}] with the slot ids of the full grid (exactly the
        decode-side embedding)."""
        inp = np.concatenate(
            [np.full((tokens.shape[0], 1), dec_cfg.bos_id, np.int32),
             tokens[:, :-1]], axis=1,
        )
        fwd_cfg = dataclasses.replace(dec_cfg, use_pallas=(kernel == "pallas"))
        fwd_dec = MambaTTSDecoder(fwd_cfg)
        fwd_logits = jax.jit(
            lambda inp: fwd_dec.apply(
                dec_vars, inp, text_hidden, z_style,
                batch["text_mask"], ref_hidden, ref_mask,
                quant_ids=jnp.asarray(quant_ids), pos_ids=jnp.asarray(pos_ids),
            )
        )(jnp.asarray(inp))
        return np.asarray(jax.device_get(fwd_logits), np.float32)

    def stats(tokens, dec_logits, fwd_logits):
        # decode masks the special ids before argmax; match it
        fwd_masked = fwd_logits.copy()
        fwd_masked[:, :, : dec_cfg.num_special_tokens] = -1e9
        flips = (fwd_masked.argmax(-1) != tokens).mean()
        # logit diffs over the REAL vocabulary only (the decode path records
        # its special columns already masked to -1e9)
        ns = dec_cfg.num_special_tokens
        dl, fl = dec_logits[..., ns:], fwd_logits[..., ns:]
        denom = np.maximum(np.abs(dl), np.abs(fl)).max()
        rel = np.abs(dl - fl) / max(denom, 1e-9)
        gap = np.sort(fwd_masked, axis=-1)
        margin = (gap[..., -1] - gap[..., -2]).mean()  # trained top-2 margin
        return {
            "argmax_flip_rate": float(flips),
            "logit_rel_diff_max": float(rel.max()),
            "logit_rel_diff_mean": float(rel.mean()),
            "top2_margin_mean": float(margin),
            "positions": int(tokens.size),
        }

    res = jax.jit(
        lambda: greedy_decode(
            decoder, dec_vars, text_hidden, z_style, frames,
            text_mask=batch["text_mask"], ref_hidden=ref_hidden, ref_mask=ref_mask,
            collect_logits=True,
        )
    )()
    tokens = jax.device_get(res.tokens)  # (B, Q*frames)
    dec_logits = np.asarray(jax.device_get(res.logits), np.float32)

    results = {}
    for kernel in ("pallas", "xla"):
        results[kernel] = stats(tokens, dec_logits, fwd_run(kernel, tokens))

    # Megakernel decode in each residency config, judged the same way: its
    # OWN greedy stream re-scored by the teacher-forcing forward.
    from mamba_tts_tpu.infer.quant_decode import quantize_decoder_params
    from mamba_tts_tpu.ops.decode_megakernel import megakernel_greedy_decode

    qparams = quantize_decoder_params(params["decoder"], dec_cfg)
    for wd, kvd in (("bfloat16", "bfloat16"), ("int8", "bfloat16"),
                    ("int8", "int8")):
        res_m = jax.jit(
            lambda wd=wd, kvd=kvd: megakernel_greedy_decode(
                decoder, dec_vars, qparams, text_hidden, z_style, frames,
                text_mask=batch["text_mask"], ref_hidden=ref_hidden,
                ref_mask=ref_mask, collect_logits=True,
                weight_dtype=wd, kv_dtype=kvd,
            )
        )()
        tok_m = jax.device_get(res_m.tokens)
        log_m = np.asarray(jax.device_get(res_m.logits), np.float32)
        results[f"megakernel_{wd[:4]}w_{kvd[:4]}kv"] = stats(
            tok_m, log_m, fwd_run("pallas", tok_m)
        )
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--config_json", type=str, default=None)
    parser.add_argument("--frames", type=int, default=64)
    parser.add_argument("--train_steps", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch", type=int, default=2)
    args = parser.parse_args(argv)

    from mamba_tts_tpu import config as config_lib
    from mamba_tts_tpu.config import TTSConfig
    from mamba_tts_tpu.models.tts import MambaTTS
    from mamba_tts_tpu.train import state as state_lib
    from mamba_tts_tpu.train.train import init_params

    if args.config_json:
        cfg = config_lib.from_json(open(args.config_json).read())
    else:
        cfg = TTSConfig()
    model = MambaTTS(cfg)

    if args.checkpoint_dir:
        import os

        cfg_path = os.path.join(args.checkpoint_dir, "config.json")
        if os.path.exists(cfg_path) and not args.config_json:
            cfg = config_lib.from_json(open(cfg_path).read())
            model = MambaTTS(cfg)
        abstract = jax.eval_shape(
            lambda key: init_params(model, cfg, key), jax.random.PRNGKey(args.seed)
        )
        params, restored = state_lib.restore_params(args.checkpoint_dir, abstract)
        assert restored, f"no checkpoint in {args.checkpoint_dir}"
        print(f"restored params from {args.checkpoint_dir}")
    else:
        # Train briefly on synthetic data so logit gaps are trained, then measure.
        import tempfile

        from mamba_tts_tpu.train.train import main as train_main

        ckpt = tempfile.mkdtemp(prefix="parity_ck_")
        argv_t = [
            "--synthetic", "--max_steps", str(args.train_steps),
            "--batch_size", "4", "--checkpoint_dir", ckpt,
        ]
        if args.config_json:
            argv_t += ["--config_json", args.config_json]
        train_main(argv_t)
        abstract = jax.eval_shape(
            lambda key: init_params(model, cfg, key), jax.random.PRNGKey(args.seed)
        )
        params, restored = state_lib.restore_params(ckpt, abstract)
        assert restored

    results = measure_parity(
        model, params, cfg, args.frames, args.seed, batch=args.batch
    )
    print(json.dumps({"greedy_parity": results, "batch": args.batch},
                     indent=2))


if __name__ == "__main__":
    main()
