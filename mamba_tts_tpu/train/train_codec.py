"""Codec (FACodec) training: reconstruction + VQ (+ adversarial) losses.

The reference depends entirely on pretrained HF checkpoints for its codec
(reference: audio_encoder.py:165-173) and cannot train one.  This makes the
framework self-sufficient: train the factorized codec from raw audio with

    L_G = w_wave * L1(wave) + w_stft * multi-resolution-STFT
        + w_mel * mel-L1 + w_vq * sum(VQ codebook+commitment losses)
        [+ w_adv * hinge-G + w_fm * feature-matching   with --adversarial]

against a multi-resolution complex-STFT discriminator (hinge GAN, EnCodec/
DAC recipe — models/discriminator.py).  Generator and discriminator update
in ONE jitted step (both grads in one compiled graph; no host ping-pong).

    python -m mamba_tts_tpu.train.train_codec --synthetic --max_steps 5
    python -m mamba_tts_tpu.train.train_codec --synthetic --adversarial ...
"""
from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.audio.mel import mel_l1_loss, multi_resolution_stft_loss
from mamba_tts_tpu.config import CodecConfig
from mamba_tts_tpu.models.facodec import FACodec


def codec_loss_fn(
    model: FACodec,
    params,
    wav: jax.Array,
    w_wave: float = 1.0,
    w_stft: float = 1.0,
    w_mel: float = 1.0,
    w_vq: float = 1.0,
    resolutions=((512, 128), (1024, 256)),
):
    (recon, _, _), mutated = model.apply(
        {"params": params}, wav, mutable=["losses"]
    )
    vq_losses = jax.tree.leaves(mutated.get("losses", {}))
    loss_vq = sum(jnp.asarray(v).sum() for v in vq_losses) if vq_losses else 0.0
    loss_wave = jnp.abs(recon - wav).mean()
    loss_stft = multi_resolution_stft_loss(recon, wav, resolutions)
    loss_mel = mel_l1_loss(recon, wav)
    total = w_wave * loss_wave + w_stft * loss_stft + w_mel * loss_mel + w_vq * loss_vq
    return total, {
        "loss_total": total,
        "loss_wave": loss_wave,
        "loss_stft": loss_stft,
        "loss_mel": loss_mel,
        "loss_vq": loss_vq,
    }


def make_codec_train_step(model: FACodec, tx, **loss_kw):
    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, wav):
        import optax

        (_, metrics), grads = jax.value_and_grad(
            lambda p: codec_loss_fn(model, p, wav, **loss_kw), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def make_gan_codec_train_step(
    model: FACodec,
    disc,
    tx_g,
    tx_d,
    w_adv: float = 1.0,
    w_fm: float = 2.0,
    **loss_kw,
):
    """Joint generator+discriminator step, fully jitted.

    The discriminator trains on (real, stop_gradient(recon)); the generator
    adds hinge-G + feature-matching on top of the reconstruction losses.
    """
    from mamba_tts_tpu.models.discriminator import (
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def step(g_params, d_params, g_opt, d_opt, wav):
        import optax

        def g_loss(gp):
            (recon, _, _), mutated = model.apply({"params": gp}, wav, mutable=["losses"])
            vq_losses = jax.tree.leaves(mutated.get("losses", {}))
            loss_vq = sum(jnp.asarray(v).sum() for v in vq_losses) if vq_losses else 0.0
            loss_wave = jnp.abs(recon - wav).mean()
            loss_stft = multi_resolution_stft_loss(
                recon, wav, loss_kw.get("resolutions", ((512, 128), (1024, 256)))
            )
            loss_mel = mel_l1_loss(recon, wav)
            fake_outs = disc.apply({"params": d_params}, recon)
            real_outs = disc.apply({"params": d_params}, wav)
            loss_adv = generator_adversarial_loss(fake_outs)
            loss_fm = feature_matching_loss(real_outs, fake_outs)
            total = (
                loss_kw.get("w_wave", 1.0) * loss_wave
                + loss_kw.get("w_stft", 1.0) * loss_stft
                + loss_kw.get("w_mel", 1.0) * loss_mel
                + loss_kw.get("w_vq", 1.0) * loss_vq
                + w_adv * loss_adv
                + w_fm * loss_fm
            )
            return total, (recon, {
                "loss_total": total, "loss_wave": loss_wave, "loss_stft": loss_stft,
                "loss_mel": loss_mel, "loss_vq": loss_vq, "loss_adv": loss_adv,
                "loss_fm": loss_fm,
            })

        (_, (recon, metrics)), g_grads = jax.value_and_grad(g_loss, has_aux=True)(g_params)
        g_updates, g_opt = tx_g.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        fake = jax.lax.stop_gradient(recon)

        def d_loss(dp):
            real_outs = disc.apply({"params": dp}, wav)
            fake_outs = disc.apply({"params": dp}, fake)
            return discriminator_loss(real_outs, fake_outs)

        ld, d_grads = jax.value_and_grad(d_loss)(d_params)
        d_updates, d_opt = tx_d.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        metrics["loss_disc"] = ld
        return g_params, d_params, g_opt, d_opt, metrics

    return step


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--max_steps", type=int, default=10)
    parser.add_argument("--segment_seconds", type=float, default=0.8)
    parser.add_argument("--csv_path", type=str, default=None)
    parser.add_argument("--audio_root", type=str, default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--checkpoint_dir", type=str, default="codec_checkpoints")
    parser.add_argument("--checkpoint_every", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--adversarial", action="store_true",
                        help="add the multi-resolution STFT discriminator "
                             "(hinge GAN + feature matching)")
    parser.add_argument("--disc_lr", type=float, default=None,
                        help="discriminator lr (default: same as --lr)")
    parser.add_argument("--w_adv", type=float, default=1.0)
    parser.add_argument("--w_fm", type=float, default=2.0)
    args = parser.parse_args(argv)

    import optax

    from mamba_tts_tpu.train import state as state_lib

    cfg = CodecConfig()
    model = FACodec(cfg)
    seg = int(args.segment_seconds * cfg.sample_rate)
    seg -= seg % cfg.hop_length

    if args.synthetic:
        import tempfile

        from mamba_tts_tpu.data.dataset import make_synthetic_dataset

        tmp = tempfile.mkdtemp(prefix="mtts_codec_")
        csv_path, audio_root = make_synthetic_dataset(
            tmp, n_items=max(8, args.batch_size * 2), seconds=args.segment_seconds
        )
    else:
        csv_path, audio_root = args.csv_path, args.audio_root
        assert csv_path and audio_root, "--csv_path/--audio_root or --synthetic"

    from mamba_tts_tpu.data.dataset import VccmTTSDataset

    dataset = VccmTTSDataset(csv_path, audio_root, cfg.sample_rate, seed=args.seed)
    print(f"dataset: {len(dataset)} items")

    rng = np.random.RandomState(args.seed)

    def sample_batch():
        wavs = np.zeros((args.batch_size, seg), np.float32)
        for i in range(args.batch_size):
            _, target = dataset[rng.randint(len(dataset))]
            if target.shape[0] >= seg:
                start = rng.randint(target.shape[0] - seg + 1)
                wavs[i] = target[start : start + seg]
            else:
                wavs[i, : target.shape[0]] = target
        return jnp.asarray(wavs)

    params = model.init(jax.random.PRNGKey(args.seed), sample_batch())["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"codec: {n_params/1e6:.1f}M params, segment {seg} samples")
    tx = state_lib.make_optimizer(args.lr)
    opt_state = tx.init(params)

    d_params = d_opt = None
    if args.adversarial:
        from mamba_tts_tpu.models.discriminator import MultiSTFTDiscriminator

        # resolutions capped to the segment length
        res = tuple((n, n // 4) for n in (512, 1024, 2048) if n <= seg)
        disc = MultiSTFTDiscriminator(resolutions=res or ((min(seg, 256), max(seg // 4, 1)),))
        d_params = disc.init(jax.random.PRNGKey(args.seed + 1), sample_batch())["params"]
        nd = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(d_params))
        print(f"discriminator: {nd/1e6:.2f}M params at {disc.resolutions}")
        tx_d = state_lib.make_optimizer(args.disc_lr or args.lr)
        d_opt = tx_d.init(d_params)
        gan_step = make_gan_codec_train_step(
            model, disc, tx, tx_d, w_adv=args.w_adv, w_fm=args.w_fm
        )
    else:
        step_fn = make_codec_train_step(model, tx)

    st = state_lib.TrainState(step=0, params=params, opt_state=opt_state)
    for step in range(args.max_steps):
        t0 = time.perf_counter()
        wav = sample_batch()
        if args.adversarial:
            params, d_params, opt_state, d_opt, metrics = gan_step(
                st.params, d_params, st.opt_state, d_opt, wav
            )
        else:
            params, opt_state, metrics = step_fn(st.params, st.opt_state, wav)
        metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        st = st.replace(step=step + 1, params=params, opt_state=opt_state)
        dt = time.perf_counter() - t0
        print(
            f"step {step} | " + " ".join(f"{k.replace('loss_','')}={v:.4f}" for k, v in metrics.items())
            + f" | {dt*1e3:.0f} ms"
        )
        if (step + 1) % args.checkpoint_every == 0:
            state_lib.save_checkpoint(args.checkpoint_dir, st)
    state_lib.save_checkpoint(args.checkpoint_dir, st)
    print(f"saved codec checkpoint at step {st.step}")


if __name__ == "__main__":
    main()
