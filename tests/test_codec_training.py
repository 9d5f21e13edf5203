"""Codec training tests: reconstruction losses decrease; VQ losses sown."""
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.audio.mel import mel_filterbank, multi_resolution_stft_loss, stft_magnitude
from mamba_tts_tpu.config import CodecConfig
from mamba_tts_tpu.models.facodec import FACodec
from mamba_tts_tpu.train import state as state_lib
from mamba_tts_tpu.train.train_codec import codec_loss_fn, make_codec_train_step

TINY = CodecConfig(
    ngf=4, up_ratios=(2, 4), latent_dim=16, codebook_size=10, codebook_dim=4,
    spk_dim=8, max_seq_len=64, decoder_initial_channels=32,
)


def test_stft_and_mel_shapes():
    wav = jnp.sin(jnp.linspace(0, 100, 2048))[None]
    mag = stft_magnitude(wav, n_fft=512, hop=128)
    assert mag.shape[0] == 1 and mag.shape[2] == 257
    fb = mel_filterbank(16000, 512, n_mels=20)
    assert fb.shape == (20, 257)
    assert (fb.sum(axis=1) > 0).all()  # every filter has support


def test_stft_loss_zero_for_identical():
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 1024))
    loss = multi_resolution_stft_loss(wav, wav, resolutions=((256, 64),))
    assert float(loss) < 1e-5


def test_vq_losses_are_sown():
    model = FACodec(TINY)
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 128)) * 0.1
    params = model.init(jax.random.PRNGKey(1), wav)["params"]
    _, metrics = codec_loss_fn(model, params, wav, resolutions=((64, 16),))
    assert float(metrics["loss_vq"]) > 0.0
    assert np.isfinite(float(metrics["loss_total"]))


def test_codec_overfits_fixed_batch():
    """A few hundred Adam steps on one tone must reduce the spectral loss."""
    model = FACodec(TINY)
    t = jnp.arange(256) / 16000.0
    wav = (0.5 * jnp.sin(2 * jnp.pi * 440 * 16000 / 256 * t))[None].astype(jnp.float32)
    wav = jnp.tile(wav, (2, 1))
    params = model.init(jax.random.PRNGKey(0), wav)["params"]
    # 1e-3: at 3e-3 the tanh generator head saturates with the cosine-VQ
    # (upstream-isomorphic) codec and the spectral losses freeze.
    tx = state_lib.make_optimizer(1e-3)
    opt = tx.init(params)
    step = make_codec_train_step(model, tx, resolutions=((64, 16),), w_vq=0.1)
    first = None
    for i in range(200):
        params, opt, metrics = step(params, opt, wav)
        if first is None:
            first = jax.device_get(metrics)
    last = jax.device_get(metrics)
    # total + spectral losses fall; raw-wave L1 may stall on phase (expected
    # for a tiny codebook without adversarial training)
    assert float(last["loss_total"]) < float(first["loss_total"])
    assert float(last["loss_mel"]) < float(first["loss_mel"])


def test_adversarial_gan_step():
    """One jitted GAN step: both param trees update, all losses finite,
    hinge discriminator loss in its expected initial range (~2)."""
    from mamba_tts_tpu.models.discriminator import MultiSTFTDiscriminator
    from mamba_tts_tpu.train.train_codec import make_gan_codec_train_step

    model = FACodec(TINY)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 256)) * 0.1
    g_params = model.init(jax.random.PRNGKey(1), wav)["params"]
    disc = MultiSTFTDiscriminator(resolutions=((128, 32), (64, 16)))
    d_params = disc.init(jax.random.PRNGKey(2), wav)["params"]
    tx_g, tx_d = state_lib.make_optimizer(1e-4), state_lib.make_optimizer(1e-4)
    g_opt, d_opt = tx_g.init(g_params), tx_d.init(d_params)
    step = make_gan_codec_train_step(
        model, disc, tx_g, tx_d, resolutions=((64, 16),)
    )
    g0 = jax.tree.leaves(g_params)[0].copy()
    d0 = jax.tree.leaves(d_params)[0].copy()
    g_params, d_params, g_opt, d_opt, metrics = step(g_params, d_params, g_opt, d_opt, wav)
    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics
    assert metrics["loss_disc"] > 0.0
    assert metrics["loss_fm"] >= 0.0
    assert np.abs(np.asarray(jax.tree.leaves(g_params)[0]) - np.asarray(g0)).max() > 0
    assert np.abs(np.asarray(jax.tree.leaves(d_params)[0]) - np.asarray(d0)).max() > 0


def test_discriminator_shapes_and_fm():
    from mamba_tts_tpu.models.discriminator import (
        MultiSTFTDiscriminator,
        discriminator_loss,
        feature_matching_loss,
        generator_adversarial_loss,
    )

    disc = MultiSTFTDiscriminator(resolutions=((128, 32),))
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    params = disc.init(jax.random.PRNGKey(1), wav)["params"]
    outs = disc.apply({"params": params}, wav)
    assert len(outs) == 1
    logits, feats = outs[0]
    assert logits.ndim == 3 and logits.shape[0] == 2
    assert len(feats) == 5
    # perfect fake == real: fm loss 0, disc loss at hinge rest point 2
    assert float(feature_matching_loss(outs, outs)) < 1e-6
    # rest point is exactly 2 when |logits| < 1; random init can slightly exceed
    np.testing.assert_allclose(float(discriminator_loss(outs, outs)), 2.0, atol=0.1)
    assert np.isfinite(float(generator_adversarial_loss(outs)))
