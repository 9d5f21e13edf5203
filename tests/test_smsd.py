"""SMSD tests: GMM NLL against closed forms, all variance modes, sampling
(SURVEY §4a: GMM NLL against a closed-form case)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tts_tpu.config import SMSDConfig
from mamba_tts_tpu.models.smsd import SMSD, mixture_nll_loss, sample_mixture

MODES = ["isotropic_across_clusters", "isotropic", "diagonal", "fixed"]


def test_nll_single_component_matches_gaussian():
    """K=1 mixture NLL == exact isotropic Gaussian NLL."""
    B, d = 3, 4
    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (B, d))
    mu = jnp.zeros((B, 1, d))
    pi = jnp.ones((B, 1))
    sigma = jnp.full((B,), 2.0)
    nll = mixture_nll_loss(y, pi, mu, sigma, "isotropic_across_clusters")
    expect = float(
        np.mean(
            0.5 * d * math.log(2 * math.pi)
            + 0.5 * d * math.log(4.0)
            + 0.5 * (np.asarray(y) ** 2).sum(-1) / 4.0
        )
    )
    np.testing.assert_allclose(float(nll), expect, rtol=2e-5)


def test_nll_logsumexp_two_components():
    """K=2 NLL matches a direct numpy logsumexp computation."""
    B, K, d = 2, 2, 3
    rng = np.random.RandomState(0)
    y = rng.randn(B, d).astype(np.float32)
    mu = rng.randn(B, K, d).astype(np.float32)
    pi = np.array([[0.3, 0.7], [0.5, 0.5]], np.float32)
    sigma = np.abs(rng.randn(B, K)).astype(np.float32) + 0.5

    nll = mixture_nll_loss(jnp.array(y), jnp.array(pi), jnp.array(mu), jnp.array(sigma), "isotropic")

    diff = y[:, None, :] - mu
    logp = (
        -0.5 * d * math.log(2 * math.pi)
        - 0.5 * d * np.log(sigma**2)
        - 0.5 * (diff**2).sum(-1) / sigma**2
    )
    lw = np.log(pi + 1e-8) + logp
    m = lw.max(1, keepdims=True)
    lse = (m[:, 0] + np.log(np.exp(lw - m).sum(1)))
    np.testing.assert_allclose(float(nll), float(-lse.mean()), rtol=2e-5)


@pytest.mark.parametrize("mode", MODES)
def test_smsd_loss_and_sample_all_modes(mode):
    cfg = SMSDConfig(bert_dim=16, style_dim=8, num_mixtures=3, hidden_dim=12, variance_mode=mode)
    m = SMSD(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    variables = m.init(jax.random.PRNGKey(2), x)

    pi, mu, sigma = m.apply(variables, x)
    assert pi.shape == (4, 3) and mu.shape == (4, 3, 8)
    np.testing.assert_allclose(np.asarray(pi.sum(-1)), 1.0, rtol=1e-5)
    expected_sigma_shape = {
        "isotropic_across_clusters": (4,),
        "isotropic": (4, 3),
        "diagonal": (4, 3, 8),
        "fixed": (4,),
    }[mode]
    assert sigma.shape == expected_sigma_shape
    assert bool((sigma > 0).all())

    loss = m.apply(
        variables, x, y, method=SMSD.loss,
        rngs={"dropout": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
    )
    assert jnp.isfinite(loss)

    sample = m.apply(variables, x, jax.random.PRNGKey(5), method=SMSD.sample)
    assert sample.shape == (4, 8)
    assert bool(jnp.isfinite(sample).all())


def test_noise_net_train_vs_eval():
    """NoiseNet perturbs sigma only in training mode (reference: smsd.py:277-292)."""
    cfg = SMSDConfig(bert_dim=16, style_dim=8, num_mixtures=2, hidden_dim=12)
    m = SMSD(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
    variables = m.init(jax.random.PRNGKey(1), x)
    _, _, s_eval1 = m.apply(variables, x, deterministic=True)
    _, _, s_eval2 = m.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(s_eval1), np.asarray(s_eval2))
    _, _, s_tr1 = m.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(3)},
    )
    _, _, s_tr2 = m.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2), "noise": jax.random.PRNGKey(7)},
    )
    assert not np.allclose(np.asarray(s_tr1), np.asarray(s_tr2))


def test_sample_concentrates_on_dominant_component():
    B, K, d = 256, 2, 2
    pi = jnp.tile(jnp.array([[0.999, 0.001]]), (B, 1))
    mu = jnp.tile(jnp.array([[[10.0, 10.0], [-10.0, -10.0]]]), (B, 1, 1))
    sigma = jnp.full((B,), 0.1)
    s = sample_mixture(jax.random.PRNGKey(0), pi, mu, sigma)
    frac_near_dominant = float((s[:, 0] > 0).mean())
    assert frac_near_dominant > 0.98


def test_smsd_pipeline_reference_call_signature():
    """SMSDPipeline mirrors the reference's SMSD.forward surface (reference:
    smsd.py:90-125): raw style-prompt strings in, NLL loss / sampled style
    vectors / mixture params out."""
    from mamba_tts_tpu.models.smsd import SMSDPipeline

    cfg = SMSDConfig(bert_dim=32, style_dim=8, num_mixtures=3, hidden_dim=16)
    pipe = SMSDPipeline(cfg)
    prompts = ["speak fast", "a calm low voice"]

    y = pipe(prompts)
    assert np.asarray(y).shape == (2, cfg.style_dim)

    y2, (pi, mu, sigma) = pipe(prompts, return_params=True)
    assert np.asarray(pi).shape == (2, cfg.num_mixtures)
    assert np.asarray(mu).shape == (2, cfg.num_mixtures, cfg.style_dim)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, rtol=1e-5)

    y_true = np.zeros((2, cfg.style_dim), np.float32)
    loss = pipe(prompts, y_true=y_true)
    assert np.isfinite(float(loss))

    # single string broadcasts to a batch of one
    y1 = pipe(prompts[0])
    assert np.asarray(y1).shape == (1, cfg.style_dim)
