"""SMSD — Style Mixture Semantic Density module (ControlSpeech §3.3).

Re-designs the reference SMSD (reference: smsd.py:12-372): a Gaussian
mixture-density network over frozen style-text embeddings, handling the
many-to-many mapping between style descriptions and style realizations.

TPU-first split: the frozen text encoder (BERT [CLS] — see
``models/style_text_encoder.py``) runs as its own jitted graph over token
ids; the MDN head here is a pure function of the (B, bert_dim) embedding, so
the training loss and the sampling path stay inside the main jit without any
string handling.

All four variance modes of the reference are implemented
(reference: smsd.py:30,207-218,247-262):
  - "isotropic_across_clusters" (default): one scalar sigma per example
  - "isotropic": one sigma per mixture component
  - "diagonal":  per-component per-dimension sigma
  - "fixed":     constant (std 0.1 for sampling, variance 0.01 in the NLL —
                 the reference's asymmetry, kept for parity)

Training objective: NLL of the GMM via logsumexp (reference: smsd.py:295-372).
Sampling: k ~ Categorical(pi), y = mu_k + sigma_k * eps (reference:
smsd.py:127-164).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mamba_tts_tpu.config import SMSDConfig


class NoiseNet(nn.Module):
    """Learnable noise perturbation on variance predictions; identity at
    inference (reference: smsd.py:267-292)."""

    noise_scale_init: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        scale = self.param(
            "noise_scale", lambda k: jnp.asarray(self.noise_scale_init, jnp.float32)
        )
        if deterministic:
            return x
        eps = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        return x + scale * eps


class MDNHead(nn.Module):
    """BERT embedding -> GMM parameters (pi, mu, sigma)."""

    cfg: SMSDConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        c = self.cfg
        B = x.shape[0]
        K, d = c.num_mixtures, c.style_dim

        h = nn.LayerNorm(name="ln")(x.astype(jnp.float32))
        h = nn.Dense(c.hidden_dim, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = nn.Dense(c.hidden_dim, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)

        pi = jax.nn.softmax(nn.Dense(K, name="pi_head")(h), axis=-1)  # (B, K)
        mu = nn.Dense(K * d, name="mu_head")(h).reshape(B, K, d)

        mode = c.variance_mode
        if mode == "fixed":
            sigma = jnp.full((B,), c.fixed_std, jnp.float32)
            return pi, mu, sigma

        if mode == "isotropic_across_clusters":
            raw = nn.Dense(1, name="sigma_head")(h)  # (B, 1)
        elif mode == "isotropic":
            raw = nn.Dense(K, name="sigma_head")(h)  # (B, K)
        elif mode == "diagonal":
            raw = nn.Dense(K * d, name="sigma_head")(h)  # (B, K*d)
        else:
            raise ValueError(f"unknown variance_mode: {mode}")

        raw = NoiseNet(c.noise_scale, name="noise_net")(raw, deterministic=deterministic)
        sigma = jax.nn.softplus(raw)
        if mode == "isotropic_across_clusters":
            sigma = sigma[:, 0]  # (B,)
        elif mode == "diagonal":
            sigma = sigma.reshape(B, K, d)
        return pi, mu, sigma


def mixture_nll_loss(
    y_true: jax.Array,
    pi: jax.Array,
    mu: jax.Array,
    sigma: jax.Array,
    variance_mode: str = "isotropic_across_clusters",
    fixed_variance: float = 0.01,
) -> jax.Array:
    """Negative log-likelihood of a Gaussian mixture (reference: smsd.py:295-372).

    y_true: (B, d); pi: (B, K); mu: (B, K, d);
    sigma: (B,) | (B, K) | (B, K, d) depending on mode.
    """
    y_true = y_true.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    B, K, d = mu.shape
    diff = y_true[:, None, :] - mu  # (B, K, d)
    log2pi = math.log(2.0 * math.pi)

    if variance_mode == "isotropic_across_clusters":
        var = (sigma.astype(jnp.float32) ** 2)[:, None]  # (B, 1)
        logp = (
            -0.5 * d * log2pi
            - 0.5 * d * jnp.log(var)
            - 0.5 * (diff**2).sum(-1) / var
        )
    elif variance_mode == "isotropic":
        var = sigma.astype(jnp.float32) ** 2  # (B, K)
        logp = -0.5 * d * log2pi - 0.5 * d * jnp.log(var) - 0.5 * (diff**2).sum(-1) / var
    elif variance_mode == "diagonal":
        var = sigma.astype(jnp.float32) ** 2  # (B, K, d)
        logp = (
            -0.5 * d * log2pi
            - 0.5 * jnp.log(var).sum(-1)
            - 0.5 * ((diff**2) / var).sum(-1)
        )
    elif variance_mode == "fixed":
        var = fixed_variance
        logp = (
            -0.5 * d * log2pi
            - 0.5 * d * math.log(var)
            - 0.5 * (diff**2).sum(-1) / var
        )
    else:
        raise ValueError(f"unknown variance_mode: {variance_mode}")

    log_weighted = jnp.log(pi + 1e-8) + logp  # (B, K)
    return -jax.scipy.special.logsumexp(log_weighted, axis=1).mean()


def sample_mixture(
    rng: jax.Array,
    pi: jax.Array,
    mu: jax.Array,
    sigma: jax.Array,
    variance_mode: str = "isotropic_across_clusters",
    fixed_std: float = 0.1,
) -> jax.Array:
    """Sample y ~ sum_k pi_k N(mu_k, sigma_k^2) (reference: smsd.py:127-164)."""
    B, K, d = mu.shape
    k_rng, n_rng = jax.random.split(rng)
    k = jax.random.categorical(k_rng, jnp.log(pi + 1e-8), axis=-1)  # (B,)
    mu_sel = jnp.take_along_axis(mu, k[:, None, None], axis=1)[:, 0]  # (B, d)
    eps = jax.random.normal(n_rng, mu_sel.shape, jnp.float32)

    if variance_mode == "isotropic_across_clusters":
        std = sigma[:, None]  # (B, 1)
    elif variance_mode == "isotropic":
        std = jnp.take_along_axis(sigma, k[:, None], axis=1)  # (B, 1)
    elif variance_mode == "diagonal":
        std = jnp.take_along_axis(sigma, k[:, None, None], axis=1)[:, 0]  # (B, d)
    elif variance_mode == "fixed":
        std = fixed_std
    else:
        raise ValueError(f"unknown variance_mode: {variance_mode}")
    return mu_sel + eps * std


class SMSD(nn.Module):
    """MDN head over precomputed style-text embeddings.

    Methods:
      - ``__call__(x_bert, deterministic)``         -> (pi, mu, sigma)
      - ``loss(x_bert, y_true, deterministic)``     -> scalar NLL
      - ``sample(x_bert, rng, deterministic)``      -> (B, style_dim)
    """

    cfg: SMSDConfig

    def setup(self):
        self.mdn_head = MDNHead(self.cfg, name="mdn_head")

    def __call__(self, x_bert: jax.Array, deterministic: bool = True):
        return self.mdn_head(x_bert, deterministic=deterministic)

    def loss(self, x_bert: jax.Array, y_true: jax.Array, deterministic: bool = False):
        pi, mu, sigma = self.mdn_head(x_bert, deterministic=deterministic)
        return mixture_nll_loss(
            y_true, pi, mu, sigma, self.cfg.variance_mode, self.cfg.fixed_variance
        )

    def sample(self, x_bert: jax.Array, rng: jax.Array, deterministic: bool = True):
        pi, mu, sigma = self.mdn_head(x_bert, deterministic=deterministic)
        return sample_mixture(
            rng, pi, mu, sigma, self.cfg.variance_mode, self.cfg.fixed_std
        )


class SMSDPipeline:
    """Host-side convenience wrapper with the reference's call signature
    (reference: smsd.py:90-125): raw style-prompt strings in, loss / sampled
    style vectors out.  Composes the frozen style-text encoder with the MDN
    head; inside jitted training use the split pieces directly."""

    def __init__(self, cfg: SMSDConfig, style_encoder=None, params=None, seed: int = 0):
        import numpy as np

        from mamba_tts_tpu.config import StyleEncoderConfig
        from mamba_tts_tpu.models.style_text_encoder import StyleTextEncoder

        self.cfg = cfg
        if style_encoder is not None:
            self.encoder = style_encoder
        elif cfg.bert_dim == 768:
            self.encoder = StyleTextEncoder(StyleEncoderConfig())
        else:
            heads = next(h for h in (12, 8, 4, 2, 1) if cfg.bert_dim % h == 0)
            self.encoder = StyleTextEncoder(
                StyleEncoderConfig(
                    d_model=cfg.bert_dim, n_layers=2, n_heads=heads,
                    d_ff=4 * cfg.bert_dim,
                )
            )
        self.module = SMSD(cfg)
        if params is None:
            x = jnp.zeros((1, cfg.bert_dim))
            params = self.module.init(jax.random.PRNGKey(seed), x)["params"]
        self.params = params

    def __call__(self, style_texts, y_true=None, return_params: bool = False, seed: int = 0):
        if isinstance(style_texts, str):
            style_texts = [style_texts]
        x = self.encoder.embed(style_texts)
        mvars = {"params": self.params}
        if y_true is not None:
            return self.module.apply(
                mvars, x, jnp.asarray(y_true), deterministic=True, method=SMSD.loss
            )
        rng = jax.random.PRNGKey(seed)
        y = self.module.apply(mvars, x, rng, method=SMSD.sample)
        if return_params:
            return y, self.module.apply(mvars, x)
        return y
