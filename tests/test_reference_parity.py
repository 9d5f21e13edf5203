"""Numerical parity vs the ACTUAL reference code (torch CPU).

BASELINE.md north star: "forward logits within 1e-4 of PyTorch reference
semantics".  The reference modules that import cleanly offline are loaded
here, their weights are copied into the Flax modules, and outputs are
compared on shared random inputs:

- style_cross_attention.py (StyleProjection / StyleTextCrossAttention /
  StyleDecoderCrossAttention / LengthRegulator / StyleConditioningPipeline)
- smsd.py (MDNHead all four variance modes, mixture_nll_loss, NoiseNet)
- text_encoder.py (DurationPredictor.compute_loss, TextProcessor
  batch_process) — importable once the vendored ``lib.FastSpeech2`` imports
  are stubbed; only the stub-free code paths are exercised.

NOT importable offline (documented, pinned to equations instead):
- mamba_decoder.py: imports mamba_ssm (CUDA-only package, not installed).
  The selective-scan semantics are pinned by tests/test_selective_scan.py
  against the SSM recurrence equations, and the layer contract
  ``(out, new_state) = mamba(x, state)`` is the reference's *documented*
  contract (its literal code does not run: SURVEY §7 defect 1).
- smsd.py SMSD class / text_processor.py: construct
  ``BertModel.from_pretrained('bert-base-uncased')`` / g2p_en+nltk at
  __init__, requiring network/assets this environment does not have.

Mask-convention flip: the reference uses True=pad in the text stack; this
framework uses True=valid everywhere (CLAUDE.md).  Tests flip at the
boundary.
"""
from __future__ import annotations

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub_fastspeech2():
    """Install import stubs for the vendored lib.FastSpeech2 modules so the
    reference text_encoder.py imports; stubbed symbols are never executed by
    the code paths tested here."""
    for name in (
        "lib",
        "lib.FastSpeech2",
        "lib.FastSpeech2.transformer",
        "lib.FastSpeech2.model",
    ):
        sys.modules.setdefault(name, types.ModuleType(name))
    models = types.ModuleType("lib.FastSpeech2.transformer.Models")
    models.get_sinusoid_encoding_table = lambda *a, **k: torch.zeros(1)
    layers = types.ModuleType("lib.FastSpeech2.transformer.Layers")
    layers.FFTBlock = object
    modules = types.ModuleType("lib.FastSpeech2.model.modules")
    modules.VariancePredictor = object
    sys.modules.setdefault("lib.FastSpeech2.transformer.Models", models)
    sys.modules.setdefault("lib.FastSpeech2.transformer.Layers", layers)
    sys.modules.setdefault("lib.FastSpeech2.model.modules", modules)


def t2n(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def lin(mod):
    """torch nn.Linear -> flax Dense params."""
    return {"kernel": t2n(mod.weight).T, "bias": t2n(mod.bias)}


def ln(mod):
    """torch nn.LayerNorm -> flax LayerNorm params."""
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def mha(mod, d):
    """torch nn.MultiheadAttention -> q/k/v/o Dense params."""
    w = t2n(mod.in_proj_weight)  # (3d, d)
    b = t2n(mod.in_proj_bias)  # (3d,)
    return {
        "q_proj": {"kernel": w[:d].T, "bias": b[:d]},
        "k_proj": {"kernel": w[d : 2 * d].T, "bias": b[d : 2 * d]},
        "v_proj": {"kernel": w[2 * d :].T, "bias": b[2 * d :]},
        "o_proj": {"kernel": t2n(mod.out_proj.weight).T, "bias": t2n(mod.out_proj.bias)},
    }


def cross_attn_params(ref_block, d):
    """reference Style{Text,Decoder}CrossAttention -> StyleCrossAttnBlock."""
    p = mha(ref_block.cross_attn, d)
    p["attn_ln"] = ln(ref_block.norm)
    p["ffn1"] = lin(ref_block.ffn[0])
    p["ffn2"] = lin(ref_block.ffn[3])
    p["ffn_ln"] = ln(ref_block.ffn_norm)
    return p


@pytest.fixture(scope="module")
def ref_style():
    import style_cross_attention as ref

    return ref


@pytest.fixture(scope="module")
def ref_smsd():
    import smsd as ref

    return ref


def _style_cfg(d_style=32, d_model=64, num_heads=4):
    from mamba_tts_tpu.config import StylePipelineConfig

    return StylePipelineConfig(
        d_style=d_style, d_model=d_model, num_heads=num_heads, dtype="float32"
    )


class TestStyleCrossAttentionParity:
    D_STYLE, D_MODEL, HEADS = 32, 64, 4

    def test_style_projection(self, ref_style):
        from mamba_tts_tpu.models.style import StyleProjection

        torch.manual_seed(0)
        ref = ref_style.StyleProjection(self.D_STYLE, self.D_MODEL).eval()
        params = {
            "key_dense": lin(ref.key_proj[0]),
            "key_ln": ln(ref.key_proj[1]),
            "value_dense": lin(ref.value_proj[0]),
            "value_ln": ln(ref.value_proj[1]),
        }
        x = np.random.RandomState(1).randn(3, self.D_STYLE).astype(np.float32)
        with torch.no_grad():
            k_ref, v_ref = ref(torch.from_numpy(x))
        k, v = StyleProjection(_style_cfg()).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(k), t2n(k_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), t2n(v_ref), atol=1e-4)

    @pytest.mark.parametrize("ref_cls", ["StyleTextCrossAttention", "StyleDecoderCrossAttention"])
    def test_cross_attention_block(self, ref_style, ref_cls):
        from mamba_tts_tpu.models.style import StyleCrossAttnBlock

        torch.manual_seed(1)
        ref = getattr(ref_style, ref_cls)(self.D_MODEL, num_heads=self.HEADS).eval()
        params = cross_attn_params(ref, self.D_MODEL)
        rs = np.random.RandomState(2)
        x = rs.randn(3, 11, self.D_MODEL).astype(np.float32)
        sk = rs.randn(3, 1, self.D_MODEL).astype(np.float32)
        sv = rs.randn(3, 1, self.D_MODEL).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x), torch.from_numpy(sk), torch.from_numpy(sv))
        y = StyleCrossAttnBlock(_style_cfg()).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(sk), jnp.asarray(sv)
        )
        np.testing.assert_allclose(np.asarray(y), t2n(y_ref), atol=1e-4)

    def test_length_regulator(self, ref_style):
        from mamba_tts_tpu.models.style import length_regulate

        ref = ref_style.LengthRegulator()
        rs = np.random.RandomState(3)
        hidden = rs.randn(4, 9, 6).astype(np.float32)
        # fractional durations exercise round-half-to-even; include zeros
        dur = np.round(rs.uniform(0, 4.0, (4, 9)), 2).astype(np.float32)
        dur[0, :3] = 0.0
        with torch.no_grad():
            exp_ref, len_ref = ref(torch.from_numpy(hidden), torch.from_numpy(dur))
        max_len = exp_ref.shape[1]
        exp, lens = length_regulate(jnp.asarray(hidden), jnp.asarray(dur), max_len)
        np.testing.assert_array_equal(np.asarray(lens), t2n(len_ref).astype(np.int64))
        np.testing.assert_allclose(np.asarray(exp), t2n(exp_ref), atol=1e-6)

    def test_length_regulator_clipped(self, ref_style):
        """max_len shorter than the longest expansion truncates identically."""
        from mamba_tts_tpu.models.style import length_regulate

        ref = ref_style.LengthRegulator()
        rs = np.random.RandomState(4)
        hidden = rs.randn(2, 5, 3).astype(np.float32)
        dur = rs.randint(1, 6, (2, 5)).astype(np.float32)
        max_len = 7
        with torch.no_grad():
            exp_ref, _ = ref(torch.from_numpy(hidden), torch.from_numpy(dur), max_len=max_len)
        exp, _ = length_regulate(jnp.asarray(hidden), jnp.asarray(dur), max_len)
        np.testing.assert_allclose(np.asarray(exp), t2n(exp_ref), atol=1e-6)

    def test_full_pipeline(self, ref_style):
        from mamba_tts_tpu.models.style import StyleConditioningPipeline

        torch.manual_seed(5)
        ref = ref_style.StyleConditioningPipeline(
            d_style=self.D_STYLE, d_model=self.D_MODEL, num_heads=self.HEADS
        ).eval()
        params = {
            "style_proj": {
                "key_dense": lin(ref.style_proj.key_proj[0]),
                "key_ln": ln(ref.style_proj.key_proj[1]),
                "value_dense": lin(ref.style_proj.value_proj[0]),
                "value_ln": ln(ref.style_proj.value_proj[1]),
            },
            "cross_attn_1": cross_attn_params(ref.cross_attn_1, self.D_MODEL),
            "cross_attn_2": cross_attn_params(ref.cross_attn_2, self.D_MODEL),
        }
        rs = np.random.RandomState(6)
        B, T = 3, 10
        text_hidden = rs.randn(B, T, self.D_MODEL).astype(np.float32)
        style_emb = rs.randn(B, self.D_STYLE).astype(np.float32)
        dur = rs.randint(1, 5, (B, T)).astype(np.float32)
        with torch.no_grad():
            frames_ref, lens_ref, k_ref, v_ref = ref(
                torch.from_numpy(text_hidden),
                torch.from_numpy(style_emb),
                torch.from_numpy(dur),
            )
        max_len = frames_ref.shape[1]
        frames, lens, k, v = StyleConditioningPipeline(_style_cfg()).apply(
            {"params": params},
            jnp.asarray(text_hidden),
            jnp.asarray(style_emb),
            jnp.asarray(dur),
            max_frame_len=max_len,
        )
        np.testing.assert_array_equal(np.asarray(lens), t2n(lens_ref).astype(np.int64))
        np.testing.assert_allclose(np.asarray(k), t2n(k_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), t2n(v_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(frames), t2n(frames_ref), atol=1e-4)


MODES = ["isotropic_across_clusters", "isotropic", "diagonal", "fixed"]


class TestSMSDParity:
    BERT, STYLE, K, HID = 48, 16, 5, 32

    def _cfg(self, mode):
        from mamba_tts_tpu.config import SMSDConfig

        return SMSDConfig(
            bert_dim=self.BERT, style_dim=self.STYLE, num_mixtures=self.K,
            hidden_dim=self.HID, variance_mode=mode,
        )

    def _mdn_params(self, ref_head, mode):
        params = {
            "ln": ln(ref_head.mlp[0]),
            "fc1": lin(ref_head.mlp[1]),
            "fc2": lin(ref_head.mlp[4]),
            "pi_head": lin(ref_head.pi_head),
            "mu_head": lin(ref_head.mu_head),
        }
        if mode != "fixed":
            params["sigma_head"] = lin(ref_head.sigma_head)
            params["noise_net"] = {
                "noise_scale": t2n(ref_head.noise_net.noise_scale)
            }
        return params

    @pytest.mark.parametrize("mode", MODES)
    def test_mdn_head(self, ref_smsd, mode):
        from mamba_tts_tpu.models.smsd import MDNHead

        torch.manual_seed(7)
        ref = ref_smsd.MDNHead(self.BERT, self.STYLE, self.K, self.HID,
                               variance_mode=mode).eval()
        x = np.random.RandomState(8).randn(4, self.BERT).astype(np.float32)
        with torch.no_grad():
            pi_ref, mu_ref, sigma_ref = ref(torch.from_numpy(x))
        pi, mu, sigma = MDNHead(self._cfg(mode)).apply(
            {"params": self._mdn_params(ref, mode)}, jnp.asarray(x)
        )
        np.testing.assert_allclose(np.asarray(pi), t2n(pi_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mu), t2n(mu_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sigma), t2n(sigma_ref), atol=1e-5)

    @pytest.mark.parametrize("mode", ["isotropic", "diagonal", "fixed"])
    def test_mixture_nll_loss(self, ref_smsd, mode):
        from mamba_tts_tpu.models.smsd import mixture_nll_loss

        rs = np.random.RandomState(9)
        B, K, d = 4, self.K, self.STYLE
        y = rs.randn(B, d).astype(np.float32)
        pi = rs.dirichlet(np.ones(K), B).astype(np.float32)
        mu = rs.randn(B, K, d).astype(np.float32)
        if mode == "isotropic":
            sigma = rs.uniform(0.3, 1.5, (B, K)).astype(np.float32)
        elif mode == "diagonal":
            sigma = rs.uniform(0.3, 1.5, (B, K, d)).astype(np.float32)
        else:
            sigma = np.zeros(B, np.float32)  # ignored in fixed mode
        with torch.no_grad():
            nll_ref = ref_smsd.mixture_nll_loss(
                torch.from_numpy(y), torch.from_numpy(pi), torch.from_numpy(mu),
                torch.from_numpy(sigma), variance_mode=mode,
            )
        nll = mixture_nll_loss(
            jnp.asarray(y), jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(sigma),
            variance_mode=mode,
        )
        np.testing.assert_allclose(float(nll), float(nll_ref), rtol=1e-5)

    def test_mixture_nll_loss_across_clusters(self, ref_smsd):
        """Reference DEFECT: in the default 'isotropic_across_clusters' mode
        the literal reference code broadcasts the (B,) log-variance term
        against a (B, K) tensor along the WRONG axis — it raises for B != K
        (and computes garbage when B == K).  Reference: smsd.py:317-327.
        The docstring contract is the spec (SURVEY §7 design stance):
        a scalar sigma per example shared across all K components — exactly
        the reference's own (correct) 'isotropic' formula with that sigma
        repeated per component.  We pin both facts."""
        from mamba_tts_tpu.models.smsd import mixture_nll_loss

        rs = np.random.RandomState(9)
        B, K, d = 4, self.K, self.STYLE
        y = rs.randn(B, d).astype(np.float32)
        pi = rs.dirichlet(np.ones(K), B).astype(np.float32)
        mu = rs.randn(B, K, d).astype(np.float32)
        sigma = rs.uniform(0.3, 1.5, (B,)).astype(np.float32)

        with pytest.raises(RuntimeError):  # the defect, pinned
            ref_smsd.mixture_nll_loss(
                torch.from_numpy(y), torch.from_numpy(pi), torch.from_numpy(mu),
                torch.from_numpy(sigma), variance_mode="isotropic_across_clusters",
            )

        with torch.no_grad():  # the contract, via the reference's own math
            nll_ref = ref_smsd.mixture_nll_loss(
                torch.from_numpy(y), torch.from_numpy(pi), torch.from_numpy(mu),
                torch.from_numpy(np.repeat(sigma[:, None], K, axis=1)),
                variance_mode="isotropic",
            )
        nll = mixture_nll_loss(
            jnp.asarray(y), jnp.asarray(pi), jnp.asarray(mu), jnp.asarray(sigma),
            variance_mode="isotropic_across_clusters",
        )
        np.testing.assert_allclose(float(nll), float(nll_ref), rtol=1e-5)

    def test_noise_net_eval_identity(self, ref_smsd):
        from mamba_tts_tpu.models.smsd import NoiseNet

        ref = ref_smsd.NoiseNet().eval()
        x = np.random.RandomState(10).randn(3, 5).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x))
        y = NoiseNet().apply(
            {"params": {"noise_scale": np.float32(0.1)}}, jnp.asarray(x),
            deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(y), t2n(y_ref), atol=0)

    def test_mdn_loss_end_to_end(self, ref_smsd):
        """MDNHead forward + NLL chained, as SMSD.loss computes it.
        'isotropic' mode: the reference's default-mode NLL is broken (see
        test_mixture_nll_loss_across_clusters)."""
        from mamba_tts_tpu.models.smsd import SMSD

        mode = "isotropic"
        torch.manual_seed(11)
        ref = ref_smsd.MDNHead(self.BERT, self.STYLE, self.K, self.HID,
                               variance_mode=mode).eval()
        rs = np.random.RandomState(12)
        x = rs.randn(4, self.BERT).astype(np.float32)
        y = rs.randn(4, self.STYLE).astype(np.float32)
        with torch.no_grad():
            pi, mu, sigma = ref(torch.from_numpy(x))
            nll_ref = ref_smsd.mixture_nll_loss(
                torch.from_numpy(y), pi, mu, sigma, variance_mode=mode
            )
        params = {"mdn_head": self._mdn_params(ref, mode)}
        nll = SMSD(self._cfg(mode)).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(y),
            deterministic=True, method=SMSD.loss,
        )
        np.testing.assert_allclose(float(nll), float(nll_ref), rtol=1e-5)


class TestTextEncoderParity:
    @pytest.fixture(scope="class")
    def ref_te(self):
        _stub_fastspeech2()
        import text_encoder as ref

        return ref

    def test_duration_loss(self, ref_te):
        from mamba_tts_tpu.models.text_encoder import duration_loss

        rs = np.random.RandomState(13)
        B, T = 4, 12
        pred = rs.randn(B, T).astype(np.float32)
        target = rs.randint(0, 9, (B, T)).astype(np.float32)
        pad_mask = rs.rand(B, T) < 0.3  # True = pad (reference convention)
        dp = ref_te.DurationPredictor.__new__(ref_te.DurationPredictor)
        with torch.no_grad():
            loss_ref = dp.compute_loss(
                torch.from_numpy(pred), torch.from_numpy(target),
                torch.from_numpy(pad_mask),
            )
            loss_ref_nomask = dp.compute_loss(
                torch.from_numpy(pred), torch.from_numpy(target)
            )
        loss = duration_loss(jnp.asarray(pred), jnp.asarray(target),
                             mask=jnp.asarray(~pad_mask))
        loss_nomask = duration_loss(jnp.asarray(pred), jnp.asarray(target))
        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(float(loss_nomask), float(loss_ref_nomask), rtol=1e-5)

    def test_text_processor_batch(self, ref_te):
        """Pre-phonemized batch tokenization: same ids, flipped mask."""
        from mamba_tts_tpu.text.processor import TextProcessor

        vocab = os.path.join(REF, "phoneme_vocab.json")
        ref_tp = ref_te.TextProcessor(vocab)
        tp = TextProcessor(vocab)
        texts = ["HH AH0 L OW1 | W ER1 L D", "DH IH1 S !", "<BOS> K AE1 T <EOS>"]
        ids_ref, lens_ref, pad_mask_ref = ref_tp.batch_process(texts)
        ids, lens, mask = tp.batch_process(texts)
        np.testing.assert_array_equal(np.asarray(ids), t2n(ids_ref).astype(np.int64))
        assert list(lens) == list(lens_ref)
        np.testing.assert_array_equal(np.asarray(mask), ~t2n(pad_mask_ref).astype(bool))

    def test_sinusoid_table(self, ref_te):
        """Our table vs the FS2 formula the reference buffers (the stubbed
        get_sinusoid_encoding_table is not executed; compare to the published
        FS2 math re-stated in torch)."""
        from mamba_tts_tpu.models.text_encoder import sinusoid_position_table

        n_pos, d = 50, 16
        pos = torch.arange(n_pos, dtype=torch.float64)[:, None]
        i = torch.arange(d, dtype=torch.float64)[None, :]
        angle = pos / torch.pow(torch.tensor(10000.0, dtype=torch.float64),
                                2 * torch.div(i, 2, rounding_mode="floor") / d)
        want = torch.zeros(n_pos, d)
        want[:, 0::2] = torch.sin(angle[:, 0::2]).float()
        want[:, 1::2] = torch.cos(angle[:, 1::2]).float()
        np.testing.assert_allclose(
            sinusoid_position_table(n_pos, d), t2n(want), atol=1e-6
        )
