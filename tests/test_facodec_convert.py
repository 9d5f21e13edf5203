"""FACodec torch->Flax weight-conversion tests.

Builds REAL torch modules replicating the upstream ``ns3_codec`` graph and
state-dict naming (WNConv1d = torch weight_norm, Snake1d alpha (1,C,1),
``block.{i}`` / ``model.{i}`` / ``quantizer.{b}.quantizers.{j}`` /
``timbre_encoder.layers.{i}`` keys), converts their state dicts with
:func:`convert_torch_facodec`, and asserts NUMERICAL parity of the Flax
forward vs the torch forward — encoder latents, VQ ids, quantized latents,
timbre embeddings, and the full decode-to-waveform path — plus full
parameter coverage (reference: data_utils/audio_encoder.py:143-176;
VERDICT r1 item 2).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from mamba_tts_tpu.config import CodecConfig  # noqa: E402
from mamba_tts_tpu.models.facodec import FACodec, convert_torch_facodec  # noqa: E402

CFG = CodecConfig(
    ngf=4,
    up_ratios=(2, 4),  # hop 8
    latent_dim=16,
    codebook_size=16,
    codebook_dim=4,
    spk_dim=16,  # pretrained timbre embeddings are latent_dim-sized
    max_seq_len=32,
    decoder_initial_channels=32,
)


def WNConv1d(*args, **kwargs):
    return tnn.utils.weight_norm(tnn.Conv1d(*args, **kwargs))


def WNConvTranspose1d(*args, **kwargs):
    return tnn.utils.weight_norm(tnn.ConvTranspose1d(*args, **kwargs))


class Snake1d(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = tnn.Parameter(torch.rand(1, dim, 1) + 0.5)

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class TResidualUnit(tnn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = tnn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        return x + self.block(x)


class TEncoderBlock(tnn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TResidualUnit(dim // 2, 1),
            TResidualUnit(dim // 2, 3),
            TResidualUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class TEncoder(tnn.Module):
    """Upstream FACodecEncoder: keys block.0 .. block.{n+2}."""

    def __init__(self, cfg):
        super().__init__()
        d = cfg.ngf
        blocks = [WNConv1d(1, d, kernel_size=7, padding=3)]
        for stride in cfg.up_ratios:
            d *= 2
            blocks += [TEncoderBlock(d, stride)]
        blocks += [Snake1d(d), WNConv1d(d, cfg.latent_dim, kernel_size=3, padding=1)]
        self.block = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class TDecoderBlock(tnn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.block = tnn.Sequential(
            Snake1d(c_in),
            WNConvTranspose1d(c_in, c_out, kernel_size=2 * stride, stride=stride,
                              padding=math.ceil(stride / 2),
                              output_padding=stride % 2),
            TResidualUnit(c_out, 1),
            TResidualUnit(c_out, 3),
            TResidualUnit(c_out, 9),
        )

    def forward(self, x):
        return self.block(x)


class TFVQ(tnn.Module):
    """Upstream FactorizedVectorQuantize (inference path)."""

    def __init__(self, latent_dim, codebook_size, codebook_dim):
        super().__init__()
        self.in_proj = WNConv1d(latent_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, latent_dim, kernel_size=1)
        self.codebook = tnn.Embedding(codebook_size, codebook_dim)

    def forward(self, z):  # z: (B, D, T)
        B, _, T = z.shape
        z_e = self.in_proj(z)  # (B, cd, T)
        enc = F.normalize(z_e.permute(0, 2, 1).reshape(B * T, -1))
        cb = F.normalize(self.codebook.weight)
        dist = (
            enc.pow(2).sum(1, keepdim=True)
            - 2 * enc @ cb.t()
            + cb.pow(2).sum(1, keepdim=True).t()
        )
        ids = (-dist).max(1)[1].view(B, T)
        z_q = self.codebook(ids).permute(0, 2, 1)  # unnormalized lookup
        return self.out_proj(z_q), ids


class TRVQ(tnn.Module):
    def __init__(self, num_q, latent_dim, codebook_size, codebook_dim):
        super().__init__()
        self.quantizers = tnn.ModuleList(
            [TFVQ(latent_dim, codebook_size, codebook_dim) for _ in range(num_q)]
        )

    def forward(self, z):
        residual, total, ids = z, 0.0, []
        for q in self.quantizers:
            zq, i = q(residual)
            residual = residual - zq
            total = total + zq
            ids.append(i)
        return total, torch.stack(ids, dim=0)


class TFFN(tnn.Module):
    def __init__(self, hidden, filter_size, kernel_size=5):
        super().__init__()
        self.ffn_1 = tnn.Conv1d(hidden, filter_size, kernel_size, padding=kernel_size // 2)
        self.ffn_2 = tnn.Linear(filter_size, hidden)

    def forward(self, x):  # (B, T, H)
        h = self.ffn_1(x.permute(0, 2, 1)).permute(0, 2, 1)
        return self.ffn_2(F.relu(h))


class TTimbreLayer(tnn.Module):
    def __init__(self, hidden, heads, filter_size):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(hidden)
        self.self_attn = tnn.MultiheadAttention(hidden, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(hidden)
        self.ffn = TFFN(hidden, filter_size)

    def forward(self, x):
        h = self.ln_1(x)
        attn, _ = self.self_attn(h, h, h, need_weights=False)
        x = x + attn
        return x + self.ffn(self.ln_2(x))


class TTimbreEncoder(tnn.Module):
    def __init__(self, hidden, heads=4, filter_size=1024, n_layers=4):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TTimbreLayer(hidden, heads, filter_size) for _ in range(n_layers)]
        )
        self.last_ln = tnn.LayerNorm(hidden)

    def forward(self, x):  # (B, T, H)
        for layer in self.layers:
            x = layer(x)
        return self.last_ln(x)


class TDecoder(tnn.Module):
    """Upstream FACodecDecoder param container: quantizer / timbre_encoder /
    timbre_linear / timbre_norm / model."""

    def __init__(self, cfg):
        super().__init__()
        self.quantizer = tnn.ModuleList([
            TRVQ(cfg.vq_num_q_p, cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim),
            TRVQ(cfg.vq_num_q_c, cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim),
            TRVQ(cfg.vq_num_q_r, cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim),
        ])
        self.timbre_encoder = TTimbreEncoder(cfg.latent_dim)
        self.timbre_linear = tnn.Linear(cfg.latent_dim, cfg.latent_dim * 2)
        self.timbre_linear.bias.data[: cfg.latent_dim] = 1
        self.timbre_linear.bias.data[cfg.latent_dim :] = 0
        self.timbre_norm = tnn.LayerNorm(cfg.latent_dim, elementwise_affine=False)
        ch = cfg.decoder_initial_channels
        model = [WNConv1d(cfg.latent_dim, ch, kernel_size=7, padding=3)]
        for stride in reversed(cfg.up_ratios):
            model += [TDecoderBlock(ch, ch // 2, stride)]
            ch //= 2
        model += [Snake1d(ch), WNConv1d(ch, 1, kernel_size=7, padding=3), tnn.Tanh()]
        self.model = tnn.Sequential(*model)

    def quantize(self, x):  # x: (B, D, T) latents
        qp, idp = self.quantizer[0](x)
        qc, idc = self.quantizer[1](x - qp)
        qr, idr = self.quantizer[2](x - qp - qc)
        # stream order [Qp, Qr..., Qc] (the framework's pinned contract)
        return qp + qc + qr, torch.cat([idp, idr, idc], dim=0)

    def forward(self, x):  # full inference: latents -> (recon, ids, spk)
        quantized, ids = self.quantize(x)
        spk = self.timbre_encoder(x.transpose(1, 2)).mean(dim=1)
        style = self.timbre_linear(spk).unsqueeze(2)  # (B, 2D, 1)
        gamma, beta = style.chunk(2, 1)
        z = self.timbre_norm(quantized.transpose(1, 2)).transpose(1, 2)
        z = z * gamma + beta
        return self.model(z), ids, spk


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    enc = TEncoder(CFG).eval()
    dec = TDecoder(CFG).eval()
    params = convert_torch_facodec(enc.state_dict(), dec.state_dict(), CFG)
    return enc, dec, params


def test_conversion_covers_every_param(converted):
    """convert_torch_facodec itself asserts coverage (raises on any missing
    / extra / mismatched leaf); verify the tree is non-trivially populated."""
    _, _, params = converted
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n > 10_000
    assert set(params) == {
        "encoder", "timbre", "vq_prosody", "vq_content", "vq_residual", "decoder"
    }


def test_missing_key_is_reported():
    torch.manual_seed(1)
    enc_sd = TEncoder(CFG).state_dict()
    dec_sd = TDecoder(CFG).state_dict()
    del dec_sd["timbre_linear.weight"]
    with pytest.raises((ValueError, KeyError)):
        convert_torch_facodec(enc_sd, dec_sd, CFG)


def test_encoder_parity(converted):
    enc, _, params = converted
    wav = np.random.RandomState(0).randn(2, 128).astype(np.float32) * 0.3
    with torch.no_grad():
        want = enc(torch.from_numpy(wav)[:, None, :]).permute(0, 2, 1).numpy()
    got = FACodec(CFG).apply(
        {"params": params}, jnp.asarray(wav),
        method=lambda m, w: m.encoder(w),
    )
    assert got.shape == want.shape == (2, 16, CFG.latent_dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_full_pipeline_parity(converted):
    """wav -> latents -> VQ ids -> FiLM -> generator -> waveform, torch vs
    converted Flax, end to end."""
    enc, dec, params = converted
    wav = np.random.RandomState(1).randn(2, 128).astype(np.float32) * 0.3
    with torch.no_grad():
        lat = enc(torch.from_numpy(wav)[:, None, :])
        recon_t, ids_t, spk_t = dec(lat)

    m = FACodec(CFG)
    ids, quantized, spk = m.apply({"params": params}, jnp.asarray(wav), method=FACodec.quantize)
    np.testing.assert_array_equal(np.asarray(ids), ids_t.numpy())
    np.testing.assert_allclose(np.asarray(spk), spk_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(quantized), quantized_torch(dec, lat).numpy(), atol=2e-4
    )
    recon, ids2, spk2 = m.apply({"params": params}, jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(ids2), ids_t.numpy())
    np.testing.assert_allclose(
        np.asarray(recon), recon_t[:, 0, :].numpy(), atol=5e-4
    )


def quantized_torch(dec, lat):
    with torch.no_grad():
        q, _ = dec.quantize(lat)
    return q.permute(0, 2, 1)


def test_decode_from_ids_parity(converted):
    """latents_from_ids + decode reproduce the torch decode of the same ids."""
    enc, dec, params = converted
    wav = np.random.RandomState(2).randn(1, 128).astype(np.float32) * 0.3
    m = FACodec(CFG)
    ids, spk = m.apply({"params": params}, jnp.asarray(wav), method=FACodec.encode)
    wav_out = m.apply({"params": params}, ids, spk, method=FACodec.decode)

    with torch.no_grad():
        ids_t = torch.from_numpy(np.asarray(ids))
        p, r = CFG.vq_num_q_p, CFG.vq_num_q_r
        branches = [(0, ids_t[:p]), (2, ids_t[p : p + r]), (1, ids_t[p + r :])]
        total = 0.0
        for b, bids in branches:
            for j, q in enumerate(dec.quantizer[b].quantizers):
                total = total + q.out_proj(q.codebook(bids[j]).permute(0, 2, 1))
        spk_t = torch.from_numpy(np.asarray(spk))
        style = dec.timbre_linear(spk_t).unsqueeze(2)
        gamma, beta = style.chunk(2, 1)
        z = dec.timbre_norm(total.transpose(1, 2)).transpose(1, 2) * gamma + beta
        want = dec.model(z)[:, 0, :].numpy()
    np.testing.assert_allclose(np.asarray(wav_out), want, atol=5e-4)


def test_load_torch_facodec_roundtrip(tmp_path, converted):
    """The file-loading entry point: save real torch checkpoints, load +
    convert, get the identical tree."""
    from mamba_tts_tpu.models.facodec import load_torch_facodec

    enc, dec, params = converted
    ep, dp = tmp_path / "enc.bin", tmp_path / "dec.bin"
    torch.save(enc.state_dict(), ep)
    torch.save(dec.state_dict(), dp)
    loaded = load_torch_facodec(str(ep), str(dp), CFG)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    for k, v in flat1:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(k)]))


def test_load_torch_facodec_missing_file(tmp_path):
    from mamba_tts_tpu.models.facodec import load_torch_facodec

    with pytest.raises(FileNotFoundError):
        load_torch_facodec(str(tmp_path / "nope.bin"), str(tmp_path / "nope2.bin"), CFG)
