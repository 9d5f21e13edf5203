"""FACodec-compatible factorized neural audio codec (Flax, TPU-native).

Fills the role of the vendored NaturalSpeech3 FACodec V2 encoder/decoder the
reference instantiates (reference: data_utils/audio_encoder.py:143-176):

    wave (B, T) @16 kHz --encode--> latents @80 Hz (hop 200 = prod(2,4,5,5))
        --factorize+quantize--> vq ids (num_q, B, T_f) + speaker embedding
    vq ids --decode--> wave (the synthesis vocoder path; the reference loads
        the decoder but never uses it for synthesis — here it is first-class)

The module graph is ISOMORPHIC to the upstream ``ns3_codec`` torch graph
(DAC lineage) so that the released ``amphion/naturalspeech3_facodec``
checkpoints convert name-for-name via :func:`load_torch_facodec`:

- Encoder: WNConv1d stem -> 4x EncoderBlock [3 dilated ResidualUnits +
  Snake + strided WNConv1d down (2,4,5,5)] -> Snake -> WNConv1d head.
  (upstream keys ``block.0`` .. ``block.6``)
- Quantizers: three branches [prosody, content, residual], each a residual
  stack of FactorizedVectorQuantize units (1x1 in_proj -> L2-NORMALIZED
  nearest-code lookup in the codebook_dim space -> unnormalized embedding
  -> 1x1 out_proj).  (upstream keys ``quantizer.{0,1,2}.quantizers.{j}``)
- Timbre: pre-LN transformer (MHA + conv-FFN) over encoder latents, mean
  pooled -> (B, spk_dim); decoder applies it as gamma/beta FiLM over the
  LayerNorm'd quantized latents (``timbre_encoder``, ``timbre_norm``,
  ``timbre_linear``).
- Decoder/generator: WNConv1d stem -> 4x DecoderBlock [Snake +
  WNConvTranspose1d up (5,5,4,2) + 3 ResidualUnits] -> Snake -> WNConv1d
  -> tanh.  (upstream keys ``model.0`` .. ``model.7``)

Everything is channels-last (B, T, C) with paddings chosen to match torch's
exactly; weight-normed convs are loaded FUSED (w = g * v / ||v||) since the
codec is used frozen (reference: audio_encoder.py:175-176).

Quantizer stream layout and counts are pinned to the documented 5-stream
contract [Qp, Qr1, Qr2, Qr3, Qc] (reference: audio_encoder.py:222-256;
SURVEY §7 defect 8 — the reference's vq_num_q_c=2 configuration contradicts
its own 5-stream slicing; we pin 1 prosody + 3 residual + 1 content).
NOTE the reference passes ``codebook_size_*=10`` which upstream
exponentiates (2**10 = 1024 codes per codebook); its own
``vocab_size_audio=10`` (reference: train.py:60-63) is the same defect
family.  ``CodecConfig.codebook_size`` here is the ACTUAL code count.

The V2-only mel-side prosody feature is intentionally not modeled: the
reference invokes the decoder with the V1 call signature
``fa_decoder(enc, eval_vq=False, vq=True)`` (reference:
audio_encoder.py:218-221), which never supplies that second input — the
latent-side factorization above is the graph those calls exercise.

Gradient-reversal adversarial heads of the original (use_gr_*) are training
-time-only machinery for disentanglement; :func:`grad_reverse` is provided
and the corresponding checkpoint keys are deliberately left unloaded.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import CodecConfig


@jax.custom_vjp
def grad_reverse(x):
    """Identity forward, negated gradient backward (GRL)."""
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (jax.tree.map(lambda t: -t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class Snake(nn.Module):
    """Snake activation x + sin^2(a*x)/a with per-channel learnable a
    (torch Snake1d stores alpha as (1, C, 1); here (C,))."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,), jnp.float32)
        a = alpha[None, None, :].astype(x.dtype)
        return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


class ResidualUnit(nn.Module):
    """Snake -> WNConv1d(k7, dilated) -> Snake -> WNConv1d(k1) + skip
    (upstream keys ``block.{0..3}`` inside the unit)."""

    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = 3 * self.dilation  # ((7-1)*d)//2, torch padding
        h = Snake(self.channels, name="snake1")(x)
        h = nn.Conv(
            self.channels, (7,), kernel_dilation=(self.dilation,),
            padding=[(pad, pad)], name="conv1",
        )(h)
        h = Snake(self.channels, name="snake2")(h)
        h = nn.Conv(self.channels, (1,), name="conv2")(h)
        return x + h


class EncoderBlock(nn.Module):
    """3 dilated ResidualUnits -> Snake -> strided downsample conv
    (upstream EncoderBlock.block.{0..4}; down conv k=2*stride,
    padding=ceil(stride/2) both sides, torch semantics)."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(c_in, d, name=f"res_{i}")(x)
        x = Snake(c_in, name="snake")(x)
        p = (self.stride + 1) // 2
        return nn.Conv(
            self.out_channels, (2 * self.stride,), strides=(self.stride,),
            padding=[(p, p)], name="down",
        )(x)


class CodecEncoder(nn.Module):
    """wave (B, T) -> latents (B, T // hop, latent_dim)
    (upstream FACodecEncoder.block.{0..6})."""

    cfg: CodecConfig

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        c = self.cfg
        x = wav[..., None]  # (B, T, 1)
        ch = c.ngf
        x = nn.Conv(ch, (7,), padding=[(3, 3)], name="stem")(x)
        for i, r in enumerate(c.up_ratios):
            ch *= 2
            x = EncoderBlock(ch, r, name=f"block_{i}")(x)
        x = Snake(ch, name="snake_out")(x)
        return nn.Conv(c.latent_dim, (3,), padding=[(1, 1)], name="head")(x)


class ConvTranspose1dTorch(nn.Module):
    """Transposed conv with EXACT torch ConvTranspose1d semantics:
    kernel k = 2*stride, padding = ceil(stride/2), output_padding = stride%2
    => output length = T * stride.

    Kernel stored as (k, in, out) already FLIPPED along k relative to the
    torch (in, out, k) layout, so the forward is one
    ``lax.conv_general_dilated`` with lhs_dilation (the standard
    transposed-conv-as-fractionally-strided-conv identity).
    """

    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        s = self.stride
        k = 2 * s
        p = (s + 1) // 2
        op = s % 2
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(kernel.dtype),
            kernel,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class DecoderBlock(nn.Module):
    """Snake -> WNConvTranspose1d up -> 3 dilated ResidualUnits
    (upstream DecoderBlock.block.{0..4})."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake(x.shape[-1], name="snake")(x)
        x = ConvTranspose1dTorch(self.out_channels, self.stride, name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_channels, d, name=f"res_{i}")(x)
        return x


class CodecDecoder(nn.Module):
    """latents (B, T_f, latent_dim) + spk (B, spk_dim) -> wave (B, T_f * hop).

    Timbre re-injection is the upstream FiLM: LayerNorm (no affine) over the
    quantized latents, then gamma/beta from ``timbre_linear(spk)`` (bias
    initialized so gamma=1, beta=0).  Generator = upstream ``model.{0..7}``.
    """

    cfg: CodecConfig

    @nn.compact
    def __call__(self, z: jax.Array, spk: Optional[jax.Array] = None) -> jax.Array:
        c = self.cfg
        if spk is not None:
            def film_bias(key, shape, dtype=jnp.float32):
                return jnp.concatenate(
                    [jnp.ones((shape[0] // 2,), dtype), jnp.zeros((shape[0] // 2,), dtype)]
                )

            x = nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, name="timbre_norm")(z)
            style = nn.Dense(
                2 * c.latent_dim, bias_init=film_bias, name="timbre_linear"
            )(spk)
            gamma, beta = jnp.split(style, 2, axis=-1)
            z = x * gamma[:, None, :] + beta[:, None, :]
        ch = c.decoder_initial_channels
        x = nn.Conv(ch, (7,), padding=[(3, 3)], name="stem")(z)
        for i, r in enumerate(reversed(c.up_ratios)):
            ch //= 2
            x = DecoderBlock(ch, r, name=f"block_{i}")(x)
        x = Snake(ch, name="snake_out")(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], name="head")(x)
        return jnp.tanh(x)[..., 0]


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class VectorQuantizer(nn.Module):
    """FactorizedVectorQuantize: latent -> 1x1 in_proj to codebook_dim ->
    COSINE nearest code (both sides L2-normalized, upstream
    decode_latents semantics) -> unnormalized codebook lookup -> straight
    -through -> 1x1 out_proj back to latent_dim.

    Distances are one MXU matmul (argmin(2 - 2 e.c) == argmax(e.c)).
    """

    codebook_size: int
    codebook_dim: int
    latent_dim: int

    @nn.compact
    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        down = nn.Dense(self.codebook_dim, name="in_proj")(z)
        codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
            jnp.float32,
        )
        e = _l2_normalize(down.astype(jnp.float32))
        cbn = _l2_normalize(codebook)
        sim = jnp.einsum("btd,kd->btk", e, cbn, preferred_element_type=jnp.float32)
        ids = jnp.argmax(sim, axis=-1)  # (B, T)
        quant_raw = codebook[ids].astype(down.dtype)
        # VQ-VAE training losses (sown; read via mutable=["losses"]):
        # codebook term pulls codes to encodings, commitment term vice versa.
        codebook_loss = ((quant_raw - jax.lax.stop_gradient(down)) ** 2).mean()
        commit_loss = ((down - jax.lax.stop_gradient(quant_raw)) ** 2).mean()
        self.sow("losses", "vq_loss", codebook_loss + 0.25 * commit_loss)
        quant_down = down + jax.lax.stop_gradient(quant_raw - down)  # ST
        quant = nn.Dense(self.latent_dim, name="out_proj")(quant_down)
        return quant, ids

    def lookup(self, ids: jax.Array) -> jax.Array:
        codebook = self.get_variable("params", "codebook")
        quant_down = codebook[ids]
        kernel = self.get_variable("params", "out_proj")["kernel"]
        bias = self.get_variable("params", "out_proj")["bias"]
        return quant_down @ kernel + bias


class ResidualVQ(nn.Module):
    """num_q-level residual VQ; returns summed quantized latent + id stack
    (upstream ResidualVQ.quantizers.{j})."""

    num_q: int
    codebook_size: int
    codebook_dim: int
    latent_dim: int

    def setup(self):
        self.quantizers = [
            VectorQuantizer(
                self.codebook_size, self.codebook_dim, self.latent_dim, name=f"vq_{i}"
            )
            for i in range(self.num_q)
        ]

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        residual = z
        total = jnp.zeros_like(z)
        ids = []
        for vq in self.quantizers:
            q, i = vq(residual)
            residual = residual - q
            total = total + q
            ids.append(i)
        return total, jnp.stack(ids, axis=0)  # (num_q, B, T)

    def lookup(self, ids: jax.Array) -> jax.Array:
        """(num_q, B, T) -> summed quantized latent."""
        total = None
        for i, vq in enumerate(self.quantizers):
            q = vq.lookup(ids[i])
            total = q if total is None else total + q
        return total


class TimbreFFN(nn.Module):
    """Conv(k5) -> ReLU -> Linear, the NS transformer FFN
    (upstream TransformerFFNLayer: ffn_1 Conv1d, ffn_2 Linear)."""

    hidden: int
    filter_size: int
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding=[(p, p)], name="ffn_1")(x)
        h = nn.relu(h)
        return nn.Dense(self.hidden, name="ffn_2")(h)


class TimbreEncoderLayer(nn.Module):
    """Pre-LN: x + MHA(ln_1(x)); x + FFN(ln_2(x))."""

    hidden: int
    heads: int
    filter_size: int

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        hd = self.hidden // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        q = nn.Dense(self.hidden, name="q_proj")(h).reshape(B, T, self.heads, hd)
        k = nn.Dense(self.hidden, name="k_proj")(h).reshape(B, T, self.heads, hd)
        v = nn.Dense(self.hidden, name="v_proj")(h).reshape(B, T, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(hd)), axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, self.hidden)
        x = x + nn.Dense(self.hidden, name="o_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        return x + TimbreFFN(self.hidden, self.filter_size, name="ffn")(h)


class TimbreExtractor(nn.Module):
    """Transformer over latents, mean-pooled -> (B, spk_dim)
    (upstream timbre_encoder: 4-layer TransformerEncoder, hidden=latent_dim,
    heads 4, conv_filter_size 1024, conv_kernel_size 5, + last LayerNorm;
    spk_embs = mean over time — upstream has NO output projection, so one is
    added only when spk_dim != latent_dim, e.g. in small test configs)."""

    cfg: CodecConfig
    n_layers: int = 4
    n_heads: int = 4
    filter_size: int = 1024

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        x = z
        for i in range(self.n_layers):
            x = TimbreEncoderLayer(
                c.latent_dim, self.n_heads, self.filter_size, name=f"layer_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="last_ln")(x)
        pooled = x.mean(axis=1)
        if c.spk_dim != c.latent_dim:
            pooled = nn.Dense(c.spk_dim, name="out")(pooled)
        return pooled


class FACodec(nn.Module):
    """Complete factorized codec: encode/quantize/decode.

    Methods (use with ``module.apply(vars, ..., method=...)``):
      - ``encode(wav)``      -> (vq_ids (num_q, B, T_f), spk (B, spk_dim))
      - ``quantize(wav)``    -> (vq_ids, quantized latents, spk)
      - ``decode(vq_ids, spk)`` -> wave (B, T_f * hop)
      - ``__call__(wav)``    -> (recon wave, vq_ids, spk)  [for init/training]

    vq id stream order: [prosody, residual x3, content] — matching the codec
    tensor layout the framework uses (reference: audio_encoder.py:248-256).
    Branch factorization is sequential-residual over the encoder latents:
    prosody explains first, content explains what prosody did not, the
    residual stack explains the rest.
    """

    cfg: CodecConfig

    def setup(self):
        c = self.cfg
        self.encoder = CodecEncoder(c, name="encoder")
        self.timbre = TimbreExtractor(c, name="timbre")
        self.vq_prosody = ResidualVQ(
            c.vq_num_q_p, c.codebook_size, c.codebook_dim, c.latent_dim, name="vq_prosody"
        )
        self.vq_content = ResidualVQ(
            c.vq_num_q_c, c.codebook_size, c.codebook_dim, c.latent_dim, name="vq_content"
        )
        self.vq_residual = ResidualVQ(
            c.vq_num_q_r, c.codebook_size, c.codebook_dim, c.latent_dim, name="vq_residual"
        )
        self.decoder = CodecDecoder(c, name="decoder")

    def _factorize(self, wav: jax.Array):
        h = self.encoder(wav)  # (B, T_f, D)
        spk = self.timbre(h)
        qp, idp = self.vq_prosody(h)
        qc, idc = self.vq_content(h - qp)
        qr, idr = self.vq_residual(h - qp - qc)
        quantized = qp + qc + qr
        # stream order [Qp, Qr..., Qc]
        ids = jnp.concatenate([idp, idr, idc], axis=0)
        return ids, quantized, spk

    def encode(self, wav: jax.Array):
        ids, _, spk = self._factorize(wav)
        return ids, spk

    def quantize(self, wav: jax.Array):
        return self._factorize(wav)

    def latents_from_ids(self, vq_ids: jax.Array) -> jax.Array:
        """(num_q, B, T_f) in [Qp, Qr x3, Qc] order -> summed latents."""
        c = self.cfg
        p, r, ct = c.vq_num_q_p, c.vq_num_q_r, c.vq_num_q_c
        qp = self.vq_prosody.lookup(vq_ids[:p])
        qr = self.vq_residual.lookup(vq_ids[p : p + r])
        qc = self.vq_content.lookup(vq_ids[p + r : p + r + ct])
        return qp + qr + qc

    def decode(self, vq_ids: jax.Array, spk: Optional[jax.Array] = None) -> jax.Array:
        return self.decoder(self.latents_from_ids(vq_ids), spk)

    def __call__(self, wav: jax.Array):
        ids, quantized, spk = self._factorize(wav)
        recon = self.decoder(quantized, spk)
        return recon, ids, spk


# --------------------------------------------------------------------------
# torch (ns3_codec) -> Flax weight conversion
# --------------------------------------------------------------------------

def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _fused_wn(sd: Dict, prefix: str) -> np.ndarray:
    """Fuse torch weight_norm: w = g * v / ||v|| (norm over the dims where g
    is singleton; torch default dim=0 keeps the out-channel axis).  Falls
    back to a plain ``.weight`` when the layer is not weight-normed."""
    if prefix + ".weight" in sd:
        return _np(sd[prefix + ".weight"])
    g = _np(sd[prefix + ".weight_g"])
    v = _np(sd[prefix + ".weight_v"])
    axes = tuple(i for i, n in enumerate(g.shape) if n == 1)
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


class _Converter:
    """Accumulates torch->flax assignments with shape checking."""

    def __init__(self):
        self.out: Dict = {}
        self.errors: List[str] = []

    def _set(self, path: Sequence[str], value: np.ndarray):
        d = self.out
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    def conv(self, sd, tkey, *fpath):
        """torch Conv1d (out, in, k) -> flax kernel (k, in, out)."""
        w = _fused_wn(sd, tkey)
        self._set([*fpath, "kernel"], w.transpose(2, 1, 0))
        if tkey + ".bias" in sd:
            self._set([*fpath, "bias"], _np(sd[tkey + ".bias"]))

    def conv_t(self, sd, tkey, *fpath):
        """torch ConvTranspose1d (in, out, k) -> ConvTranspose1dTorch kernel
        (k, in, out), FLIPPED along k (see ConvTranspose1dTorch)."""
        w = _fused_wn(sd, tkey)  # (in, out, k)
        self._set([*fpath, "kernel"], w[:, :, ::-1].transpose(2, 0, 1).copy())
        if tkey + ".bias" in sd:
            self._set([*fpath, "bias"], _np(sd[tkey + ".bias"]))

    def conv1x1_as_dense(self, sd, tkey, *fpath):
        """torch 1x1 Conv1d (out, in, 1) -> flax Dense kernel (in, out)."""
        w = _fused_wn(sd, tkey)
        self._set([*fpath, "kernel"], w[:, :, 0].T)
        if tkey + ".bias" in sd:
            self._set([*fpath, "bias"], _np(sd[tkey + ".bias"]))

    def dense(self, sd, tkey, *fpath):
        self._set([*fpath, "kernel"], _np(sd[tkey + ".weight"]).T)
        if tkey + ".bias" in sd:
            self._set([*fpath, "bias"], _np(sd[tkey + ".bias"]))

    def ln(self, sd, tkey, *fpath):
        self._set([*fpath, "scale"], _np(sd[tkey + ".weight"]))
        self._set([*fpath, "bias"], _np(sd[tkey + ".bias"]))

    def snake(self, sd, tkey, *fpath):
        """torch Snake1d alpha (1, C, 1) -> (C,)."""
        self._set([*fpath, "alpha"], _np(sd[tkey + ".alpha"]).reshape(-1))

    def raw(self, sd, tkey, *fpath):
        self._set([*fpath], _np(sd[tkey]))

    def mha(self, sd, tprefix, *fpath):
        """torch nn.MultiheadAttention -> q/k/v/o Dense."""
        w = _np(sd[tprefix + ".in_proj_weight"])
        b = _np(sd[tprefix + ".in_proj_bias"])
        d = w.shape[0] // 3
        for name, ws, bs in (
            ("q_proj", w[:d], b[:d]),
            ("k_proj", w[d : 2 * d], b[d : 2 * d]),
            ("v_proj", w[2 * d :], b[2 * d :]),
        ):
            self._set([*fpath, name, "kernel"], ws.T)
            self._set([*fpath, name, "bias"], bs)
        self._set([*fpath, "o_proj", "kernel"], _np(sd[tprefix + ".out_proj.weight"]).T)
        self._set([*fpath, "o_proj", "bias"], _np(sd[tprefix + ".out_proj.bias"]))


def _residual_unit(cv: _Converter, sd, tprefix: str, *fpath):
    cv.snake(sd, f"{tprefix}.block.0", *fpath, "snake1")
    cv.conv(sd, f"{tprefix}.block.1", *fpath, "conv1")
    cv.snake(sd, f"{tprefix}.block.2", *fpath, "snake2")
    cv.conv(sd, f"{tprefix}.block.3", *fpath, "conv2")


def convert_torch_facodec(
    encoder_sd: Dict, decoder_sd: Dict, cfg: CodecConfig
) -> Dict:
    """Map upstream ``ns3_codec`` state dicts onto the FACodec Flax tree.

    Returns the ``params`` tree.  Raises with a full report if any Flax leaf
    would remain unfilled or any mapped shape mismatches.  Unconsumed torch
    keys (gradient-reversal heads, mel buffers, dropout bookkeeping) are
    ignored by design.
    """
    assert cfg.spk_dim == cfg.latent_dim, (
        "pretrained FACodec timbre embeddings are latent_dim-sized; "
        f"got spk_dim={cfg.spk_dim} != latent_dim={cfg.latent_dim}"
    )
    cv = _Converter()

    # ---------------- encoder: block.0 .. block.6 -------------------------
    cv.conv(encoder_sd, "block.0", "encoder", "stem")
    for i in range(len(cfg.up_ratios)):
        t = f"block.{i + 1}.block"
        f = f"block_{i}"
        for j in range(3):
            _residual_unit(cv, encoder_sd, f"{t}.{j}", "encoder", f, f"res_{j}")
        cv.snake(encoder_sd, f"{t}.3", "encoder", f, "snake")
        cv.conv(encoder_sd, f"{t}.4", "encoder", f, "down")
    n = len(cfg.up_ratios)
    cv.snake(encoder_sd, f"block.{n + 1}", "encoder", "snake_out")
    cv.conv(encoder_sd, f"block.{n + 2}", "encoder", "head")

    # ---------------- quantizers: quantizer.{0,1,2}.quantizers.{j} --------
    # upstream ModuleList order [prosody, content, residual]
    branches = [
        ("vq_prosody", 0, cfg.vq_num_q_p),
        ("vq_content", 1, cfg.vq_num_q_c),
        ("vq_residual", 2, cfg.vq_num_q_r),
    ]
    for fname, b, num_q in branches:
        for j in range(num_q):
            t = f"quantizer.{b}.quantizers.{j}"
            cv.conv1x1_as_dense(decoder_sd, f"{t}.in_proj", fname, f"vq_{j}", "in_proj")
            cv.conv1x1_as_dense(decoder_sd, f"{t}.out_proj", fname, f"vq_{j}", "out_proj")
            cv.raw(decoder_sd, f"{t}.codebook.weight", fname, f"vq_{j}", "codebook")

    # ---------------- timbre transformer ---------------------------------
    for i in range(4):
        t = f"timbre_encoder.layers.{i}"
        f = ("timbre", f"layer_{i}")
        cv.ln(decoder_sd, f"{t}.ln_1", *f, "ln_1")
        cv.mha(decoder_sd, f"{t}.self_attn", *f)
        cv.ln(decoder_sd, f"{t}.ln_2", *f, "ln_2")
        cv.conv(decoder_sd, f"{t}.ffn.ffn_1", *f, "ffn", "ffn_1")
        cv.dense(decoder_sd, f"{t}.ffn.ffn_2", *f, "ffn", "ffn_2")
    cv.ln(decoder_sd, "timbre_encoder.last_ln", "timbre", "last_ln")
    cv.dense(decoder_sd, "timbre_linear", "decoder", "timbre_linear")
    # timbre_norm has elementwise_affine=False: no parameters.

    # ---------------- generator: model.0 .. model.7 -----------------------
    cv.conv(decoder_sd, "model.0", "decoder", "stem")
    for i in range(len(cfg.up_ratios)):
        t = f"model.{i + 1}.block"
        f = f"block_{i}"
        cv.snake(decoder_sd, f"{t}.0", "decoder", f, "snake")
        cv.conv_t(decoder_sd, f"{t}.1", "decoder", f, "up")
        for j in range(3):
            _residual_unit(cv, decoder_sd, f"{t}.{2 + j}", "decoder", f, f"res_{j}")
    cv.snake(decoder_sd, f"model.{n + 1}", "decoder", "snake_out")
    cv.conv(decoder_sd, f"model.{n + 2}", "decoder", "head")

    # ---------------- coverage + shape validation ------------------------
    module = FACodec(cfg)
    wav = jnp.zeros((1, 4 * cfg.hop_length), jnp.float32)
    ref_params = jax.tree.map(
        lambda x: np.asarray(x), module.init(jax.random.PRNGKey(0), wav)["params"]
    )

    def _walk(ref, got, path, out):
        if isinstance(ref, dict):
            merged = {}
            for k, v in ref.items():
                if not isinstance(got, dict) or k not in got:
                    cv.errors.append(f"missing: {'/'.join(path + [k])}")
                    merged[k] = v
                else:
                    merged[k] = _walk(v, got[k], path + [k], out)
            if isinstance(got, dict):
                for k in got:
                    if k not in ref:
                        cv.errors.append(f"unexpected: {'/'.join(path + [k])}")
            return merged
        if ref.shape != got.shape:
            cv.errors.append(
                f"shape mismatch at {'/'.join(path)}: flax {ref.shape} vs torch {got.shape}"
            )
            return ref
        return jnp.asarray(got, ref.dtype)

    params = _walk(ref_params, cv.out, [], cv.errors)
    if cv.errors:
        raise ValueError(
            "FACodec conversion failed:\n  " + "\n  ".join(cv.errors[:50])
            + (f"\n  ... {len(cv.errors) - 50} more" if len(cv.errors) > 50 else "")
        )
    return params


def load_torch_facodec(encoder_ckpt_path: str, decoder_ckpt_path: str, cfg: CodecConfig):
    """Load the HF ``amphion/naturalspeech3_facodec`` torch checkpoints
    (``ns3_facodec_encoder.bin`` / ``ns3_facodec_decoder.bin``; reference:
    audio_encoder.py:165-173) and convert them to the FACodec ``params``
    tree.  Pure torch-CPU + numpy; no network access."""
    import os

    import torch

    for p in (encoder_ckpt_path, decoder_ckpt_path):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"FACodec checkpoint not found: {p}. Download "
                "amphion/naturalspeech3_facodec ns3_facodec_{encoder,decoder}.bin "
                "and pass their paths."
            )
    enc_sd = torch.load(encoder_ckpt_path, map_location="cpu", weights_only=True)
    dec_sd = torch.load(decoder_ckpt_path, map_location="cpu", weights_only=True)
    return convert_torch_facodec(enc_sd, dec_sd, cfg)
