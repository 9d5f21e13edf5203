"""FACodec codec tests: shapes, rates, VQ consistency, tokenizer contract
(reference contract: data_utils/audio_encoder.py:178-256)."""
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.audio.codec import ID_OFFSET, PAD_ID, FACodecTokenizer
from mamba_tts_tpu.config import CodecConfig
from mamba_tts_tpu.models.facodec import FACodec, VectorQuantizer, grad_reverse

TINY = CodecConfig(
    ngf=4,
    up_ratios=(2, 4),  # hop 8
    latent_dim=16,
    codebook_size=10,
    codebook_dim=4,
    spk_dim=8,
    max_seq_len=32,
    decoder_initial_channels=32,
)


def _codec():
    m = FACodec(TINY)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 128)) * 0.1
    variables = m.init(jax.random.PRNGKey(1), wav)
    return m, variables, wav


def test_encode_shapes_and_rates():
    m, variables, wav = _codec()
    ids, spk = m.apply(variables, wav, method=FACodec.encode)
    assert ids.shape == (TINY.num_quantizers, 2, 128 // TINY.hop_length)
    assert spk.shape == (2, TINY.spk_dim)
    assert int(ids.min()) >= 0 and int(ids.max()) < TINY.codebook_size
    assert TINY.hop_length == 8 and TINY.num_quantizers == 5


def test_decode_length_and_roundtrip_consistency():
    m, variables, wav = _codec()
    ids, quantized, spk = m.apply(variables, wav, method=FACodec.quantize)
    # latents_from_ids reproduces the quantized latents exactly
    lat = m.apply(variables, ids, method=FACodec.latents_from_ids)
    np.testing.assert_allclose(np.asarray(lat), np.asarray(quantized), rtol=1e-5, atol=1e-5)
    out = m.apply(variables, ids, spk, method=FACodec.decode)
    assert out.shape == wav.shape
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).max()) <= 1.0  # tanh head


def test_full_call_matches_decode():
    m, variables, wav = _codec()
    recon, ids, spk = m.apply(variables, wav)
    recon2 = m.apply(variables, ids, spk, method=FACodec.decode)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), rtol=1e-4, atol=1e-4)


def test_vq_straight_through_gradient():
    vq = VectorQuantizer(codebook_size=6, codebook_dim=3, latent_dim=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    variables = vq.init(jax.random.PRNGKey(1), z)

    def loss(z):
        q, _ = vq.apply(variables, z)
        return (q**2).sum()

    g = jax.grad(loss)(z)
    assert float(jnp.abs(g).sum()) > 0  # gradient flows through ST


def test_vq_ids_deterministic_and_stable():
    m, variables, wav = _codec()
    ids1, _ = m.apply(variables, wav, method=FACodec.encode)
    ids2, _ = m.apply(variables, wav, method=FACodec.encode)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_grad_reverse():
    g = jax.grad(lambda x: (grad_reverse(x) * 3.0).sum())(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -3.0)


def test_tokenizer_contract():
    tok = FACodecTokenizer(TINY, bucket_seconds=64 / TINY.sample_rate)
    wav0 = np.random.RandomState(0).randn(100).astype(np.float32) * 0.1
    wav1 = np.random.RandomState(1).randn(200).astype(np.float32) * 0.1
    codec, spk, lengths = tok.encode_with_lengths([wav0, wav1])
    assert codec.shape == (2, TINY.max_seq_len, 5)
    assert spk.shape == (2, TINY.spk_dim)
    # true lengths: ceil(samples/hop)
    np.testing.assert_array_equal(lengths, [13, 25])
    # valid region ids are shifted out of the special range
    assert codec[0, :13].min() >= ID_OFFSET
    assert codec[0, 13:].max() == PAD_ID  # frame padding
    assert tok.vocab_size_audio == TINY.codebook_size + ID_OFFSET

    # decode path: (B, T, 5) -> waveform
    wav_out = tok.decode(codec[:, :16], spk)
    assert wav_out.shape == (2, 16 * TINY.hop_length)
    assert np.isfinite(wav_out).all()


def test_tokenizer_truncates_to_max_seq_len():
    tok = FACodecTokenizer(TINY, bucket_seconds=64 / TINY.sample_rate)
    long_wav = np.zeros(TINY.max_seq_len * TINY.hop_length * 2, np.float32)
    codec, spk, lengths = tok.encode_with_lengths([long_wav])
    assert codec.shape == (1, TINY.max_seq_len, 5)
    assert lengths[0] == TINY.max_seq_len
