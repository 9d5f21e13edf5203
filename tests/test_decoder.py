"""Decoder stack tests: shapes, train/decode embedding parity, and the
forward-vs-decode_step prefix-consistency invariant (SURVEY §4c)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_tts_tpu.config import DecoderConfig, MambaConfig
from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode

CFG = DecoderConfig(
    codebook_size=10,
    d_model=32,
    n_layers=2,
    n_heads=4,
    d_ff=64,
    d_style=16,
    max_len=128,
    num_quantizers=3,
    mamba=MambaConfig(d_model=32, d_state=4),
    dtype="float32",
    scan_chunk=8,
)


def _setup(B=2, T_text=7, T_ref=5):
    dec = MambaTTSDecoder(CFG)
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    text_hidden = jax.random.normal(ks[0], (B, T_text, CFG.d_model))
    z_style = jax.random.normal(ks[1], (B, CFG.d_style))
    ref_hidden = jax.random.normal(ks[2], (B, T_ref, CFG.d_model))
    text_mask = jnp.array([[True] * 7, [True] * 5 + [False] * 2])
    ref_mask = jnp.ones((B, T_ref), bool)
    tokens = jax.random.randint(ks[3], (B, 20), 2, CFG.vocab_size_audio)
    variables = dec.init(ks[4], tokens, text_hidden, z_style, text_mask, ref_hidden, ref_mask)
    return dec, variables, tokens, text_hidden, z_style, text_mask, ref_hidden, ref_mask


def test_forward_shapes_2d_and_3d():
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    logits = dec.apply(variables, tokens, th, z, tm, rh, rm)
    assert logits.shape == (2, 20, CFG.vocab_size_audio)

    tokens3d = tokens.reshape(2, 2, 10)
    logits3d = dec.apply(variables, tokens3d, th, z, tm, rh, rm)
    assert logits3d.shape == (2, 20, CFG.vocab_size_audio)


def test_forward_without_ref_or_mask():
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    logits = dec.apply(variables, tokens, th, z)
    assert logits.shape == (2, 20, CFG.vocab_size_audio)
    assert bool(jnp.isfinite(logits).all())


def test_decode_step_matches_forward_prefix():
    """Feeding the same tokens step-by-step through decode_step reproduces
    the teacher-forcing logits — greedy-token parity at the stack level."""
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    Q, F = 2, 10
    tokens3d = tokens.reshape(2, Q, F)
    logits_full = dec.apply(variables, tokens3d, th, z, tm, rh, rm)

    states = dec.init_states(batch=2)
    step_logits = []
    flat = tokens3d.reshape(2, Q * F)
    for t in range(Q * F):
        lg, states = dec.apply(
            variables,
            flat[:, t : t + 1],
            th,
            z,
            states,
            jnp.asarray(t),
            F,
            tm,
            rh,
            rm,
            method=MambaTTSDecoder.decode_step,
        )
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(logits_full), rtol=2e-4, atol=2e-4
    )


def test_masked_text_positions_do_not_affect_output():
    """Changing text_hidden at masked (invalid) positions must not change logits."""
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    logits1 = dec.apply(variables, tokens, th, z, tm, rh, rm)
    th2 = th.at[1, 5:].set(99.0)  # row 1 has positions 5,6 masked out
    logits2 = dec.apply(variables, tokens, th2, z, tm, rh, rm)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2), rtol=1e-5, atol=1e-5)


def test_greedy_decode_runs_and_is_deterministic():
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    F = 6
    res1 = greedy_decode(dec, variables, th, z, F, tm, rh, rm)
    res2 = greedy_decode(dec, variables, th, z, F, tm, rh, rm)
    assert res1.tokens.shape == (2, CFG.num_quantizers * F)
    assert (res1.tokens == res2.tokens).all()
    # Special ids are never emitted.
    assert int(res1.tokens.min()) >= CFG.num_special_tokens


def test_greedy_decode_matches_decode_step_loop():
    """The jitted scan decode equals a hand-rolled decode_step loop."""
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    F = 4
    res = greedy_decode(dec, variables, th, z, F, tm, rh, rm)

    states = dec.init_states(batch=2)
    token = jnp.full((2, 1), CFG.bos_id, jnp.int32)
    out = []
    for t in range(CFG.num_quantizers * F):
        lg, states = dec.apply(
            variables, token, th, z, states, jnp.asarray(t), F, tm, rh, rm,
            method=MambaTTSDecoder.decode_step,
        )
        step_logits = lg[:, 0].at[:, : CFG.num_special_tokens].set(-1e9)
        token = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)[:, None]
        out.append(token[:, 0])
    manual = jnp.stack(out, axis=1)
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(manual))


def test_embed_codec_tokens_shape():
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    tokens3d = tokens.reshape(2, 2, 10)
    ref = dec.apply(variables, tokens3d, method=MambaTTSDecoder.embed_codec_tokens)
    assert ref.shape == (2, 20, CFG.d_model)


def test_invalid_rank_raises():
    dec, variables, tokens, th, z, tm, rh, rm = _setup()
    with pytest.raises(ValueError):
        dec.apply(variables, tokens[:, :, None, None], th, z)
