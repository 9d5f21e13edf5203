"""Int8 decode path tests: kernel correctness and step parity vs the flax
module path (the hand-rolled step must mirror step_with_kv exactly when the
quantization is a no-op)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import DecoderConfig, MambaConfig
from mamba_tts_tpu.models.decoder import MambaTTSDecoder, greedy_decode
from mamba_tts_tpu.ops.int8_matvec import int8_matvec, int8_matvec_ref, quantize_weight

CFG = DecoderConfig(
    codebook_size=24, d_model=32, n_layers=2, n_heads=4, d_ff=64, d_style=16,
    max_len=128, num_quantizers=5, mamba=MambaConfig(d_model=32, d_state=4),
    dtype="float32", scan_chunk=8, use_pallas=False,
)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.2
    w_q, scale = quantize_weight(w)
    w_hat = np.asarray(w_q, np.float32) * np.asarray(scale)[None]
    err = np.abs(w_hat - np.asarray(w))
    assert err.max() <= np.asarray(scale).max() * 0.5 + 1e-6  # half-ULP


def test_int8_matvec_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 96)) * 0.1
    w_q, scale = quantize_weight(w)
    b = jax.random.normal(jax.random.PRNGKey(3), (96,))
    y = int8_matvec(x, w_q, scale, bias=b)
    y_ref = int8_matvec_ref(x, w_q, scale, bias=b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), atol=2e-2
    )


def _setup():
    dec = MambaTTSDecoder(CFG)
    B, Q, F, Tt, Tr = 2, CFG.num_quantizers, 6, 7, 9
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    at = jax.random.randint(ks[0], (B, Q, F), 2, CFG.vocab_size_audio)
    th = jax.random.normal(ks[1], (B, Tt, CFG.d_model))
    z = jax.random.normal(ks[2], (B, CFG.d_style))
    rh = jax.random.normal(ks[3], (B, Tr, CFG.d_model))
    tm = jnp.ones((B, Tt), bool)
    rm = jnp.ones((B, Tr), bool)
    variables = dec.init(ks[4], at, th, z, tm, rh, rm)
    return dec, variables, th, z, tm, rh, rm, F


def _dequantized_variables(variables, cfg):
    """Replace every weight the int8 path quantizes with its dequantized
    value, so module-path and quant-path logits must agree exactly (up to
    dtype rounding)."""
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        variables["params"], "unfreeze"
    ) else jax.tree.map(lambda x: x, variables["params"])
    for i in range(cfg.n_layers):
        lp = params[f"layer_{i}"]
        for path in (
            ("mamba", "in_proj"), ("mamba", "out_proj"),
            ("cross_attn", "q_proj"), ("cross_attn", "o_proj"),
            ("ff1",), ("ff2",),
        ):
            node = lp
            for k in path[:-1]:
                node = node[k]
            leaf = node[path[-1]]
            w_q, scale = quantize_weight(leaf["kernel"])
            leaf["kernel"] = (
                w_q.astype(jnp.float32) * scale[None, :]
            ).astype(leaf["kernel"].dtype)
    return {"params": params}


def test_int8_decode_matches_module_path_with_dequantized_weights():
    from mamba_tts_tpu.infer.quant_decode import (
        greedy_decode_int8,
        quantize_decoder_params,
    )

    dec, variables, th, z, tm, rh, rm, F = _setup()
    qparams = quantize_decoder_params(variables["params"], CFG)
    deq_vars = _dequantized_variables(variables, CFG)

    res_q = jax.jit(
        lambda: greedy_decode_int8(
            dec, variables, qparams, th, z, F,
            text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
        )
    )()
    res_m = jax.jit(
        lambda: greedy_decode(
            dec, deq_vars, th, z, F,
            text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
        )
    )()
    # project_memories runs on the ORIGINAL (non-dequantized) K/V weights in
    # both paths (K/V are not quantized), so logits must match closely in f32.
    np.testing.assert_array_equal(np.asarray(res_q.tokens), np.asarray(res_m.tokens))
    np.testing.assert_allclose(
        np.asarray(res_q.logits, np.float32),
        np.asarray(res_m.logits, np.float32),
        atol=5e-4, rtol=1e-4,
    )


def test_int8_decode_close_to_full_precision():
    """With REAL quantization the decoded stream stays close to the bf16
    path on random (untrained) weights: logits within a few percent."""
    from mamba_tts_tpu.infer.quant_decode import (
        greedy_decode_int8,
        quantize_decoder_params,
    )

    dec, variables, th, z, tm, rh, rm, F = _setup()
    qparams = quantize_decoder_params(variables["params"], CFG)
    res_q = greedy_decode_int8(
        dec, variables, qparams, th, z, F,
        text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
    )
    res_f = greedy_decode(
        dec, variables, th, z, F,
        text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
    )
    lq = np.asarray(res_q.logits, np.float32)
    lf = np.asarray(res_f.logits, np.float32)
    denom = max(np.abs(lf).max(), 1e-6)
    assert np.abs(lq - lf).max() / denom < 0.05


def test_int8_kv_decode_close_to_full_precision():
    """int8 K/V on top of int8 weights stays within a few percent of the
    full-precision logits on random weights."""
    from mamba_tts_tpu.infer.quant_decode import (
        greedy_decode_int8,
        quantize_decoder_params,
    )

    dec, variables, th, z, tm, rh, rm, F = _setup()
    qparams = quantize_decoder_params(variables["params"], CFG)
    res_q = greedy_decode_int8(
        dec, variables, qparams, th, z, F,
        text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
        int8_kv=True,
    )
    res_f = greedy_decode(
        dec, variables, th, z, F,
        text_mask=tm, ref_hidden=rh, ref_mask=rm, collect_logits=True,
    )
    lq = np.asarray(res_q.logits, np.float32)
    lf = np.asarray(res_f.logits, np.float32)
    denom = max(np.abs(lf).max(), 1e-6)
    assert np.abs(lq - lf).max() / denom < 0.06
