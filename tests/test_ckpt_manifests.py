"""Real-checkpoint key-inventory pinning (VERDICT r2 #5).

The converters' field mappings are exercised against committed name->shape
manifests of the released checkpoints (tests/data/*_manifest.json, generated
by mamba_tts_tpu.tools.gen_manifests):

- ``bert_base_uncased_manifest.json`` — the released HF bert-base-uncased
  inventory in both namings (raw pytorch_model.bin with ``bert.`` prefixes +
  LayerNorm.gamma/beta, and BertModel.state_dict()); reference: smsd.py:39-45.
- ``facodec_consumed_manifest.json`` — every ns3_facodec_{encoder,decoder}.bin
  key convert_torch_facodec consumes, at released scale (ngf 32, up 2/4/5/5,
  latent 256, 2**10 codebooks); reference: audio_encoder.py:143-173.

A drifting converter (renamed field, transposed shape, missed key) fails
here instead of at a user's first real-checkpoint load.  No weights needed:
zero tensors at manifest shapes suffice for mapping/shape validation.
"""
import json

import numpy as np
import pytest

from mamba_tts_tpu.config import CodecConfig, StyleEncoderConfig
from mamba_tts_tpu.models.style_text_encoder import (
    BertEncoder,
    convert_torch_bert_state_dict,
)


def _zeros_sd(manifest):
    return {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}


@pytest.fixture(scope="module")
def bert_manifest():
    return json.load(open("tests/data/bert_base_uncased_manifest.json"))


@pytest.fixture(scope="module")
def facodec_manifest():
    return json.load(open("tests/data/facodec_consumed_manifest.json"))


# --------------------------------------------------------------------- BERT


BERT_CFG = StyleEncoderConfig(
    vocab_size=30522, d_model=768, n_layers=12, n_heads=12, d_ff=3072,
    max_position=512, type_vocab_size=2,
)


@pytest.mark.parametrize("variant", ["raw_bin", "bertmodel_statedict"])
def test_bert_converter_consumes_released_inventory(bert_manifest, variant):
    """Both released namings convert into the exact module parameter tree."""
    import jax
    import jax.numpy as jnp

    params = convert_torch_bert_state_dict(_zeros_sd(bert_manifest[variant]),
                                           BERT_CFG)
    ref = jax.eval_shape(
        lambda: BertEncoder(BERT_CFG).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool),
        )["params"]
    )
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), params)
    assert ref_shapes == got_shapes


def test_bert_manifest_is_bert_base(bert_manifest):
    raw = bert_manifest["raw_bin"]
    assert raw["bert.embeddings.word_embeddings.weight"] == [30522, 768]
    assert raw["bert.encoder.layer.11.output.dense.weight"] == [768, 3072]
    assert "cls.predictions.decoder.weight" in raw  # MLM head present in bin
    sd = bert_manifest["bertmodel_statedict"]
    assert "embeddings.word_embeddings.weight" in sd
    assert not any(k.startswith(("bert.", "cls.")) for k in sd)


def test_bert_converter_rejects_wrong_shape(bert_manifest):
    sd = _zeros_sd(bert_manifest["bertmodel_statedict"])
    sd["encoder.layer.0.attention.self.query.weight"] = np.zeros(
        (768, 512), np.float32
    )
    params = convert_torch_bert_state_dict(sd, BERT_CFG)
    # mapping keeps the (wrong) shape -> visible to any shape check
    assert np.shape(params["layer_0"]["q"]["kernel"]) == (512, 768)


# ------------------------------------------------------------------ FACodec


def test_facodec_converter_consumes_released_inventory(facodec_manifest):
    """convert_torch_facodec fills the whole Flax tree from zero tensors at
    released-scale manifest shapes (raises internally on any missing leaf,
    unexpected leaf, or shape mismatch)."""
    from mamba_tts_tpu.models.facodec import convert_torch_facodec

    params = convert_torch_facodec(
        _zeros_sd(facodec_manifest["encoder"]),
        _zeros_sd(facodec_manifest["decoder"]),
        CodecConfig(),
    )
    assert "encoder" in params and "decoder" in params


def test_facodec_converter_reports_shape_drift(facodec_manifest):
    from mamba_tts_tpu.models.facodec import convert_torch_facodec

    enc = _zeros_sd(facodec_manifest["encoder"])
    enc["block.0.weight_v"] = np.zeros((32, 1, 5), np.float32)  # wrong taps
    with pytest.raises(ValueError, match="shape mismatch|conversion failed"):
        convert_torch_facodec(
            enc, _zeros_sd(facodec_manifest["decoder"]), CodecConfig()
        )


def test_facodec_manifest_matches_replicas(facodec_manifest):
    """The committed fixture equals a fresh inventory from the graph-faithful
    torch replicas at released scale — replica or fixture drift fails."""
    pytest.importorskip("torch")
    import test_facodec_convert as tfc

    cfg = CodecConfig()
    enc = {k: list(v.shape) for k, v in tfc.TEncoder(cfg).state_dict().items()}
    dec = {k: list(v.shape) for k, v in tfc.TDecoder(cfg).state_dict().items()}
    assert enc == facodec_manifest["encoder"]
    assert dec == facodec_manifest["decoder"]


def test_facodec_manifest_released_scale(facodec_manifest):
    enc, dec = facodec_manifest["encoder"], facodec_manifest["decoder"]
    assert enc["block.0.weight_v"] == [32, 1, 7]        # ngf 32 stem
    assert dec["model.0.weight_v"] == [1024, 256, 7]    # latent 256 -> 1024
    # 2**10-entry, 8-dim codebooks on every VQ branch
    for b in (0, 1, 2):
        assert dec[f"quantizer.{b}.quantizers.0.codebook.weight"] == [1024, 8]
    assert dec["timbre_encoder.layers.0.self_attn.in_proj_weight"] == [768, 256]
