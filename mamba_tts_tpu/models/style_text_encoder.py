"""Frozen style-text encoder: BERT-base in Flax + host-side wrapper.

Fills the role of frozen HF ``bert-base-uncased`` in the reference
(reference: smsd.py:39-45,57-88 and data_utils/text_processor.py:269-286):
style prompt string -> (B, 768) [CLS] embedding.

Fully self-contained: the architecture is implemented here (BERT-base
post-LN transformer, GELU, LN eps 1e-12);
:func:`convert_torch_bert_state_dict` maps a HF PyTorch checkpoint into this
module's parameter tree when one is available on disk.  Without a checkpoint
the encoder runs frozen at deterministic random init — the pipeline
contract ((B, 768) embeddings, frozen, no gradients) is identical.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.config import StyleEncoderConfig
from mamba_tts_tpu.text.wordpiece import BertTokenizer

_LN_EPS = 1e-12


class _BertLayer(nn.Module):
    cfg: StyleEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        B, T, _ = x.shape
        H = c.n_heads
        hd = c.d_model // H
        q = nn.Dense(c.d_model, dtype=dt, name="q")(x).reshape(B, T, H, hd)
        k = nn.Dense(c.d_model, dtype=dt, name="k")(x).reshape(B, T, H, hd)
        v = nn.Dense(c.d_model, dtype=dt, name="v")(x).reshape(B, T, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd) + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, c.d_model)
        attn = nn.Dense(c.d_model, dtype=dt, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=dt, name="attn_ln")(x + attn)
        h = nn.Dense(c.d_ff, dtype=dt, name="ffn_in")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.d_model, dtype=dt, name="ffn_out")(h)
        return nn.LayerNorm(epsilon=_LN_EPS, dtype=dt, name="ffn_ln")(x + h)


class BertEncoder(nn.Module):
    """BERT-base encoder returning the [CLS] hidden state (B, d_model)."""

    cfg: StyleEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        T = input_ids.shape[1]
        word = nn.Embed(c.vocab_size, c.d_model, dtype=dt, name="word_emb")(input_ids)
        pos = nn.Embed(c.max_position, c.d_model, dtype=dt, name="pos_emb")(
            jnp.arange(T)[None]
        )
        typ = nn.Embed(c.type_vocab_size, c.d_model, dtype=dt, name="type_emb")(
            jnp.zeros_like(input_ids)
        )
        x = nn.LayerNorm(epsilon=_LN_EPS, dtype=dt, name="emb_ln")(word + pos + typ)
        for i in range(c.n_layers):
            x = _BertLayer(c, name=f"layer_{i}")(x, attention_mask)
        return x[:, 0, :]


def convert_torch_bert_state_dict(state_dict: Dict[str, Any], cfg: StyleEncoderConfig):
    """Map a HF PyTorch ``bert-base-uncased`` state dict to this module's
    parameter tree (transposing Dense kernels).

    Accepts BOTH released naming conventions (pinned by
    ``tests/data/bert_base_uncased_manifest.json``):

    - ``BertModel.from_pretrained(...).state_dict()``: stripped prefix,
      ``LayerNorm.weight/bias`` (what the reference passes; reference:
      smsd.py:39-45);
    - the raw ``pytorch_model.bin`` (2018 TF conversion): ``bert.`` prefix
      and historical ``LayerNorm.gamma/beta`` names; the ``cls.*`` MLM/NSP
      heads and ``pooler`` are ignored by design.
    """
    norm: Dict[str, Any] = {}
    for k, v in state_dict.items():
        if k.startswith("cls."):
            continue  # pretraining heads, not part of the encoder
        if k.startswith("bert."):
            k = k[len("bert."):]
        k = k.replace("LayerNorm.gamma", "LayerNorm.weight")
        k = k.replace("LayerNorm.beta", "LayerNorm.bias")
        norm[k] = v
    state_dict = norm

    def g(name):
        t = state_dict[name]
        return np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)

    def dense(prefix):
        return {"kernel": g(f"{prefix}.weight").T, "bias": g(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    p: Dict[str, Any] = {
        "word_emb": {"embedding": g("embeddings.word_embeddings.weight")},
        "pos_emb": {"embedding": g("embeddings.position_embeddings.weight")},
        "type_emb": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.n_layers):
        e = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "q": dense(f"{e}.attention.self.query"),
            "k": dense(f"{e}.attention.self.key"),
            "v": dense(f"{e}.attention.self.value"),
            "attn_out": dense(f"{e}.attention.output.dense"),
            "attn_ln": ln(f"{e}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{e}.intermediate.dense"),
            "ffn_out": dense(f"{e}.output.dense"),
            "ffn_ln": ln(f"{e}.output.LayerNorm"),
        }
    return p


class StyleTextEncoder:
    """Host-side wrapper: style prompt strings -> (B, 768) embeddings.

    Frozen (no gradients flow through it); the jitted apply is cached per
    batch shape.  ``checkpoint`` may be a HF torch state dict (converted via
    :func:`convert_torch_bert_state_dict`) or a ready flax param tree.
    """

    def __init__(
        self,
        cfg: Optional[StyleEncoderConfig] = None,
        vocab_path: Optional[str] = None,
        checkpoint: Optional[Dict[str, Any]] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or StyleEncoderConfig()
        # Tokenized length can never exceed the position table.
        self.max_length = min(self.cfg.max_length, self.cfg.max_position)
        if vocab_path is None:
            vocab_path = self.cfg.bert_vocab  # --bert_vocab CLI flag
        self.tokenizer = BertTokenizer(vocab_path, vocab_size=self.cfg.vocab_size)
        self.module = BertEncoder(self.cfg)
        if checkpoint is not None:
            if "word_emb" not in checkpoint:
                checkpoint = convert_torch_bert_state_dict(checkpoint, self.cfg)
            self.params = jax.tree.map(jnp.asarray, checkpoint)
        else:
            ids = jnp.zeros((1, 8), jnp.int32)
            mask = jnp.ones((1, 8), bool)
            self.params = self.module.init(jax.random.PRNGKey(seed), ids, mask)["params"]
        # params are an ARGUMENT of the jitted fn (closing over them would
        # embed ~110M floats as constants in the HLO).
        self._apply = jax.jit(
            lambda params, ids, mask: self.module.apply({"params": params}, ids, mask)
        )

    def embed(self, texts: Sequence[str]) -> jax.Array:
        """texts -> (B, d_model) [CLS] embeddings."""
        if isinstance(texts, str):
            texts = [texts]
        ids, mask = self.tokenizer.encode_batch(texts, self.max_length)
        return self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
