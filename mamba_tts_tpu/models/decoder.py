"""Mamba TTS decoder stack: teacher-forcing forward + jitted AR decoding.

Re-designs the reference decoder (reference: mamba_decoder.py:25-256) as a
TPU-first stack.  Per layer (reference: mamba_decoder.py:50-91):

    x += Mamba(LN(x))                       # selective-scan over audio tokens
    x += CrossAttn(LN(x), [ref || text])    # MAVE-style conditioning
    x += FFN(FiLM_{z_style}(LN(x)))         # gamma,beta = tanh(MLP(z_style))

Deliberate fixes of reference defects (SURVEY §7):
- defect 2: ``decode_step`` embeds the quantizer id exactly as ``forward``
  does (reference omits quant_embed at decode — mamba_decoder.py:217-221).
- defect 3: the flattened (B, Q, T) path uses per-position ids consistent
  with its Q*T tokens — quantizer-major flattening with pos = tile(arange(T),
  Q) and quant = repeat(arange(Q), T) (the reference computes positions of
  length T for Q*T tokens — mamba_decoder.py:131 vs :169-170).
- pad id: audio vocab reserves PAD=0 and BOS=1; codebook ids are shifted by 2
  (defect 5 — FACodec zero-padding vs codebook id 0 collision).

Autoregressive synthesis (the reference has no synthesis driver — SURVEY
§3.3) is a first-class jitted entry point: :func:`greedy_decode` precomputes
every layer's cross-attention K/V once, then runs one ``lax.scan`` carrying
the per-layer ``MambaState`` pytree and the last token — zero host
round-trips per token.

Mask convention: True = VALID (see models/attention.py).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mamba_tts_tpu.config import DecoderConfig
from mamba_tts_tpu.models.attention import CrossAttention
from mamba_tts_tpu.models.mamba import MambaBlock, MambaState, init_mamba_state


class DecoderLayer(nn.Module):
    cfg: DecoderConfig
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh (cfg.use_sp_scan)

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        mcfg = c.with_mamba_dims().mamba
        self.norm_mamba = nn.LayerNorm(dtype=dt, name="norm_mamba")
        self.mamba = MambaBlock(
            mcfg, dtype=dt, scan_chunk=c.scan_chunk, use_pallas=c.use_pallas,
            sp_mesh=self.sp_mesh if c.use_sp_scan else None, sp_axis=c.sp_axis,
            name="mamba",
        )
        self.norm_cross = nn.LayerNorm(dtype=dt, name="norm_cross")
        self.cross_attn = CrossAttention(c.d_model, c.n_heads, dtype=dt, name="cross_attn")
        self.norm_ff = nn.LayerNorm(dtype=dt, name="norm_ff")
        self.style_mlp = nn.Dense(2 * c.d_model, dtype=dt, name="style_mlp")
        self.ff1 = nn.Dense(c.d_ff, dtype=dt, name="ff1")
        self.ff2 = nn.Dense(c.d_model, dtype=dt, name="ff2")

    def film_params(self, z_style: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """z_style -> (gamma, beta); constant during decoding, so the decode
        scan precomputes it once per synthesis instead of per token."""
        gamma_beta = jnp.tanh(self.style_mlp(z_style))  # (B, 2*d_model)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return gamma, beta

    def _film_ffn_with(self, x: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
        h = self.norm_ff(x)
        h = gamma[:, None, :] * h + beta[:, None, :]
        # exact erf GELU (torch nn.GELU parity; reference: mamba_decoder.py:38-43)
        return self.ff2(nn.gelu(self.ff1(h), approximate=False))

    def _film_ffn(self, x: jax.Array, z_style: jax.Array) -> jax.Array:
        gamma, beta = self.film_params(z_style)
        return self._film_ffn_with(x, gamma, beta)

    def __call__(
        self,
        x: jax.Array,
        memory: jax.Array,
        z_style: jax.Array,
        memory_mask: Optional[jax.Array] = None,
        mamba_state: Optional[MambaState] = None,
    ) -> Tuple[jax.Array, MambaState]:
        h, new_state = self.mamba(self.norm_mamba(x), mamba_state)
        x = x + h
        x = x + self.cross_attn(self.norm_cross(x), memory, memory_mask)
        x = x + self._film_ffn(x, z_style)
        return x, new_state

    def project_memory(self, memory: jax.Array):
        return self.cross_attn.project_memory(memory)

    def step(
        self,
        x: jax.Array,
        K: jax.Array,
        V: jax.Array,
        film: Tuple[jax.Array, jax.Array],
        memory_mask: Optional[jax.Array],
        mamba_state: MambaState,
    ) -> Tuple[jax.Array, MambaState]:
        """One-token layer step with precomputed memory K/V and FiLM params.
        x: (B, 1, d)."""
        h, new_state = self.mamba.step(self.norm_mamba(x), mamba_state)
        x = x + h
        x = x + self.cross_attn.attend(self.norm_cross(x), K, V, memory_mask)
        x = x + self._film_ffn_with(x, *film)
        return x, new_state


class MambaTTSDecoder(nn.Module):
    """Stacked decoder with utilities for full-sequence and single-step decoding.

    I/O contract (reference: README.md:14-28, mamba_decoder.py:120-186):
        forward(audio_tokens (B,T)|(B,Q,T), text_hidden (B,Tt,d), z_style
        (B,d_style), text_mask, ref_hidden (B,Tr,d), ref_mask)
          -> logits (B, T_flat, vocab_size_audio)
        decode_step(last_token (B,1), ..., states, step_index)
          -> (logits (B,1,V), new_states)
    """

    cfg: DecoderConfig
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh (cfg.use_sp_scan)

    def setup(self):
        c = self.cfg
        if c.use_sp_scan and self.sp_mesh is None:
            raise ValueError(
                "DecoderConfig.use_sp_scan=True requires constructing the "
                "model with the mesh: MambaTTSDecoder(cfg, sp_mesh=mesh) / "
                "MambaTTS(cfg, sp_mesh=mesh)"
            )
        dt = jnp.dtype(c.dtype)
        self.token_embed = nn.Embed(c.vocab_size_audio, c.d_model, dtype=dt, name="token_embed")
        self.pos_embed = nn.Embed(c.max_len, c.d_model, dtype=dt, name="pos_embed")
        self.quant_embed = nn.Embed(c.num_quantizers, c.d_model, dtype=dt, name="quant_embed")
        # Optional rematerialization: trade FLOPs for activation memory in
        # the teacher-forcing backward (decode paths call .step and are
        # unaffected).
        layer_cls = nn.remat(DecoderLayer) if c.remat else DecoderLayer
        self.layers = [
            layer_cls(c, sp_mesh=self.sp_mesh, name=f"layer_{i}")
            for i in range(c.n_layers)
        ]
        self.norm_out = nn.LayerNorm(dtype=dt, name="norm_out")
        self.head = nn.Dense(c.vocab_size_audio, dtype=jnp.float32, name="head")

    # ---------------------------------------------------------------- utils

    def _flatten_ids(self, audio_tokens: jax.Array):
        """Normalize to flat tokens + matching quant/pos ids (defect-3 fix)."""
        if audio_tokens.ndim == 3:
            B, Q, T = audio_tokens.shape
            flat = audio_tokens.reshape(B, Q * T)  # quantizer-major
            quant_ids = jnp.repeat(jnp.arange(Q), T)[None].astype(jnp.int32)
            pos_ids = jnp.tile(jnp.arange(T), Q)[None].astype(jnp.int32)
        elif audio_tokens.ndim == 2:
            B, T = audio_tokens.shape
            flat = audio_tokens
            quant_ids = jnp.zeros((1, T), jnp.int32)
            pos_ids = jnp.arange(T)[None].astype(jnp.int32)
        else:
            raise ValueError("audio_tokens must be (B, T) or (B, Q, T)")
        return flat, quant_ids, pos_ids

    def _build_memory(self, text_hidden, text_mask, ref_hidden, ref_mask):
        """Prepend reference embeddings to the cross-attention memory
        (reference: mamba_decoder.py:148-165)."""
        B = text_hidden.shape[0]
        if text_mask is None:
            text_mask = jnp.ones(text_hidden.shape[:2], bool)
        if ref_hidden is None:
            return text_hidden, text_mask
        if ref_mask is None:
            ref_mask = jnp.ones((B, ref_hidden.shape[1]), bool)
        memory = jnp.concatenate([ref_hidden, text_hidden], axis=1)
        mask = jnp.concatenate([ref_mask, text_mask], axis=1)
        return memory, mask

    def embed_codec_tokens(self, tokens_3d: jax.Array) -> jax.Array:
        """Embed (B, Q, T) codec ids into (B, Q*T, d_model) reference hidden
        states using the decoder's own tables (reference: train.py:115-131)."""
        flat, quant_ids, pos_ids = self._flatten_ids(tokens_3d)
        return (
            self.token_embed(flat)
            + self.pos_embed(pos_ids)
            + self.quant_embed(quant_ids)
        )

    # -------------------------------------------------------------- forward

    def __call__(
        self,
        audio_tokens: jax.Array,
        text_hidden: jax.Array,
        z_style: jax.Array,
        text_mask: Optional[jax.Array] = None,
        ref_hidden: Optional[jax.Array] = None,
        ref_mask: Optional[jax.Array] = None,
        quant_ids: Optional[jax.Array] = None,
        pos_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``quant_ids`` / ``pos_ids`` override the automatic per-slot ids —
        used for shifted teacher forcing, where the input sequence
        [BOS, y_0..y_{L-2}] must be embedded with the slot ids of the full
        (Q, T) grid rather than a fresh arange."""
        c = self.cfg
        flat, auto_quant, auto_pos = self._flatten_ids(audio_tokens)
        quant_ids = auto_quant if quant_ids is None else quant_ids
        pos_ids = auto_pos if pos_ids is None else pos_ids
        memory, memory_mask = self._build_memory(text_hidden, text_mask, ref_hidden, ref_mask)
        x = self.token_embed(flat) + self.pos_embed(pos_ids) + self.quant_embed(quant_ids)
        for layer in self.layers:
            x, _ = layer(x, memory, z_style, memory_mask)
        return self.head(self.norm_out(x).astype(jnp.float32))

    # --------------------------------------------------------------- decode

    def decode_step(
        self,
        last_token: jax.Array,
        text_hidden: jax.Array,
        z_style: jax.Array,
        mamba_states: Sequence[MambaState],
        step_index: jax.Array,
        frames_per_stream: int,
        text_mask: Optional[jax.Array] = None,
        ref_hidden: Optional[jax.Array] = None,
        ref_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, List[MambaState]]:
        """Single AR step (reference: mamba_decoder.py:188-256, with the
        quantizer embedding included — defect-2 fix).

        ``step_index`` is the absolute position in the flattened sequence;
        the (quantizer, frame) pair is recovered as (step // F, step % F).
        """
        memory, memory_mask = self._build_memory(text_hidden, text_mask, ref_hidden, ref_mask)
        KV = [layer.project_memory(memory) for layer in self.layers]
        x = self._embed_step(last_token, step_index, frames_per_stream)
        new_states = []
        for layer, (K, V), st in zip(self.layers, KV, mamba_states):
            x, ns = layer.step(x, K, V, layer.film_params(z_style), memory_mask, st)
            new_states.append(ns)
        logits = self.head(self.norm_out(x).astype(jnp.float32))
        return logits, new_states

    def _embed_step(self, last_token, step_index, frames_per_stream):
        c = self.cfg
        step = jnp.asarray(step_index, jnp.int32)
        q_id = jnp.minimum(step // frames_per_stream, c.num_quantizers - 1)
        pos_id = step % frames_per_stream
        return (
            self.token_embed(last_token)
            + self.pos_embed(pos_id[None, None] if pos_id.ndim == 0 else pos_id)
            + self.quant_embed(q_id[None, None] if q_id.ndim == 0 else q_id)
        )

    def project_memories(
        self, text_hidden, text_mask=None, ref_hidden=None, ref_mask=None, z_style=None
    ):
        """Precompute everything constant across decode steps: per-layer
        memory (K, V), the memory mask, and (when ``z_style`` is given) the
        per-layer FiLM (gamma, beta)."""
        memory, memory_mask = self._build_memory(text_hidden, text_mask, ref_hidden, ref_mask)
        KV = [layer.project_memory(memory) for layer in self.layers]
        films = (
            [layer.film_params(z_style) for layer in self.layers]
            if z_style is not None
            else None
        )
        return KV, memory_mask, films

    def step_with_kv(
        self,
        last_token: jax.Array,
        KV: Sequence[Tuple[jax.Array, jax.Array]],
        memory_mask: Optional[jax.Array],
        films: Sequence[Tuple[jax.Array, jax.Array]],
        mamba_states: Sequence[MambaState],
        step_index: jax.Array,
        frames_per_stream: int,
    ) -> Tuple[jax.Array, List[MambaState]]:
        """Decode step against precomputed memory K/V + FiLM (scan body)."""
        x = self._embed_step(last_token, step_index, frames_per_stream)
        new_states = []
        for layer, (K, V), film, st in zip(self.layers, KV, films, mamba_states):
            x, ns = layer.step(x, K, V, film, memory_mask, st)
            new_states.append(ns)
        logits = self.head(self.norm_out(x).astype(jnp.float32))
        return logits, new_states

    def init_states(self, batch: int) -> List[MambaState]:
        c = self.cfg.with_mamba_dims()
        return [
            init_mamba_state(c.mamba, batch, dtype=jnp.dtype(c.dtype))
            for _ in range(c.n_layers)
        ]


class DecodeResult(NamedTuple):
    tokens: jax.Array  # (B, total_steps) generated token ids
    logits: jax.Array  # (B, total_steps, V) per-step logits


def greedy_decode(
    decoder: MambaTTSDecoder,
    variables,
    text_hidden: jax.Array,
    z_style: jax.Array,
    frames_per_stream: int,
    text_mask: Optional[jax.Array] = None,
    ref_hidden: Optional[jax.Array] = None,
    ref_mask: Optional[jax.Array] = None,
    num_streams: Optional[int] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: Optional[jax.Array] = None,
    collect_logits: bool = False,
    unroll: int = 4,
) -> DecodeResult:
    """Fully on-device autoregressive decode: one ``lax.scan`` over
    Q * frames_per_stream steps, carrying (last_token, per-layer MambaState).

    The synthesis driver the reference lacks (SURVEY §3.3): per-layer memory
    K/V are projected once; each scan step is the fused decoder-stack step.
    ``temperature == 0`` -> greedy argmax; otherwise categorical sampling.
    """
    c = decoder.cfg
    B = text_hidden.shape[0]
    Q = num_streams if num_streams is not None else c.num_quantizers
    total = Q * frames_per_stream

    KV, memory_mask, films = decoder.apply(
        variables,
        text_hidden,
        text_mask,
        ref_hidden,
        ref_mask,
        z_style,
        method=MambaTTSDecoder.project_memories,
    )
    states0 = decoder.init_states(B)
    token0 = jnp.full((B, 1), c.bos_id, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, step):
        token, states, key = carry
        logits, new_states = decoder.apply(
            variables,
            token,
            KV,
            memory_mask,
            films,
            states,
            step,
            frames_per_stream,
            method=MambaTTSDecoder.step_with_kv,
        )
        step_logits = logits[:, 0]  # (B, V)
        # Never emit the special PAD/BOS ids during synthesis.
        step_logits = step_logits.at[:, : c.num_special_tokens].set(-1e9)
        if temperature > 0.0:
            sampling_logits = step_logits
            if top_k > 0 and top_k < c.vocab_size_audio:
                kth = jnp.sort(sampling_logits, axis=-1)[:, -top_k][:, None]
                sampling_logits = jnp.where(sampling_logits >= kth, sampling_logits, -1e9)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, sampling_logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(step_logits, axis=-1)
        nxt = nxt.astype(jnp.int32)[:, None]
        out = (nxt[:, 0], step_logits) if collect_logits else (nxt[:, 0], jnp.zeros((B, 0)))
        return (nxt, new_states, key), out

    # unroll>1 lets XLA overlap weight streaming across adjacent steps
    # (+14% decode throughput on v5e at unroll=4).
    (_, _, _), (tokens, logits) = jax.lax.scan(
        body, (token0, states0, rng), jnp.arange(total), unroll=unroll
    )
    return DecodeResult(tokens=tokens.T, logits=jnp.moveaxis(logits, 0, 1))
