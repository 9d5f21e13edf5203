"""Synthesis entry point: text + style prompt + voice prompt -> waveform.

The reference defines ``decode_step`` but ships NO synthesis driver
(SURVEY §3.3: "no synthesize.py/infer.py — the full inference pipeline exists
only as documented contracts").  Here it is a first-class, jit-compiled
pipeline:

    text --G2P--> phonemes --TextEncoder--> text_hidden
    style prompt --BERT--> SMSD sample --> z_style
    voice prompt --FACodec encode--> ref tokens --embed--> ref_hidden
    duration predictor --> total frame budget
    greedy/sampled lax.scan decode (zero host round-trips per token)
    codec ids --FACodec decode--> waveform

CLI:
    python -m mamba_tts_tpu.infer.synthesize --text "hello world" \
        --style_prompt "speak fast" --voice_wav prompt.wav --output out.wav \
        [--checkpoint_dir checkpoints --config_json cfg.json]
"""
from __future__ import annotations

import argparse
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamba_tts_tpu.audio.codec import FACodecTokenizer
from mamba_tts_tpu.config import TTSConfig
from mamba_tts_tpu.models.decoder import greedy_decode
from mamba_tts_tpu.models.style_text_encoder import StyleTextEncoder
from mamba_tts_tpu.models.tts import MambaTTS
from mamba_tts_tpu.text.processor import PhonemeFrontend

# Tokens decoded per megakernel grid step.  Measured on v5e: per-grid-step
# overhead is negligible (U=8 was 3% SLOWER than U=1 from code bloat), so
# stay at 1; numerics are unroll-invariant — tests pin U=1 == U>1 exactly.
_MEGAKERNEL_UNROLL = 1


def _run_chunked(run, arrays, rng, chunk):
    """Call the jitted decode in row chunks of <= ``chunk`` and concatenate.

    ``chunk`` comes from the VMEM fit planner (B=8 at the flagship 3 s
    prompt, larger at shorter memories — see _decode_rows); one full
    megakernel chunk delivers ~109k tok/s at B=8 / 235k at B=16-short, 5x+
    what the monolithic step scan manages at ANY batch (B=16 measured
    23.9k).  So large serving batches are fastest as sequential full-rate
    chunks.  ``chunk=None`` runs monolithic."""
    import jax as _jax

    B = arrays[0].shape[0]
    if chunk is None or B <= chunk:
        return run(*arrays, rng)
    keys = _jax.random.split(rng, -(-B // chunk))
    outs = []
    for i, lo in enumerate(range(0, B, chunk)):
        sl = [a[lo:lo + chunk] for a in arrays]
        outs.append(run(*sl, keys[i]))
    return jnp.concatenate(outs, axis=0)


def _megakernel_dtypes(cfg, batch: int, memory_len: int, sampled: bool = False,
                       unroll_steps: int = 1):
    """(weight_dtype, kv_dtype) whose VMEM residency fits at this batch and
    cross-attention memory length, or None to fall back to the step scan.

    Delegates to ops.decode_megakernel.megakernel_fit — the fit is computed
    from the actual plan shapes, so short voice prompts admit larger
    batches than the flagship 3 s prompt (where the measured ladder is
    B<=2 bf16/bf16 52k tok/s, B<=4 int8 weights 79.7k, B<=8 int8 K/V
    114.7k aggregate on v5e)."""
    from mamba_tts_tpu.ops.decode_megakernel import megakernel_fit

    return megakernel_fit(cfg, batch, memory_len, unroll_steps=unroll_steps,
                          sampled=sampled)


class Synthesizer:
    """End-to-end TTS inference engine."""

    def __init__(
        self,
        cfg: TTSConfig,
        params,
        tokenizer: Optional[FACodecTokenizer] = None,
        frontend: Optional[PhonemeFrontend] = None,
        style_encoder: Optional[StyleTextEncoder] = None,
        quant: str = "none",
        mesh=None,
    ):
        """``quant`` selects the decode-scan numerics: "none" (bf16 weights,
        precision-exact with training), "int8" (weight-streaming int8 matvecs
        via ops/int8_matvec.py), "int8_kv" (additionally int8 per-layer
        cross-attention K/V — the dominant traffic term of batched decode), or
        "megakernel" (ops/decode_megakernel.py: the whole decode as ONE
        pallas_call with VMEM-resident weights — the fastest serving path;
        handles greedy AND Gumbel-max sampled decodes with residency dtypes
        chosen per (batch, memory length) by the VMEM fit planner
        (ops.decode_megakernel.megakernel_fit — B<=8 at the flagship 3 s
        prompt, larger at shorter prompts); batches past the fit fall back
        to the int8 step scan).

        ``mesh`` (a jax.sharding.Mesh with a "data" axis) turns on SPMD
        batch-parallel serving: ``synthesize_batch`` shards utterance rows
        over the mesh with ``jax.shard_map`` — each chip runs its own full
        decode (megakernel included; a Pallas call per shard) on its rows,
        with the weights replicated.  Aggregate throughput scales with the
        data axis because decode has NO cross-row communication; single-
        utterance ``synthesize`` stays on one chip.  Sampled (temperature
        > 0) decodes and style draws fold a per-shard rng — distribution-
        identical to the unsharded path but a different stream, the same
        contract as ``_run_chunked``'s per-chunk key splits."""
        if quant not in ("none", "int8", "int8_kv", "megakernel"):
            raise ValueError(
                f"quant must be none|int8|int8_kv|megakernel, got {quant!r}")
        self.cfg = cfg
        self.quant = quant
        self.mesh = mesh
        self.model = MambaTTS(cfg)
        from mamba_tts_tpu.models.decoder import MambaTTSDecoder

        self.decoder = MambaTTSDecoder(cfg.decoder.with_mamba_dims())
        self.params = params
        self._qparams = None
        self._weight_plans = None
        if quant != "none":
            from mamba_tts_tpu.infer.quant_decode import quantize_decoder_params

            self._qparams = quantize_decoder_params(
                params["decoder"], self.decoder.cfg
            )
        if quant == "megakernel":
            # Session-precomputed kernel weight plans (one per residency
            # dtype the VMEM fit planner can pick), device-resident and
            # passed to the decode jit as runtime arguments: the per-call
            # jit then does no weight stacking/casting/scale-folding, and
            # the compile request stays small (see _decode_fn).
            from mamba_tts_tpu.ops.decode_megakernel import build_weight_plan

            dcfg = self.decoder.cfg
            self._weight_plans = jax.jit(
                lambda q: {wd: build_weight_plan(dcfg, q, wd)
                           for wd in ("bfloat16", "int8")}
            )(self._qparams)
        self.tokenizer = tokenizer or FACodecTokenizer(cfg.codec)
        self.frontend = frontend or PhonemeFrontend(vocab_path=cfg.data.phoneme_vocab_path)
        self.style_encoder = style_encoder or StyleTextEncoder(cfg.style_encoder)
        self._decode_cache = {}
        self._voice_cache = {}  # name -> (codec (max_seq, Q), true frames)

        model = self.model

        # Jitted duration prologue: ONE compiled call returning one scalar —
        # on the tunneled TPU backend (~10 ms/dispatch, slow output ship)
        # the previous op-by-op model.apply dominated short-utterance latency.
        @jax.jit
        def _frames(params, phoneme_ids, text_mask):
            mvars = {"params": params}
            text_hidden = model.apply(mvars, phoneme_ids, text_mask, method=MambaTTS.encode_text)
            log_dur = model.apply(
                mvars, text_hidden, text_mask, method=MambaTTS.predict_durations
            )
            dur = jnp.exp(log_dur) * text_mask.astype(log_dur.dtype)
            return dur.sum(axis=1)  # (B,) per-utterance frame budgets

        self._frames_jit = _frames

    # ------------------------------------------------------------- pipeline

    def _decode_fn(self, frames_per_stream: int, temperature: float,
                   sharded: bool = False):
        key = (frames_per_stream, temperature, sharded)
        if key not in self._decode_cache:
            model, decoder = self.model, self.decoder
            params_const = self.params
            quant = self.quant

            # ENCODER params are closed over (small constants: text encoder,
            # SMSD sampler, audio-embedding tables); DECODER weights are
            # runtime jit ARGUMENTS.  Closing over the decoder too would
            # embed its full weight set in the serialized compile request —
            # the remote-compile service rejects bodies that large (HTTP
            # 413), and the megakernel gains nothing from constants anyway:
            # its VMEM residency comes from constant-index BlockSpecs over
            # pallas_call operands, and plan preprocessing already runs
            # on-device per call (the optimization_barrier posture).  The
            # int8 paths stream weights by design.  Only the quant="none"
            # bf16 step scan loses XLA's constant-pinning here (bench.py's
            # decoder-only closure still measures that posture).
            def body(dec_params, qparams, wplans, phoneme_ids, text_mask,
                     style_bert, voice_codec, rng):
                params = params_const
                mvars = {"params": params}
                # independent streams for the style draw and token sampling
                # (one shared key would correlate the two)
                style_rng, rng = jax.random.split(rng)
                text_hidden = model.apply(mvars, phoneme_ids, text_mask, method=MambaTTS.encode_text)
                z_style = model.apply(mvars, style_bert, style_rng, method=MambaTTS.sample_style)
                ref_hidden, ref_mask = model.apply(mvars, voice_codec, method=MambaTTS.embed_voice)
                mega_dtypes = _megakernel_dtypes(
                    decoder.cfg, phoneme_ids.shape[0],
                    ref_hidden.shape[1] + text_hidden.shape[1],
                    sampled=temperature > 0,
                    unroll_steps=_MEGAKERNEL_UNROLL,
                )
                if quant == "megakernel" and mega_dtypes is not None:
                    # whole-decode Pallas kernel; weight/KV residency dtypes
                    # picked per batch so the plan fits VMEM.  Greedy and
                    # Gumbel-max sampled decodes both ride it; larger batches
                    # fall through to the step scan.
                    from mamba_tts_tpu.ops.decode_megakernel import (
                        megakernel_greedy_decode,
                    )

                    res = megakernel_greedy_decode(
                        decoder,
                        {"params": dec_params},
                        qparams,
                        text_hidden,
                        z_style,
                        frames_per_stream,
                        text_mask=text_mask,
                        ref_hidden=ref_hidden,
                        ref_mask=ref_mask,
                        unroll_steps=_MEGAKERNEL_UNROLL,
                        weight_dtype=mega_dtypes[0],
                        kv_dtype=mega_dtypes[1],
                        temperature=temperature,
                        rng=rng,
                        weight_plan=(wplans or {}).get(mega_dtypes[0]),
                    )
                elif quant != "none":
                    from mamba_tts_tpu.infer.quant_decode import greedy_decode_int8

                    res = greedy_decode_int8(
                        decoder,
                        {"params": dec_params},
                        qparams,
                        text_hidden,
                        z_style,
                        frames_per_stream,
                        text_mask=text_mask,
                        ref_hidden=ref_hidden,
                        ref_mask=ref_mask,
                        temperature=temperature,
                        rng=rng,
                        int8_kv=(quant == "int8_kv"),
                    )
                else:
                    res = greedy_decode(
                        decoder,
                        {"params": dec_params},
                        text_hidden,
                        z_style,
                        frames_per_stream,
                        text_mask=text_mask,
                        ref_hidden=ref_hidden,
                        ref_mask=ref_mask,
                        temperature=temperature,
                        rng=rng,
                    )
                return res.tokens

            if sharded:
                # SPMD batch-parallel decode: rows shard over the mesh's
                # "data" axis; each shard traces `body` at its LOCAL batch
                # (so the megakernel VMEM fit sees per-chip rows) and runs
                # its own Pallas calls.  Weights are closed over =>
                # replicated.  No collectives: decode is row-independent
                # (check_vma can't see that through the Pallas call).
                from jax.sharding import PartitionSpec as P

                mesh = self.mesh
                bspec = P("data")

                def shard_body(dec_params, qparams, wplans, phoneme_ids,
                               text_mask, style_bert, voice_codec, rng):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index("data")
                    )
                    return body(dec_params, qparams, wplans, phoneme_ids,
                                text_mask, style_bert, voice_codec, rng)

                # weights replicate (P() prefix over the pytrees), rows shard
                run_jit = jax.jit(jax.shard_map(
                    shard_body,
                    mesh=mesh,
                    in_specs=(P(), P(), P(), bspec, bspec, bspec, bspec, P()),
                    out_specs=bspec,
                    check_vma=False,
                ))
            else:
                run_jit = jax.jit(body)

            self._decode_cache[key] = partial(
                run_jit, self.params["decoder"], self._qparams,
                self._weight_plans,
            )
        return self._decode_cache[key]

    def register_voice(self, name: str, voice_wav) -> None:
        """Encode a voice prompt ONCE and cache its codec grid under
        ``name``; ``synthesize``/``synthesize_batch`` then accept the name
        string in place of the waveform.  Repeat-speaker serving skips the
        per-request FACodec encode entirely (the encode is the dominant
        front-end cost for a multi-second prompt).

        The reference has no serving driver, let alone speaker reuse; this
        is TPU-serving value-add (reference: dataset.py:85-92 re-reads a
        prompt WAV per sample)."""
        codec, _, lens = self.tokenizer.encode_with_lengths([voice_wav])
        self._voice_cache[name] = (np.asarray(codec[0]), int(lens[0]))

    def _encode_voice(self, voice_wavs):
        """Tokenize voice prompts, then TRIM the codec grid to a 64-frame
        bucket of the true prompt length.  The tokenizer pads to the full
        ``max_seq_len`` (1024 frames = 5120 ref tokens); carrying that into
        the decoder multiplies cross-attention K/V by ~4x for a typical 3 s
        prompt — past VMEM for the megakernel and pure waste for the scans
        (padding is masked, but its K/V still streams every step).

        Rows may be waveforms or ``register_voice`` names.  Identical
        waveform OBJECTS encode once (the batch CLI shares one prompt
        across all rows; encoding it B times is pure waste)."""
        rows: list = [None] * len(voice_wavs)
        lens: list = [0] * len(voice_wavs)
        fresh, fresh_idx, seen = [], [], {}
        for i, v in enumerate(voice_wavs):
            if isinstance(v, str) and v in self._voice_cache:
                rows[i], lens[i] = self._voice_cache[v]
                continue
            # unregistered strings fall through as file paths (tokenizer
            # loads them); dedupe paths by value, arrays by object identity
            key = v if isinstance(v, str) else id(v)
            if key in seen:
                rows[i] = seen[key]  # backreference, filled after encode
            else:
                seen[key] = i
                fresh.append(v)
                fresh_idx.append(i)
        if fresh:
            codec, _, fresh_lens = self.tokenizer.encode_with_lengths(fresh)
            for j, i in enumerate(fresh_idx):
                rows[i] = np.asarray(codec[j])
                lens[i] = int(fresh_lens[j])
        for i, r in enumerate(rows):
            if isinstance(r, int):  # dedup backreference
                rows[i], lens[i] = rows[r], lens[r]
        S = int(min(self.cfg.codec.max_seq_len,
                    -(-max(8, max(lens)) // 64) * 64))
        return np.stack([r[:S] for r in rows])

    def predict_frames_per_utterance(self, phoneme_ids, text_mask) -> np.ndarray:
        """(B,) per-utterance frame budgets from the duration predictor (sum
        of exp(log_dur) over valid phonemes).  One jitted call."""
        frames = np.asarray(
            jax.device_get(
                self._frames_jit(
                    self.params, jnp.asarray(phoneme_ids), jnp.asarray(text_mask)
                )
            )
        )
        return np.clip(frames, 8, self.cfg.codec.max_seq_len).astype(np.int64)

    def predict_frames(self, phoneme_ids, text_mask) -> int:
        """Batch-max frame budget (the fixed-shape serving default)."""
        return int(self.predict_frames_per_utterance(phoneme_ids, text_mask).max())

    def synthesize(
        self,
        text: str,
        style_prompt: str,
        voice_wav,
        frames: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> Tuple[np.ndarray, dict]:
        """Returns (waveform (T,) float32 @16 kHz, info dict).

        ``voice_wav``: a waveform array, a WAV path, or a name previously
        passed to :meth:`register_voice` (skips the prompt encode)."""
        t0 = time.perf_counter()
        phoneme_ids, _, text_mask = self.frontend.encode_batch(
            [text], pad_to=self.cfg.data.max_text_len
        )
        style_bert = np.asarray(self.style_encoder.embed([style_prompt]))
        voice_codec = self._encode_voice([voice_wav])
        if frames is None:
            frames = self.predict_frames(phoneme_ids, text_mask)
        # Static-shape buckets for the decode scan (bounded recompiles).
        frames = self._bucket(frames)

        run = self._decode_fn(frames, temperature)
        tokens = run(
            jnp.asarray(phoneme_ids),
            jnp.asarray(text_mask),
            jnp.asarray(style_bert),
            jnp.asarray(voice_codec),
            jax.random.PRNGKey(seed),
        )
        tokens = np.asarray(jax.device_get(tokens))  # (1, Q*frames)
        Q = self.cfg.decoder.num_quantizers
        codec = tokens.reshape(1, Q, frames).transpose(0, 2, 1)  # (1, frames, Q)
        wav = self.tokenizer.decode(codec)[0]
        wall = time.perf_counter() - t0
        info = {
            "frames": frames,
            "tokens": int(Q * frames),
            "audio_seconds": frames / self.tokenizer.frames_per_second,
            "wall_seconds": wall,
            "rtf": wall / (frames / self.tokenizer.frames_per_second),
        }
        return wav, info

    def _bucket(self, frames) -> int:
        return int(min(-(-int(frames) // 64) * 64, self.cfg.codec.max_seq_len))

    def _decode_rows(self, arrays, frames: int, temperature: float, rng):
        """Decode rows at one frame budget; returns (B, Q*frames) tokens."""
        B = arrays[0].shape[0]
        n_shards = 1
        sharded = self.mesh is not None and B > 1
        if sharded:
            n_shards = int(self.mesh.shape["data"])
        run = self._decode_fn(frames, temperature, sharded=sharded)
        chunk = None
        if self.quant == "megakernel":
            # Chunk so each megakernel call fits VMEM at THIS memory length
            # (voice-codec tokens + text tokens): short prompts admit larger
            # chunks (e.g. 16+ at a 64-frame prompt bucket) than the 3 s
            # flagship prompt (8).  0 -> monolithic; run() then falls back
            # to the step scan via the same fit check.  Under a mesh the fit
            # applies PER SHARD, so the host-level chunk scales with the
            # data axis.
            from mamba_tts_tpu.ops.decode_megakernel import megakernel_max_batch

            Q = self.cfg.decoder.num_quantizers
            memory_len = arrays[3].shape[1] * Q + arrays[0].shape[1]
            per_shard = megakernel_max_batch(
                self.cfg.decoder, memory_len,
                unroll_steps=_MEGAKERNEL_UNROLL, sampled=temperature > 0,
            )
            chunk = per_shard * n_shards or None
        if sharded:
            # shard_map needs row counts divisible by the data axis: pad by
            # repeating the last row (decode is row-independent), trim
            # after.  chunk is already a multiple of n_shards, so every
            # chunk _run_chunked cuts — including the remainder — divides.
            Bp = -(-B // n_shards) * n_shards
            if Bp != B:
                reps = [jnp.broadcast_to(a[-1:], (Bp - B,) + a.shape[1:])
                        for a in arrays]
                arrays = [jnp.concatenate([a, r], axis=0)
                          for a, r in zip(arrays, reps)]
        out = _run_chunked(run, arrays, rng, chunk=chunk)
        return np.asarray(jax.device_get(out))[:B]

    def synthesize_batch(
        self,
        texts,
        style_prompts,
        voice_wavs,
        frames: Optional[int] = None,
        temperature: float = 0.0,
        seed: int = 0,
        variable_length: bool = False,
    ):
        """Batched serving path: lists of (text, style, voice prompt) decoded
        in one jitted scan.  Returns (waveforms, info).

        ``variable_length=False`` (default): every utterance decodes at the
        batch-max frame budget — ONE static shape, maximum compile stability;
        returns (B, T_audio) stacked waveforms.  ``variable_length=True``:
        utterances group by their OWN 64-frame duration bucket and each group
        decodes at its own budget (VERDICT r2 #7) — short utterances stop
        paying for the batch's longest one; returns a LIST of per-utterance
        waveforms trimmed to their predicted frames.  With an explicit
        ``frames`` budget, all rows decode at that one bucket but the list
        contract and per-utterance trimming (capped at ``frames``) hold.  Bucket shapes are
        64-multiples capped at max_seq_len, so at most 16 decode shapes
        compile over a server's lifetime.

        Note: streaming (chunked) synthesis is intentionally NOT offered —
        the reference's quantizer-major flattening emits the content stream
        last, so no frame is vocodable before decoding finishes (reference:
        audio_encoder.py:248-256).
        """
        assert len(texts) == len(style_prompts) == len(voice_wavs)
        t0 = time.perf_counter()
        phoneme_ids, _, text_mask = self.frontend.encode_batch(
            list(texts), pad_to=self.cfg.data.max_text_len
        )
        style_bert = np.asarray(self.style_encoder.embed(list(style_prompts)))
        voice_codec = self._encode_voice(list(voice_wavs))
        B = len(texts)
        Q = self.cfg.decoder.num_quantizers
        arrays = (
            jnp.asarray(phoneme_ids),
            jnp.asarray(text_mask),
            jnp.asarray(style_bert),
            jnp.asarray(voice_codec),
        )

        if variable_length:
            per_utt = self.predict_frames_per_utterance(phoneme_ids, text_mask)
            if frames is not None:
                # explicit budget: decode at ONE fixed bucket, but keep the
                # documented list-of-trimmed-waveforms contract (each row
                # trimmed to its own predicted duration, capped at frames)
                per_utt = np.minimum(per_utt, int(frames))
                buckets = np.full(B, self._bucket(frames))
            else:
                buckets = np.array([self._bucket(f) for f in per_utt])
            wavs: list = [None] * B
            total_tokens = 0
            keys = jax.random.split(jax.random.PRNGKey(seed), B)
            for bucket in sorted(set(buckets.tolist())):
                idx = np.nonzero(buckets == bucket)[0]
                sel = tuple(a[jnp.asarray(idx)] for a in arrays)
                tokens = self._decode_rows(sel, bucket, temperature, keys[idx[0]])
                codec = tokens.reshape(len(idx), Q, bucket).transpose(0, 2, 1)
                group_wavs = self.tokenizer.decode(codec)
                for row, i in enumerate(idx):
                    n = int(per_utt[i]) * self.tokenizer.hop
                    wavs[int(i)] = group_wavs[row][:n]
                total_tokens += len(idx) * Q * bucket
            wall = time.perf_counter() - t0
            info = {
                "frames": [int(f) for f in per_utt],
                "buckets": buckets.tolist(),
                "tokens": total_tokens,
                "audio_seconds": [
                    int(f) / self.tokenizer.frames_per_second for f in per_utt
                ],
                "wall_seconds": wall,
                "tokens_per_sec": total_tokens / wall,
            }
            return wavs, info

        if frames is None:
            frames = self.predict_frames(phoneme_ids, text_mask)
        frames = self._bucket(frames)
        tokens = self._decode_rows(
            arrays, frames, temperature, jax.random.PRNGKey(seed)
        )
        codec = tokens.reshape(B, Q, frames).transpose(0, 2, 1)
        wavs = self.tokenizer.decode(codec)
        wall = time.perf_counter() - t0
        audio_seconds = frames / self.tokenizer.frames_per_second
        info = {
            "frames": frames,
            "tokens": int(B * Q * frames),
            "audio_seconds": audio_seconds,
            "wall_seconds": wall,
            "tokens_per_sec": B * Q * frames / wall,
        }
        return wavs, info


def load_synthesizer(
    cfg: Optional[TTSConfig] = None, checkpoint_dir: Optional[str] = None, seed: int = 0,
    codec_ckpts=None, quant: str = "none", mesh=None,
) -> Synthesizer:
    """Build a Synthesizer from a checkpoint (or fresh init).  When ``cfg``
    is None and the checkpoint dir has a ``config.json`` (written by the
    train CLI), the model self-configures from it."""
    from mamba_tts_tpu.train import state as state_lib
    from mamba_tts_tpu.train.train import build_model, init_params

    if cfg is None:
        import os

        from mamba_tts_tpu import config as config_lib

        cfg_path = os.path.join(checkpoint_dir or "", "config.json")
        if checkpoint_dir is not None and os.path.exists(cfg_path):
            cfg = config_lib.from_json(open(cfg_path).read())
        else:
            cfg = TTSConfig()

    model = build_model(cfg)
    params = None
    if checkpoint_dir is not None:
        # Abstract restore: no throwaway random init of the full tree.
        abstract = jax.eval_shape(
            lambda key: init_params(model, cfg, key), jax.random.PRNGKey(seed)
        )
        params, restored = state_lib.restore_params(checkpoint_dir, abstract)
        if not restored:
            params = None
    if params is None:
        params = init_params(model, cfg, jax.random.PRNGKey(seed))
    tokenizer = None
    if codec_ckpts:
        tokenizer = FACodecTokenizer(
            cfg.codec, torch_encoder_ckpt=codec_ckpts[0], torch_decoder_ckpt=codec_ckpts[1]
        )
    return Synthesizer(cfg, params, tokenizer=tokenizer, quant=quant, mesh=mesh)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", type=str, default=None,
                        help="single-utterance mode (or use --texts_file)")
    parser.add_argument("--style_prompt", type=str, default="speak in a neutral voice")
    parser.add_argument("--voice_wav", type=str, required=True)
    parser.add_argument("--output", type=str, default="synthesized.wav")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--config_json", type=str, default=None)
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--facodec_encoder_ckpt", type=str, default=None,
                        help="pretrained ns3_facodec_encoder.bin (converted "
                             "on load; reference: audio_encoder.py:165-173)")
    parser.add_argument("--facodec_decoder_ckpt", type=str, default=None)
    parser.add_argument("--quant", type=str, default="none",
                        choices=("none", "int8", "int8_kv", "megakernel"),
                        help="decode-scan numerics (int8 weight streaming; "
                             "int8_kv also quantizes cross-attn K/V; "
                             "megakernel = one-pallas_call B=1 greedy decode)")
    parser.add_argument("--texts_file", type=str, default=None,
                        help="batch mode: file with one text per line "
                             "(style/voice prompts shared); writes "
                             "<output-stem>_NNN.wav per line")
    parser.add_argument("--variable_length", action="store_true",
                        help="batch mode: group rows by their own 64-frame "
                             "duration bucket instead of the batch max")
    parser.add_argument("--dp_serving", action="store_true",
                        help="shard batch rows over all devices on a "
                             "jax.sharding Mesh (data axis) via shard_map")
    parser.add_argument("--bert_vocab", type=str, default=None,
                        help="path to a real BERT vocab.txt for the style-"
                             "text encoder; without it the WordPiece "
                             "tokenizer uses a hash vocabulary (warns)")
    args = parser.parse_args(argv)
    if args.text is None and not args.texts_file:
        parser.error("one of --text or --texts_file is required")

    from mamba_tts_tpu import config as config_lib

    cfg = (
        config_lib.from_json(open(args.config_json).read())
        if args.config_json
        else TTSConfig()
    )
    if args.bert_vocab:
        cfg = config_lib.override(cfg, "style_encoder.bert_vocab", args.bert_vocab)
    ckpts = (
        (args.facodec_encoder_ckpt, args.facodec_decoder_ckpt)
        if args.facodec_encoder_ckpt else None
    )
    mesh = None
    if args.dp_serving:
        from mamba_tts_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((len(jax.devices()),), ("data",))
    synth = load_synthesizer(
        cfg, args.checkpoint_dir, args.seed, codec_ckpts=ckpts,
        quant=args.quant, mesh=mesh,
    )
    from mamba_tts_tpu.audio.wavio import write_wav

    if args.texts_file:
        texts = [ln.strip() for ln in open(args.texts_file) if ln.strip()]
        B = len(texts)
        wavs, info = synth.synthesize_batch(
            texts, [args.style_prompt] * B, [args.voice_wav] * B,
            frames=args.frames, temperature=args.temperature, seed=args.seed,
            variable_length=args.variable_length,
        )
        stem = args.output[:-4] if args.output.endswith(".wav") else args.output
        for i, w in enumerate(wavs):
            write_wav(f"{stem}_{i:03d}.wav", np.asarray(w), cfg.codec.sample_rate)
        print(info)
        print(f"wrote {B} wavs to {stem}_*.wav"
              + (f" (data-parallel over {len(jax.devices())} devices)"
                 if mesh is not None else ""))
        return

    wav, info = synth.synthesize(
        args.text, args.style_prompt, args.voice_wav,
        frames=args.frames, temperature=args.temperature, seed=args.seed,
    )
    write_wav(args.output, wav, cfg.codec.sample_rate)
    print(info)
    print(f"wrote {args.output}: {info['audio_seconds']:.2f}s audio, RTF {info['rtf']:.3f}")


if __name__ == "__main__":
    main()
