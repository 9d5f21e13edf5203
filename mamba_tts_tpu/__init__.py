"""mamba_tts_tpu — TPU-native controllable TTS framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
whcorkran/mamba-TTS-project (ControlSpeech-style controllable TTS with a
Mamba selective-SSM autoregressive audio-token decoder):

- ``ops``      : selective-scan kernel pair (chunked training scan + O(1)
                 decode step), Pallas TPU kernels, fused attention helpers.
- ``models``   : Mamba decoder stack, FFT text encoder, duration predictor,
                 SMSD mixture-density style module, style conditioning
                 pipeline, FACodec-compatible neural codec.
- ``text``     : self-contained text front-end (normalization, G2P,
                 phoneme vocabulary).
- ``audio``    : WAV I/O, resampling, loudness normalization, codec wrapper.
- ``data``     : dataset + offline preprocessing pipelines.
- ``train``    : jitted train step, losses, optimizer, orbax checkpointing.
- ``infer``    : jit-compiled autoregressive synthesis (text -> waveform).
- ``parallel`` : device-mesh construction and sharding rules (dp/tp).

The reference's documented contracts (shapes, losses, decoding semantics) are
the spec; the implementation is idiomatic TPU-first JAX rather than a port.
"""

__version__ = "0.1.0"
