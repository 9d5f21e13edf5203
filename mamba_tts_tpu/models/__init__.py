from mamba_tts_tpu.models.attention import CrossAttention
from mamba_tts_tpu.models.decoder import (
    DecodeResult,
    DecoderLayer,
    MambaTTSDecoder,
    greedy_decode,
)
from mamba_tts_tpu.models.mamba import MambaBlock, MambaState, init_mamba_state

__all__ = [
    "CrossAttention",
    "DecodeResult",
    "DecoderLayer",
    "MambaTTSDecoder",
    "MambaBlock",
    "MambaState",
    "greedy_decode",
    "init_mamba_state",
]
