from mamba_tts_tpu.models.attention import CrossAttention
from mamba_tts_tpu.models.decoder import (
    DecodeResult,
    DecoderLayer,
    MambaTTSDecoder,
    greedy_decode,
)
from mamba_tts_tpu.models.mamba import MambaBlock, MambaState, init_mamba_state
from mamba_tts_tpu.models.smsd import SMSD, MDNHead, mixture_nll_loss, sample_mixture
from mamba_tts_tpu.models.style import (
    StyleConditioningPipeline,
    StyleProjection,
    length_regulate,
)
from mamba_tts_tpu.models.text_encoder import (
    DurationPredictor,
    TextEncoder,
    duration_loss,
)

__all__ = [
    "SMSD",
    "MDNHead",
    "mixture_nll_loss",
    "sample_mixture",
    "StyleConditioningPipeline",
    "StyleProjection",
    "length_regulate",
    "DurationPredictor",
    "TextEncoder",
    "duration_loss",
    "CrossAttention",
    "DecodeResult",
    "DecoderLayer",
    "MambaTTSDecoder",
    "MambaBlock",
    "MambaState",
    "greedy_decode",
    "init_mamba_state",
]
