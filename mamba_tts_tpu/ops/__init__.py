from mamba_tts_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_chunked,
    selective_scan_ref,
    selective_scan_step,
)

__all__ = [
    "megakernel_greedy_decode",
    "selective_scan",
    "selective_scan_chunked",
    "selective_scan_ref",
    "selective_scan_step",
]


def __getattr__(name):
    # lazy: decode_megakernel imports models.decoder, which imports this
    # package for the scan ops — an eager re-export would be circular
    if name == "megakernel_greedy_decode":
        from mamba_tts_tpu.ops.decode_megakernel import megakernel_greedy_decode

        return megakernel_greedy_decode
    raise AttributeError(name)
