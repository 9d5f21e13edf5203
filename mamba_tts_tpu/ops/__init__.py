from mamba_tts_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_chunked,
    selective_scan_ref,
    selective_scan_step,
)

__all__ = [
    "selective_scan",
    "selective_scan_chunked",
    "selective_scan_ref",
    "selective_scan_step",
]
