from mamba_tts_tpu.parallel.mesh import (
    make_mesh,
    partition_spec_for_path,
    shard_params,
    replicate,
)

__all__ = ["make_mesh", "partition_spec_for_path", "shard_params", "replicate"]
