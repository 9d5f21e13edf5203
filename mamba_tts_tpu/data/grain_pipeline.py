"""grain-backed input pipeline (optional alternative to ``dataset.batches``).

The TPU-native replacement for the reference's torch DataLoader (SURVEY §2.2
"PyTorch framework itself -> ... grain/tf.data input pipeline"): wraps
:class:`VccmTTSDataset` as a grain data source with shuffling, worker-based
prefetch, and padded batch collation.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from mamba_tts_tpu.data.dataset import VccmTTSDataset, _pad_stack


class _Source:
    """grain RandomAccessDataSource over the dataset."""

    def __init__(self, dataset: VccmTTSDataset):
        self._ds = dataset

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx):
        inputs, target = self._ds[int(idx)]
        return {
            "voice_waveform": inputs["voice_waveform"],
            "text_prompt": inputs["text_prompt"],
            "style_prompt": inputs["style_prompt"],
            "target_waveform": target,
        }


def _collate(items) -> Tuple[dict, np.ndarray]:
    return (
        {
            "voice_waveform": _pad_stack([it["voice_waveform"] for it in items]),
            "text_prompt": [it["text_prompt"] for it in items],
            "style_prompt": [it["style_prompt"] for it in items],
        },
        _pad_stack([it["target_waveform"] for it in items]),
    )


def make_grain_loader(
    dataset: VccmTTSDataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
) -> Iterator[Tuple[dict, np.ndarray]]:
    """Returns an iterator of collated batches backed by grain.

    ``worker_count > 0`` moves tar extraction + WAV decode off the main
    process (the DataLoader-workers role; the reference runs num_workers=0 —
    reference: train.py:150).
    """
    import grain.python as grain

    source = _Source(dataset)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.NoSharding(),
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
    for batch in loader:
        # grain batches dict-of-arrays; re-collate to the framework contract
        items = [
            {k: batch[k][i] for k in batch}
            for i in range(len(batch["text_prompt"]))
        ]
        yield _collate(items)
