"""Offline preprocessing CLI tests (sequential + parallel) on the synthetic
dataset, plus wavmax and OfflineDataset consumption."""
import json
from pathlib import Path

import numpy as np
import pytest

from mamba_tts_tpu import config as cl
from mamba_tts_tpu.data.dataset import VccmTTSDataset, make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthdata")
    csv_path, tar_path = make_synthetic_dataset(str(d), n_items=6)
    return csv_path, tar_path


@pytest.fixture(scope="module")
def tiny_cfg():
    return cl.from_json(open("tests/smoke_config.json").read())


def test_dataset_basics(synth):
    csv_path, tar_path = synth
    ds = VccmTTSDataset(csv_path, tar_path)
    assert len(ds) == 6 and ds.skipped == 0
    inputs, target = ds[0]
    assert inputs["voice_waveform"].ndim == 1
    assert np.isfinite(target).all() and np.abs(target).max() > 0
    batches = list(ds.batches(2, shuffle=True, seed=0))
    assert len(batches) == 3
    (bi, bt) = batches[0]
    assert bi["voice_waveform"].shape[0] == 2 and bt.shape[0] == 2


def test_sequential_preprocess_and_offline_dataset(synth, tiny_cfg, tmp_path):
    from mamba_tts_tpu.data.preprocess import DatasetPreprocessor, OfflineDataset

    csv_path, tar_path = synth
    out = tmp_path / "prep"
    pre = DatasetPreprocessor(str(out), [tar_path], "phoneme_vocab.json", cfg=tiny_cfg)
    n = pre.preprocess(csv_path)
    assert n == 6

    meta = json.load(open(out / "metadata.json"))
    assert len(meta) == 6
    assert {"item_name", "phoneme_str", "ph2word", "style_prompt"} <= set(meta[0])
    tensors = list((out / "tensors").glob("*.npy"))
    assert len(tensors) == 6 * 4  # phonemes/style/codec/spk_emb per item

    ods = OfflineDataset(str(out))
    assert len(ods) == 6
    item = ods[0]
    assert item["codec_tokens"].shape[1:] == (tiny_cfg.codec.max_seq_len, 5)
    assert item["phoneme_ids"].dtype == np.int32
    assert item["spk_emb"].shape == (1, tiny_cfg.codec.spk_dim)


def test_parallel_preprocess_matches_contract(synth, tiny_cfg, tmp_path):
    from mamba_tts_tpu.data.preprocess_parallel import ParallelDatasetPreprocessor

    csv_path, tar_path = synth
    out = tmp_path / "prep_par"
    pre = ParallelDatasetPreprocessor(
        str(out), [tar_path], "phoneme_vocab.json", cfg=tiny_cfg,
        cpu_workers=1, gpu_batch_size=4, io_workers=2,
    )
    n = pre.preprocess(csv_path)
    assert n == 6
    meta = json.load(open(out / "metadata.json"))
    assert len(meta) == 6
    tensors = list((out / "tensors").glob("*.npy"))
    assert len(tensors) == 6 * 4


def test_wavmax(synth):
    from mamba_tts_tpu.tools.wavmax import longest_wav_in_tar

    _, tar_path = synth
    name, dur = longest_wav_in_tar(tar_path)
    assert name is not None and name.endswith(".wav")
    assert abs(dur - 0.4) < 0.01  # all synthetic clips are 0.4 s
