"""grain input pipeline tests."""
import numpy as np
import pytest

from mamba_tts_tpu.data.dataset import VccmTTSDataset, make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("grain_synth")
    csv_path, tar_path = make_synthetic_dataset(str(d), n_items=6)
    return VccmTTSDataset(csv_path, tar_path)


def test_grain_loader_batches(ds):
    from mamba_tts_tpu.data.grain_pipeline import make_grain_loader

    batches = list(make_grain_loader(ds, batch_size=2, seed=0))
    assert len(batches) == 3
    inputs, target = batches[0]
    assert inputs["voice_waveform"].shape[0] == 2
    assert target.ndim == 2 and target.shape[0] == 2
    assert len(inputs["text_prompt"]) == 2
    assert isinstance(str(inputs["text_prompt"][0]), str)
    assert np.isfinite(target).all()


def test_grain_loader_shuffle_determinism(ds):
    from mamba_tts_tpu.data.grain_pipeline import make_grain_loader

    a = [t.sum() for _, t in make_grain_loader(ds, batch_size=2, seed=7)]
    b = [t.sum() for _, t in make_grain_loader(ds, batch_size=2, seed=7)]
    np.testing.assert_allclose(a, b)
