"""Config dataclass: serialization, sampling codes, mesh resolution."""

import pytest

from pldepth_tpu.core.config import (
    ExperimentConfig,
    MeshConfig,
    sampler_name_for_type,
)


def test_json_roundtrip_with_mesh():
    cfg = ExperimentConfig(
        model_name="ff_effnet_b4", input_size=640, batch_size=128,
        mesh=MeshConfig(data=16, model=1), step_milestones=(10, 20),
    )
    back = ExperimentConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.mesh.data == 16
    assert back.step_milestones == (10, 20)


def test_from_dict_rejects_unknown_keys():
    with pytest.raises(ValueError, match="Unknown config keys"):
        ExperimentConfig.from_dict({"learning_rate": 0.1})


def test_sampling_type_codes():
    # reference codes (PLDepth.py:97-108) + segment extension
    assert sampler_name_for_type(0) == "thresholded"
    assert sampler_name_for_type(1) == "info_score"
    assert sampler_name_for_type(3) == "purely_masked"
    assert sampler_name_for_type(4) == "segment"
    with pytest.raises(ValueError, match="wrong selection"):
        sampler_name_for_type(9)


def test_val_rpi_defaults_to_rpi():
    cfg = ExperimentConfig(rankings_per_image=42)
    assert cfg.val_rpi == 42
    assert cfg.replace(val_rankings_per_img=7).val_rpi == 7


def test_mesh_resolution():
    assert MeshConfig(data=-1, model=2).resolved_data(8) == 4
    with pytest.raises(AssertionError):
        MeshConfig(data=-1, model=3).resolved_data(8)


def test_cli_mesh_model_flag_builds_mesh():
    from pldepth_tpu.cli import _make_config

    cfg = _make_config({"mesh_model": 4, "spatial_sharding": True})
    assert cfg.mesh.model == 4 and cfg.mesh.data == -1
    assert cfg.spatial_sharding

    cfg2 = _make_config({"mesh_model": 1})
    assert cfg2.mesh.model == 1
