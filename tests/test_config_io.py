"""Config serialization: dict/YAML round-trips and CLI overrides."""

import pytest

from feature_detector_tpu.core.config import FrontendConfig, NNModelType
from feature_detector_tpu.core.config_io import (
    apply_overrides,
    config_from_dict,
    config_to_dict,
    load_yaml,
    save_yaml,
)


def test_dict_roundtrip():
    cfg = FrontendConfig()
    data = config_to_dict(cfg)
    assert data["detector"]["min_feature_distance"] == 15
    assert data["nn"]["model_type"] == "SUPERPOINT_HEATMAP"
    back = config_from_dict(data)
    assert back == cfg


def test_yaml_roundtrip(tmp_path):
    cfg = FrontendConfig(
        detector=FrontendConfig().detector.replace(max_features=512),
        nn=FrontendConfig().nn.replace(model_type=NNModelType.DISK_NMS),
    )
    p = str(tmp_path / "cfg.yaml")
    save_yaml(p, cfg)
    back = load_yaml(p)
    assert back == cfg
    assert back.nn.model_type is NNModelType.DISK_NMS


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_dict({"detector": {"min_feature_distance": 10}, "bogus": {}})


def test_overrides():
    cfg = FrontendConfig()
    out = apply_overrides(
        cfg,
        {
            "detector.max_features": "512",
            "harris.alpha": "0.05",
            "matcher.cross_check": "false",
            "nn.model_type": "DISK_HEATMAP",
        },
    )
    assert out.detector.max_features == 512
    assert out.harris.alpha == pytest.approx(0.05)
    assert out.matcher.cross_check is False
    assert out.nn.model_type is NNModelType.DISK_HEATMAP


def test_override_unknown_path():
    with pytest.raises(KeyError):
        apply_overrides(FrontendConfig(), {"detector.nope": 1})
