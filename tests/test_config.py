import pytest

from tpu_icp_slam.config import SlamConfig, config_hash, from_json, override, to_json


def test_json_roundtrip():
    cfg = SlamConfig()
    cfg2 = from_json(to_json(cfg))
    assert cfg == cfg2
    assert config_hash(cfg) == config_hash(cfg2)


def test_override_nested():
    cfg = override(SlamConfig(), {"icp.max_iters": 99, "mapping.grid_size": 128})
    assert cfg.icp.max_iters == 99
    assert cfg.mapping.grid_size == 128
    assert cfg.pipeline.scan_capacity == SlamConfig().pipeline.scan_capacity


def test_override_coerces_cli_strings():
    cfg = override(SlamConfig(), {"icp.max_corr_dist": "0.5", "backend.enabled": "true"})
    assert cfg.icp.max_corr_dist == 0.5
    assert cfg.backend.enabled is True


def test_override_unknown_key_raises():
    with pytest.raises(KeyError):
        override(SlamConfig(), {"icp.nope": 1})


def test_hash_changes_with_values():
    a = config_hash(SlamConfig())
    b = config_hash(override(SlamConfig(), {"icp.max_iters": 7}))
    assert a != b


def test_config_is_hashable_static_arg():
    hash(SlamConfig())  # jit static args require hashability
