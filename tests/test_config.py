"""Config system tests: yaml round-trip, env fallback, validation, forward
compatibility (reference semantics: src/config.py:75-132)."""
import os

import pytest

from pl_convlstm_gan_tpu.config import Config, load_config


def test_roundtrip(tmp_path):
    cfg = Config.from_dict({"model": {"hidden_dims": [8, 16], "T": 7},
                            "training": {"batch_size": 4}})
    path = str(tmp_path / "sub" / "cfg.yaml")
    cfg.to_yaml(path)
    cfg2 = Config.from_yaml(path)
    assert cfg2.model.hidden_dims == [8, 16]
    assert cfg2.model.T == 7
    assert cfg2.training.batch_size == 4
    # defaults survive
    assert cfg2.training.lambda_smooth == 0.1


def test_unknown_keys_ignored(tmp_path):
    """Configs written by future versions must still load."""
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  T: 3\n  some_future_key: 42\n")
    cfg = Config.from_yaml(str(p))
    assert cfg.model.T == 3


def test_validation_errors():
    cfg = Config.from_dict({})
    cfg.training.learning_rate = -1
    with pytest.raises(ValueError, match="Learning rate"):
        cfg.validate()
    cfg = Config.from_dict({})
    cfg.model.T = 0
    with pytest.raises(ValueError, match="Time window"):
        cfg.validate()
    cfg = Config.from_dict({})
    cfg.model.family = "bogus"
    with pytest.raises(ValueError, match="family"):
        cfg.validate()


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        Config.from_yaml("/nonexistent/x.yaml")


def test_load_all_shipped_configs():
    """Every shipped config must parse and validate."""
    for name in ("default", "mnist_64", "gan_64", "nowcast_128",
                 "nowcast_128_pallas", "precip_256", "dp_v5e16"):
        cfg = load_config(name)
        cfg.validate()


def test_env_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("CONFIG_NAME", "gan_64")
    cfg = load_config("definitely_not_a_config")
    assert cfg.model.family == "gan"


def test_load_config_direct_path(tmp_path):
    """A --config value ending in .yaml is loaded as a file path (the route
    for installed deployments without the repo's configs/ dir)."""
    from pl_convlstm_gan_tpu.config import Config, load_config
    p = tmp_path / "my.yaml"
    cfg = Config()
    cfg.model.family = "forecaster"
    cfg.to_yaml(str(p))
    loaded = load_config(str(p))
    assert loaded.model.family == "forecaster"
    import pytest
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "missing.yaml"))


def test_console_entry_point_target():
    """pyproject's console script points at a real callable."""
    from pl_convlstm_gan_tpu.cli import main
    assert callable(main)


def test_remat_policy_validation():
    """validate() rejects unknown remat_policy values and the save_z+pallas
    combination (which would silently degrade to full recompute)."""
    import pytest
    from pl_convlstm_gan_tpu.config import Config
    cfg = Config()
    cfg.model.remat = True
    cfg.model.remat_policy = "save_z_typo"
    with pytest.raises(ValueError, match="remat_policy"):
        cfg.validate()
    cfg.model.remat_policy = "save_z"
    cfg.model.convlstm_impl = "pallas"
    with pytest.raises(ValueError, match="pallas"):
        cfg.validate()
    cfg.model.convlstm_impl = "xla"
    cfg.validate()


def test_tool_entry_point_targets():
    """Every console script in pyproject points at an importable callable."""
    import importlib
    import tomllib
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) >= 6
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), target
