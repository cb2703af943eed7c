"""Config system + CLI surface tests."""

import subprocess
import sys
from pathlib import Path

import pytest

from cv_diffusion_tpu.config import (ExperimentConfig, TrainConfig,
                                     UNetConfig, diffusion_config, from_dict,
                                     load_yaml, save_yaml, to_dict, to_json,
                                     from_json, unet_config)

REPO = Path(__file__).resolve().parent.parent


def test_unet_variants():
    for name, base in [("tiny", 16), ("small", 32), ("base", 48),
                       ("large", 64)]:
        cfg = unet_config(name)
        assert cfg.base_channels == base
    with pytest.raises(ValueError):
        unet_config("mega")


def test_unet_config_properties():
    cfg = unet_config("small", image_size=128)
    assert cfg.channels == (32, 64, 128, 256)
    assert cfg.resolutions() == (128, 64, 32, 16)


def test_diffusion_config_condition_channels():
    assert diffusion_config("tiny", condition_mode="concat").unet.in_channels == 6
    assert diffusion_config("tiny", condition_mode="add").unet.in_channels == 3


def test_config_roundtrip_dict():
    cfg = ExperimentConfig()
    d = to_dict(cfg)
    cfg2 = from_dict(ExperimentConfig, d)
    assert cfg == cfg2


def test_config_roundtrip_json():
    cfg = TrainConfig(epochs=7, loss_type="huber")
    cfg2 = from_json(TrainConfig, to_json(cfg))
    assert cfg2.epochs == 7
    assert cfg2.loss_type == "huber"


def test_config_yaml_roundtrip(tmp_path):
    cfg = ExperimentConfig(train=TrainConfig(epochs=3))
    path = str(tmp_path / "cfg.yaml")
    save_yaml(cfg, path)
    cfg2 = load_yaml(path)
    assert cfg2.train.epochs == 3
    assert cfg2 == cfg


def test_default_yaml_parses():
    """The shipped configs/default.yaml must load (the reference's never did)."""
    cfg = load_yaml(str(REPO / "configs" / "default.yaml"))
    assert cfg.model.unet.base_channels == 32
    assert cfg.model.scheduler.rescale_betas_zero_snr is True
    assert cfg.train.epochs == 100
    assert cfg.data.batch_size == 8
    # lists in YAML become tuples (hashable, jit-static-friendly)
    assert cfg.model.unet.channel_multipliers == (1, 2, 4, 8)


@pytest.mark.parametrize("script", ["train.py", "inference.py", "export.py",
                                    "benchmark.py", "distill.py",
                                    "evaluate.py", "profile.py",
                                    "parity_eval.py"])
def test_cli_help(script):
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), "--help"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()


def test_tpu_compiler_options_cpu_gated():
    """TPU compile options must be None on CPU (CPU XLA rejects TPU flags)
    and a str->str dict otherwise (XLA env-schema typed)."""
    from cv_diffusion_tpu.utils.compile_opts import (tpu_compiler_options,
                                                     TPU_COMPILER_OPTIONS)
    import jax
    assert jax.default_backend() == "cpu"  # conftest forces the CPU mesh
    assert tpu_compiler_options() is None
    assert all(isinstance(k, str) and isinstance(v, str)
               for k, v in TPU_COMPILER_OPTIONS.items())
