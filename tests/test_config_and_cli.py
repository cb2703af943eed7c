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


def _train_cli():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "train_cli", REPO / "scripts" / "train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_cli_overrides_yaml_only_when_passed(tmp_path):
    """--config loads the YAML; only flags explicitly on the command line
    override it (the --config help text's contract). Flags at their argparse
    defaults must NOT clobber YAML values."""
    from cv_diffusion_tpu.config import DataConfig, ExperimentConfig

    mod = _train_cli()
    cfg_path = str(tmp_path / "exp.yaml")
    save_yaml(ExperimentConfig(
        train=TrainConfig(unet_variant="tiny", epochs=7, learning_rate=3e-4,
                          use_ema=True, image_size=64),
        data=DataConfig(train_root="yaml_train", val_root="yaml_val",
                        use_synthetic=True)), cfg_path)

    # epochs passed explicitly (both syntaxes); everything else from YAML.
    for argv in (["--config", cfg_path, "--epochs", "3"],
                 ["--config", cfg_path, "--epochs=3"]):
        args = mod.build_parser().parse_args(argv)
        config, data_dir, val_dir, use_synth = mod.resolve_config(args, argv)
        assert config.epochs == 3                      # CLI wins
        assert config.unet_variant == "tiny"           # YAML kept
        assert config.learning_rate == 3e-4            # not reset to 1e-4
        assert config.image_size == 64                 # not reset to 256
        assert (data_dir, val_dir, use_synth) == ("yaml_train", "yaml_val",
                                                  True)

    # Disable-switch flags invert into their config sense.
    argv = ["--config", cfg_path, "--no_ema", "--no_amp"]
    args = mod.build_parser().parse_args(argv)
    config, *_ = mod.resolve_config(args, argv)
    assert config.use_ema is False
    assert config.use_amp is False

    # Data-path flags override only when passed; "none" disables validation.
    argv = ["--config", cfg_path, "--data_dir", "cli_train",
            "--val_dir", "none"]
    args = mod.build_parser().parse_args(argv)
    _, data_dir, val_dir, use_synth = mod.resolve_config(args, argv)
    assert data_dir == "cli_train"
    assert val_dir is None
    assert use_synth is True  # untouched


def test_train_cli_no_config_uses_flags():
    mod = _train_cli()
    argv = ["--variant", "tiny", "--epochs", "2", "--no_warmup",
            "--val_dir", ""]
    args = mod.build_parser().parse_args(argv)
    config, data_dir, val_dir, use_synth = mod.resolve_config(args, argv)
    assert config.unet_variant == "tiny"
    assert config.epochs == 2
    assert config.faithful_no_warmup is True
    assert config.use_amp is True and config.use_ema is True
    assert data_dir == "data/our485"  # argparse default
    assert val_dir is None
    assert use_synth is False
    assert config.use_pallas is False


def test_compilation_cache_opt_in(tmp_path, monkeypatch):
    """CVDM_COMPILE_CACHE=<dir> enables the persistent XLA cache; unset is
    a no-op. (Threshold dropped to 0 here so a toy jit populates it.)"""
    import jax
    import jax.numpy as jnp

    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)

    monkeypatch.delenv("CVDM_COMPILE_CACHE", raising=False)
    assert maybe_enable_compilation_cache() is False

    cache_dir = tmp_path / "xla_cache"
    monkeypatch.setenv("CVDM_COMPILE_CACHE", str(cache_dir))
    assert maybe_enable_compilation_cache() is True
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.jit(lambda x: x * 3 + 1)(jnp.ones((8, 8))).block_until_ready()
        assert cache_dir.is_dir() and any(cache_dir.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_train_cli_use_pallas_flag():
    """--use_pallas reaches TrainConfig and the built model config."""
    from cv_diffusion_tpu.config import diffusion_config

    mod = _train_cli()
    argv = ["--use_pallas", "--variant", "tiny"]
    args = mod.build_parser().parse_args(argv)
    config, *_ = mod.resolve_config(args, argv)
    assert config.use_pallas is True
    model_cfg = diffusion_config(config.unet_variant, config.image_size,
                                 use_pallas=config.use_pallas)
    assert model_cfg.unet.use_pallas is True


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


def test_train_cli_remat_flag():
    """--remat reaches TrainConfig and the built model config."""
    from cv_diffusion_tpu.config import diffusion_config

    mod = _train_cli()
    argv = ["--remat", "--variant", "tiny"]
    args = mod.build_parser().parse_args(argv)
    config, *_ = mod.resolve_config(args, argv)
    assert config.remat is True
    model_cfg = diffusion_config(config.unet_variant, config.image_size,
                                 remat=config.remat)
    assert model_cfg.unet.remat is True
