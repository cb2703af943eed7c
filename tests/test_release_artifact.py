"""The committed release artifact must stay loadable.

The build environment is ephemeral (container resets delete ``runs/``), so
the deployed flagship weights are committed under ``artifacts/`` via
``scripts/export_release_weights.py``.  These tests pin the contract the
round-4 verdict demanded: the committed artifact loads through
``checkpoint.load_inference_params``, self-describes its architecture
(``model_config.json``) and prediction type, and has the exact flagship
parameter count.  (The reference persists checkpoints with ``torch.save``
— ``src/training/trainer.py:415-434`` — but ships no weights; here git IS
the persistence layer.)
"""

import os

import jax
import numpy as np
import pytest

from cv_diffusion_tpu.training import checkpoint as ckpt

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "vpred256_ema")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ARTIFACT),
    reason="committed release artifact missing (pre-export tree)")


def test_artifact_self_describes():
    assert ckpt.detect_variant(ARTIFACT) == "small"
    assert ckpt.load_prediction_type(ARTIFACT) == "v_prediction"
    cfg = ckpt.load_model_config(ARTIFACT)
    assert cfg["image_size"] == 256
    assert cfg["scheduler"]["prediction_type"] == "v_prediction"
    assert cfg["scheduler"]["rescale_betas_zero_snr"] is True


def test_artifact_loads_flagship_params():
    params = ckpt.load_inference_params(ARTIFACT)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    # param-exact with the reference small-variant UNet (PARITY.md row 9)
    assert n == 18_008_035
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves[:3])


STUDENT_1STEP = os.path.join(REPO, "artifacts", "vreg1b_gt03_ema")
STUDENT_2STEP = os.path.join(REPO, "artifacts", "vreg2b_gt03_ema")


@pytest.mark.parametrize("path,grid", [
    (STUDENT_1STEP, [739]),
    (STUDENT_2STEP, [739, 259]),
])
def test_student_artifacts_self_describe(path, grid):
    """The committed serving students carry their deployment grid and full
    architecture: inference/evaluate pick up everything with no flags."""
    if not os.path.isdir(path):
        pytest.skip("student artifact missing (pre-export tree)")
    import json
    assert ckpt.detect_variant(path) == "small"
    assert ckpt.load_prediction_type(path) == "v_prediction"
    with open(os.path.join(path, "student_timesteps.json")) as f:
        assert json.load(f)["timesteps"] == grid
    params = ckpt.load_inference_params(path)
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert n == 18_008_035
