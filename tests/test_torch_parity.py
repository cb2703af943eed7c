"""Cross-framework numerical parity: reference torch UNet vs this framework.

Loads the actual reference implementation (read-only), transfers its random
init weights through ``utils.torch_compat.convert_unet_state_dict``, and
asserts the NHWC flax forward matches the NCHW torch forward — block-for-block
architecture equivalence, not just shapes.

Skipped when torch or the reference tree is unavailable.
"""

import importlib.util
import os

import numpy as np
import pytest

REFERENCE = "/root/reference/src/models/efficient_unet.py"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.exists(REFERENCE),
                                reason="reference tree not mounted")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_eu", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def parity_pair():
    """Reference torch model + converted flax params (small @ 64px, 6ch).

    64px puts levels at {64, 32, 16, 8} so encoder/decoder attention blocks
    are exercised, not just mid_attn.
    """
    import jax
    import jax.numpy as jnp
    from cv_diffusion_tpu.config import unet_config
    from cv_diffusion_tpu.models import EfficientUNet
    from cv_diffusion_tpu.utils.torch_compat import convert_unet_state_dict

    ref = _load_reference_module()
    torch.manual_seed(0)
    tmodel = ref.create_efficient_unet("small", image_size=64, in_channels=6)
    tmodel.eval()

    cfg = unet_config("small", image_size=64, in_channels=6)
    params = convert_unet_state_dict(tmodel.state_dict(), cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jmodel = EfficientUNet(cfg)
    return tmodel, jmodel, {"params": params}


def test_forward_parity(parity_pair):
    import jax.numpy as jnp

    tmodel, jmodel, variables = parity_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 64, 64)).astype(np.float32)
    t = np.array([17, 839], dtype=np.int64)

    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(t)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = jmodel.apply(variables, x_nhwc, jnp.asarray(t, dtype=jnp.int32))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))

    # Same math modulo op-order float error accumulated over ~60 layers.
    np.testing.assert_allclose(out_nchw, ref, atol=2e-3, rtol=1e-3)
    # and the error is tiny relative to the signal
    rel = np.abs(out_nchw - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 1e-3


def test_param_tree_is_complete(parity_pair):
    """Every torch parameter must land somewhere in the flax tree."""
    import jax

    tmodel, _, variables = parity_pair
    n_torch = sum(p.numel() for p in tmodel.parameters())
    n_flax = sum(p.size for p in jax.tree_util.tree_leaves(variables))
    assert n_torch == n_flax
