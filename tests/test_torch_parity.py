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


def test_state_dict_round_trip(parity_pair):
    """flax → torch export is the exact inverse of the torch → flax import.

    Every key of the reference ``state_dict`` must come back bit-exact and
    ``load_state_dict(strict=True)`` must accept the exported dict — this is
    the path by which TPU-trained weights flow back into the reference
    implementation (``src/models/efficient_unet.py``)."""
    from cv_diffusion_tpu.config import unet_config
    from cv_diffusion_tpu.utils.torch_compat import export_unet_state_dict

    tmodel, _, variables = parity_pair
    cfg = unet_config("small", image_size=64, in_channels=6)
    exported = export_unet_state_dict(variables["params"], cfg)

    original = {k: v.detach().cpu().numpy()
                for k, v in tmodel.state_dict().items()}
    assert set(exported) == set(original)
    for k in original:
        np.testing.assert_array_equal(exported[k], original[k], err_msg=k)

    # strict load into a fresh reference model must succeed
    ref = _load_reference_module()
    fresh = ref.create_efficient_unet("small", image_size=64, in_channels=6)
    fresh.load_state_dict({k: torch.tensor(v) for k, v in exported.items()},
                          strict=True)


def test_full_sampler_parity_with_injected_noise(parity_pair):
    """End-to-end 4-step LCM sampling parity against the reference.

    Both frameworks get the SAME weights (converted) and the SAME injected
    noise tensors (the torch side's randn/randn_like are monkeypatched —
    the reference ignores its ``generator`` anyway,
    ``lcm_scheduler.py:236-237``), so outputs must match to float32
    accumulation error across 4 full UNet evaluations + renoise steps.
    """
    import importlib.util
    import sys
    import types

    import jax
    import jax.numpy as jnp

    from cv_diffusion_tpu.config import SchedulerConfig
    from cv_diffusion_tpu.models import scheduler as sched

    tmodel, jmodel, variables = parity_pair

    # --- load the reference scheduler with a stubbed diffusers ------------
    if "diffusers" not in sys.modules:
        d = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class SchedulerMixin:  # noqa: D401 - stub
            pass

        class ConfigMixin:
            pass

        def register_to_config(f):
            import inspect

            def wrapper(self, *a, **k):
                sig = inspect.signature(f)
                bound = sig.bind(self, *a, **k)
                bound.apply_defaults()
                cfg = types.SimpleNamespace(
                    **{n: v for n, v in list(bound.arguments.items())[1:]})
                self.config = cfg
                return f(self, *a, **k)

            return wrapper

        d.SchedulerMixin = SchedulerMixin
        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        sys.modules["diffusers"] = d
        sys.modules["diffusers.configuration_utils"] = cu

    spec = importlib.util.spec_from_file_location(
        "ref_lcm", "/root/reference/src/models/lcm_scheduler.py")
    ref_lcm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_lcm)

    # --- fixed noise shared by both sides ---------------------------------
    rng = np.random.default_rng(42)
    steps = 4
    init_noise = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    step_noise = rng.normal(size=(steps, 1, 3, 64, 64)).astype(np.float32)
    low = rng.uniform(-1, 0, size=(1, 3, 64, 64)).astype(np.float32)

    # --- torch reference sampling loop (enhance(), randn monkeypatched) ---
    scheduler = ref_lcm.LCMScheduler(rescale_betas_zero_snr=True)
    scheduler.set_timesteps(steps)
    noise_iter = iter(list(step_noise))

    real_randn_like = torch.randn_like
    torch.randn_like = lambda t, **k: torch.tensor(next(noise_iter))
    try:
        latents = torch.tensor(init_noise)
        low_t = torch.tensor(low)
        with torch.no_grad():
            for t in scheduler.timesteps.tolist():
                model_input = torch.cat([latents, low_t], dim=1)
                t_vec = torch.full((1,), t, dtype=torch.long)
                eps = tmodel(model_input, t_vec)
                out = scheduler.step(eps, t, latents)
                latents = out.prev_sample
        ref_out = latents.clamp(-1, 1).numpy()
    finally:
        torch.randn_like = real_randn_like

    # --- our scanned sampler with the same injected noise ------------------
    from cv_diffusion_tpu.models.diffusion import LowLightDiffusion, enhance
    from cv_diffusion_tpu.config import diffusion_config

    cfg = diffusion_config("small", image_size=64)
    model = LowLightDiffusion(cfg)
    schedule = sched.make_schedule(SchedulerConfig(rescale_betas_zero_snr=True))

    to_nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    ours = enhance(
        model, schedule, {"params": {"unet": variables["params"]}},
        jax.random.key(0), to_nhwc(low), num_inference_steps=steps,
        init_noise=to_nhwc(init_noise),
        step_noise=jnp.stack([to_nhwc(n) for n in step_noise]))
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    # torch renoise pops step noise only for non-final steps; final step
    # returns x0 — our step() consumes the same ordering, unused final noise.
    np.testing.assert_allclose(ours_nchw, ref_out, atol=5e-3)
    rel = np.abs(ours_nchw - ref_out).max()
    assert rel < 5e-3


def test_condition_encoder_parity():
    """Add-mode migration: the reference's condition_encoder (nn.Sequential
    conv/SiLU/conv, ``low_light_diffusion.py:108-113``) converted via
    ``convert_condition_encoder_state_dict`` must match the flax
    ``ConditionEncoder`` forward — this is the extra piece (beyond the UNet)
    an add-mode checkpoint needs to migrate (examples/migrate_from_torch.py).
    """
    import importlib.util
    import sys
    import types

    import jax
    import jax.numpy as jnp

    # stub diffusers (pulled in via the reference's lcm_scheduler import)
    if "diffusers" not in sys.modules:
        d = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class SchedulerMixin:
            pass

        class ConfigMixin:
            pass

        def register_to_config(f):
            return f

        d.SchedulerMixin = SchedulerMixin
        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        sys.modules["diffusers"] = d
        sys.modules["diffusers.configuration_utils"] = cu

    sys.path.insert(0, "/root/reference/src")
    try:
        from models.low_light_diffusion import LowLightDiffusion as RefLLD
    finally:
        sys.path.remove("/root/reference/src")

    from cv_diffusion_tpu.models.diffusion import ConditionEncoder
    from cv_diffusion_tpu.utils.torch_compat import (
        convert_condition_encoder_state_dict)

    torch.manual_seed(3)
    ref = RefLLD(unet_variant="small", image_size=64, condition_mode="add")
    ref.eval()

    params = convert_condition_encoder_state_dict(ref.state_dict())
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        t_out = ref.condition_encoder(
            torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    j_out = ConditionEncoder().apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

    # concat-mode state_dicts (no condition_encoder) must be rejected
    with pytest.raises(ValueError, match="condition_encoder"):
        convert_condition_encoder_state_dict(
            {"unet.init_conv.weight": np.zeros((1,))})
