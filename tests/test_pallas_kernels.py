"""Pallas kernel parity tests (interpreter mode on CPU).

The same kernels are exercised compiled-on-TPU by bench/serving runs; here
interpret mode checks the math against the XLA reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import cv_diffusion_tpu.ops.pallas_attention as pa
from cv_diffusion_tpu.ops.attention import linear_attention_xla


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pa.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("shape", [(2, 256, 4, 32), (1, 1000, 4, 32),
                                   (2, 64, 2, 32), (1, 128, 1, 128),
                                   # > 128 lanes: head-group grid axis
                                   # (6×32 → 2 groups of 96; 8×32 → 2×128)
                                   (1, 128, 6, 32), (1, 192, 8, 32)])
def test_linear_attention_pallas_matches_xla(shape):
    b, n, h, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref = linear_attention_xla(q, k, v)
    out = pa.linear_attention_pallas(q, k, v, tile_n=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_linear_attention_pallas_bf16():
    rng = np.random.default_rng(1)
    shape = (1, 256, 4, 32)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = linear_attention_xla(q, k, v)
    out = pa.linear_attention_pallas(q, k, v, tile_n=256)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32), atol=2e-2)


@pytest.mark.parametrize("shape", [(2, 256, 4, 32), (1, 100, 2, 32),
                                   (1, 128, 6, 32)])
def test_linear_attention_pallas_grad_matches_xla(shape):
    """custom-VJP backward (analytic XLA) == autodiff of the XLA path."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(pa.linear_attention_pallas_trainable(q, k, v) * ct)

    def loss_xla(q, k, v):
        return jnp.sum(linear_attention_xla(q, k, v) * ct)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gp, gx, name in zip(g_pallas, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=5e-4, err_msg=f"d{name}")


@pytest.mark.slow
def test_unet_train_grads_flow_through_pallas_attention():
    """use_pallas no longer gates to XLA in train mode: grads are finite and
    close to the XLA-path grads through the full tiny UNet."""
    from cv_diffusion_tpu.models import create_efficient_unet, init_unet

    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 6))
    t = jnp.asarray([5], dtype=jnp.int32)

    grads = {}
    for use_pallas in (True, False):
        unet = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                     use_pallas=use_pallas)
        variables = init_unet(unet, jax.random.key(0))

        def loss(params):
            y = unet.apply({"params": params}, x, t, train=True,
                           rngs={"dropout": jax.random.key(2)})
            return jnp.mean(y ** 2)

        grads[use_pallas] = jax.grad(loss)(variables["params"])

    flat_p = jax.tree_util.tree_leaves(grads[True])
    flat_x = jax.tree_util.tree_leaves(grads[False])
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat_p)
    for gp, gx in zip(flat_p, flat_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=5e-4)


def test_head_dim_over_lanes_raises():
    x = jnp.zeros((1, 8, 2, 256))
    with pytest.raises(ValueError):
        pa.linear_attention_pallas(x, x, x)  # head_dim 256 > 128 lanes


def test_unet_with_use_pallas_flag():
    """The use_pallas config flag routes attention through the kernel."""
    from cv_diffusion_tpu.models import create_efficient_unet, init_unet

    unet = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                 use_pallas=True)
    variables = init_unet(unet, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 6))
    y = unet.apply(variables, x, jnp.asarray([5], dtype=jnp.int32))
    assert y.shape == (1, 32, 32, 3)

    unet_ref = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                     use_pallas=False)
    y_ref = unet_ref.apply(variables, x, jnp.asarray([5], dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


class TestFusedIRB:
    """fused_irb kernel vs the flax InvertedResidualBlock (interpret mode)."""

    def _setup(self, cin=32, cout=32, exp=4, size=32, batch=2, use_se=True,
               quant=True):
        import cv_diffusion_tpu.ops.pallas_irb as pirb
        from cv_diffusion_tpu.models.blocks import InvertedResidualBlock

        block = InvertedResidualBlock(out_channels=cout, expansion_ratio=exp,
                                      use_se=use_se,
                                      quantization_friendly=quant)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(batch, size, size, cin))
                        .astype(np.float32))
        temb = jnp.asarray(rng.normal(size=(batch, 64)).astype(np.float32))
        variables = block.init(jax.random.key(0), x, temb)
        ref = block.apply(variables, x, temb)

        p = variables["params"]
        hidden = cin * exp
        tk = p["time_mlp"]["kernel"]
        tb = p["time_mlp"]["bias"]
        film = jax.nn.silu(temb) @ tk + tb
        fs, fb = film[:, :hidden], film[:, hidden:]
        args = pirb.irb_params_from_flax(p)
        return pirb, x, fs, fb, args, ref, quant

    def _run(self, pirb, x, fs, fb, args, quant, **kw):
        return pirb.fused_irb(x, film_scale=fs, film_shift=fb,
                              silu=not quant, **args, **kw)

    def test_identity_residual(self, monkeypatch):
        import cv_diffusion_tpu.ops.pallas_irb as pirb_mod
        self._patch(monkeypatch, pirb_mod)
        pirb, x, fs, fb, args, ref, quant = self._setup()
        out = self._run(pirb, x, fs, fb, args, quant, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_channel_change_skip(self, monkeypatch):
        import cv_diffusion_tpu.ops.pallas_irb as pirb_mod
        self._patch(monkeypatch, pirb_mod)
        pirb, x, fs, fb, args, ref, quant = self._setup(cin=32, cout=64)
        assert "wskip" in args
        out = self._run(pirb, x, fs, fb, args, quant, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_no_se_silu(self, monkeypatch):
        import cv_diffusion_tpu.ops.pallas_irb as pirb_mod
        self._patch(monkeypatch, pirb_mod)
        pirb, x, fs, fb, args, ref, quant = self._setup(use_se=False,
                                                        quant=False)
        out = self._run(pirb, x, fs, fb, args, quant, use_se=False, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def test_uneven_group_counts(self, monkeypatch):
        # cin=48 → gn groups 16 (the reference-crash case)
        import cv_diffusion_tpu.ops.pallas_irb as pirb_mod
        self._patch(monkeypatch, pirb_mod)
        pirb, x, fs, fb, args, ref, quant = self._setup(cin=48, cout=48,
                                                        exp=2, size=16)
        out = self._run(pirb, x, fs, fb, args, quant, tile_h=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)

    def _patch(self, monkeypatch, pirb_mod):
        orig = pl.pallas_call

        def patched(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(pirb_mod.pl, "pallas_call", patched)


def test_flash_attention_matches_standard():
    """Stock Pallas flash attention (interpret-capable on CPU via fallback
    check) vs plain softmax attention."""
    from cv_diffusion_tpu.ops.attention import (standard_attention,
                                                standard_attention_flash)
    rng = np.random.default_rng(0)
    # small N falls back to the plain path — equality is trivial there;
    # checks the adapter plumbing.
    shape = (1, 64, 4, 32)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref = standard_attention(q, k, v, scale=32 ** -0.5)
    out = standard_attention_flash(q, k, v, scale=32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestFusedIRBv2(TestFusedIRB):
    """Phase-merged v2 kernel vs the flax block (interpret mode).

    Inherits the v1 cases; only the kernel entry point changes (v2 exposes
    its own ``interpret`` flag, no monkeypatching needed — the _patch hook
    is kept as a no-op for the inherited tests)."""

    def _run(self, pirb, x, fs, fb, args, quant, **kw):
        kw.pop("tile_h", None)
        return pirb.fused_irb_v2(x, film_scale=fs, film_shift=fb,
                                 silu=not quant, interpret=True,
                                 tile_h=8, **args, **kw)

    def _patch(self, monkeypatch, pirb_mod):
        pass

    def test_bf16(self):
        pirb, x, fs, fb, args, ref, quant = self._setup()
        xb = x.astype(jnp.bfloat16)
        out = self._run(pirb, xb, fs, fb, args, quant)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), atol=5e-2)

    def test_uneven_tile(self):
        # height 24 with tile_h 8 → 3 tiles; also exercises odd W edge sums
        pirb, x, fs, fb, args, ref, quant = self._setup(size=24)
        out = self._run(pirb, x, fs, fb, args, quant)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4)


@pytest.mark.slow
def test_unet_with_use_pallas_irb_flag():
    """use_pallas_irb routes every stride-1 IRB through fused_irb_v2 at
    inference; outputs must match the XLA path on the same params."""
    from cv_diffusion_tpu.models import create_efficient_unet, init_unet

    unet = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                 use_pallas_irb=True)
    variables = init_unet(unet, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 6))
    t = jnp.asarray([5, 700], dtype=jnp.int32)
    y = unet.apply(variables, x, t)

    unet_ref = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                     use_pallas_irb=False)
    y_ref = unet_ref.apply(variables, x, t)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-4)
