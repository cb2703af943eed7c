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
                                   (2, 64, 2, 32), (1, 128, 1, 128)])
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


def test_head_dim_over_lanes_raises():
    x = jnp.zeros((1, 8, 8, 32))
    with pytest.raises(ValueError):
        pa.linear_attention_pallas(x, x, x)  # 8 heads × 32 = 256 > 128


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
