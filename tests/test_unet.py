"""UNet architecture tests: parameter parity, shapes, attention placement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_diffusion_tpu.config import unet_config
from cv_diffusion_tpu.models import (create_efficient_unet, init_unet,
                                     count_params)
from cv_diffusion_tpu.models.blocks import sinusoidal_pos_emb


def _param_count(variant, image_size=256, in_channels=6):
    unet = create_efficient_unet(variant, image_size=image_size,
                                 in_channels=in_channels)
    x = jax.ShapeDtypeStruct((1, image_size, image_size, in_channels),
                             jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables = jax.eval_shape(unet.init, jax.random.key(0), x, t)
    return count_params(variables), variables


def test_param_parity_small():
    # Golden from the reference torch model with in_channels=6
    # (``src/models/efficient_unet.py:631-692``).
    n, _ = _param_count("small")
    assert n == 18_008_035


def test_param_parity_large():
    n, _ = _param_count("large")
    assert n == 86_809_155


def test_tiny_and_base_construct():
    # The reference's tiny/base variants crash (GroupNorm(32, 48)); ours must
    # construct and have sane sizes.
    n_tiny, _ = _param_count("tiny")
    n_base, _ = _param_count("base")
    assert n_tiny == 1_615_347
    assert n_base == 40_364_499


def test_unknown_variant_raises():
    with pytest.raises(ValueError):
        create_efficient_unet("huge")


def _attention_names(variables):
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    names = set()
    for path, _ in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        for k in keys:
            if "attn" in str(k):
                names.add(str(k))
    return names


def test_no_attention_at_256_except_mid():
    # Behavioral quirk kept from the reference: with attention_resolutions
    # (16, 8) and image_size=256, resolutions visited are {256,128,64,32} so
    # only mid_attn exists (``efficient_unet.py:447,509`` + SURVEY §2).
    _, variables = _param_count("small", image_size=256)
    assert _attention_names(variables) == {"mid_attn"}


def test_attention_at_128():
    _, variables = _param_count("tiny", image_size=128)
    names = _attention_names(variables)
    # encoder level 3 runs at 16×16 → enc attention; decoder level 0 at 16.
    assert "mid_attn" in names
    assert any(n.startswith("enc_attn_3") for n in names)
    assert any(n.startswith("dec_attn_0") for n in names)


def test_forward_shape_and_finite():
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6)
    variables = init_unet(unet, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 6))
    t = jnp.asarray([10, 900], dtype=jnp.int32)
    y = unet.apply(variables, x, t)
    assert y.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(y).all())


def test_time_conditioning_changes_output():
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6)
    variables = init_unet(unet, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 6))
    y1 = unet.apply(variables, x, jnp.asarray([10], dtype=jnp.int32))
    y2 = unet.apply(variables, x, jnp.asarray([900], dtype=jnp.int32))
    assert float(jnp.abs(y1 - y2).max()) > 1e-4


def test_split_skip_matches_concat():
    """split_skip is a pure graph rewrite: same params (init concatenates),
    same outputs as the concat decoder — the only differences are float
    reduction-order noise in the GN statistics."""
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6)
    variables = init_unet(unet, jax.random.key(0))
    unet_split = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                       split_skip=True)
    # identical param trees (split mode initializes through the concat path)
    shapes = jax.tree_util.tree_map(jnp.shape, variables)
    shapes_split = jax.tree_util.tree_map(
        jnp.shape, init_unet(unet_split, jax.random.key(0)))
    assert shapes == shapes_split

    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 6))
    t = jnp.asarray([10, 900], dtype=jnp.int32)
    y = unet.apply(variables, x, t)
    y_split = unet_split.apply(variables, x, t)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_split_skip_grads_match():
    """The rewrite must also be autodiff-equivalent (it may be enabled for
    training if it measures faster there)."""
    unet = create_efficient_unet("tiny", image_size=16, in_channels=6)
    variables = init_unet(unet, jax.random.key(0))
    unet_split = create_efficient_unet("tiny", image_size=16, in_channels=6,
                                       split_skip=True)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 6))
    t = jnp.asarray([50], dtype=jnp.int32)

    def loss(m):
        return lambda v: jnp.mean(m.apply(v, x, t) ** 2)

    g = jax.grad(loss(unet))(variables)
    g_split = jax.grad(loss(unet_split))(variables)
    flat = jax.tree_util.tree_leaves(g)
    flat_split = jax.tree_util.tree_leaves(g_split)
    for a, b in zip(flat, flat_split):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


def test_concat_group_norm_parts_matches_group_norm():
    """Unit identity: combined-partial-sum GN over a virtual concat equals
    group_norm over the real concat, including groups that straddle the
    boundary (192+128=320 ch → 32 groups of 10: the straddling case from
    the small variant's level-2 decoder)."""
    from cv_diffusion_tpu.ops.norms import (concat_group_norm_parts,
                                            gn_num_groups, group_norm)
    rng = np.random.default_rng(0)
    for cu, cs in ((192, 128), (8, 8), (24, 12)):
        u = jnp.asarray(rng.normal(size=(2, 6, 5, cu)), jnp.float32)
        s = jnp.asarray(rng.normal(size=(2, 6, 5, cs)), jnp.float32)
        c = cu + cs
        g = gn_num_groups(c)
        scale = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        ref = group_norm(jnp.concatenate([u, s], -1), scale, bias, g)
        u_hat, s_hat = concat_group_norm_parts(u, s, scale, bias, g)
        got = jnp.concatenate([u_hat, s_hat], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_bf16_forward():
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                 dtype="bfloat16")
    variables = init_unet(unet, jax.random.key(0))
    # params stay float32
    leaf = jax.tree_util.tree_leaves(variables)[0]
    assert leaf.dtype == jnp.float32
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 6))
    y = unet.apply(variables, x, jnp.asarray([5], dtype=jnp.int32))
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_sinusoidal_pos_emb_golden():
    # torch: freqs = exp(-log(10000)·arange(half)/half); [cos, sin] concat.
    t = jnp.asarray([0.0, 1.0, 999.0])
    emb = sinusoidal_pos_emb(t, 16)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(emb[0, :8]), np.ones(8), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), np.zeros(8), atol=1e-6)
    assert float(emb[1, 8]) == pytest.approx(np.sin(1.0), rel=1e-6)
    freq = np.exp(-np.log(10000.0) * 3 / 8)
    assert float(emb[2, 11]) == pytest.approx(np.sin(999.0 * freq), rel=1e-4)


def test_standard_attention_variant():
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                 use_linear_attention=False)
    variables = init_unet(unet, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 6))
    y = unet.apply(variables, x, jnp.asarray([5], dtype=jnp.int32))
    assert y.shape == (1, 32, 32, 3)


def test_fold_gn_matches_two_pass():
    """fold_gn (Gram-folded GN2⊕FiLM in the expand epilogue) must match the
    standard two-pass GroupNorm path through the whole UNet."""
    from cv_diffusion_tpu.models import create_efficient_unet, init_unet
    import numpy as np

    unet_ref = create_efficient_unet("tiny", image_size=32, in_channels=6)
    variables = init_unet(unet_ref, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 6))
    t = jnp.asarray([5, 250], dtype=jnp.int32)
    y_ref = unet_ref.apply(variables, x, t)

    unet_fold = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                      fold_gn=True)
    y = unet_fold.apply(variables, x, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("remat_kw", [
    {},                                            # classic: full, all
    {"remat_policy": "conv"},                      # save conv outputs
    {"remat_scope": "decoder"},                    # mid+decoder only
    {"remat_policy": "conv", "remat_scope": "decoder"},
])
def test_remat_forward_and_grad_match(remat_kw):
    """remat=True (jax.checkpoint per IRB/attention block) must be a pure
    memory/FLOPs trade: identical param tree, and forward/gradients equal
    to the non-remat model up to fusion-reorder rounding — for every
    (remat_policy, remat_scope) combination."""
    unet = create_efficient_unet("tiny", image_size=32, in_channels=6)
    unet_r = create_efficient_unet("tiny", image_size=32, in_channels=6,
                                   remat=True, **remat_kw)

    variables = init_unet(unet, jax.random.key(0))
    variables_r = init_unet(unet_r, jax.random.key(0))
    # nn.remat must not change the parameter tree (names, shapes, values).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, variables_r)

    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 6))
    t = jnp.asarray([5, 250], dtype=jnp.int32)
    y = unet.apply(variables, x, t, train=True)
    y_r = unet_r.apply(variables_r, x, t, train=True)
    # checkpoint boundaries change XLA's fusion order → f32 reassociation
    # noise (measured max |Δ| ≈ 5e-5 at tiny@32), not a semantic difference.
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y), atol=2e-4)

    def loss(params, model):
        out = model.apply(params, x, t, train=True)
        return jnp.mean(out ** 2)

    g = jax.jit(jax.grad(loss, argnums=0),
                static_argnums=1)(variables, unet)
    g_r = jax.jit(jax.grad(loss, argnums=0),
                  static_argnums=1)(variables_r, unet_r)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3),
        g, g_r)
