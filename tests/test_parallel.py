"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import PartitionSpec as P

from cv_diffusion_tpu.config import TrainConfig, diffusion_config
from cv_diffusion_tpu.models.diffusion import create_model, init_model, enhance
from cv_diffusion_tpu.parallel import (make_mesh, batch_sharding,
                                       replicated_sharding, shard_batch)
from cv_diffusion_tpu.training import create_train_state, make_train_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["spatial"] == 1
    mesh = make_mesh((4, 2))
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2
    with pytest.raises(ValueError):
        make_mesh((3, 2))


def test_shard_batch_places_data():
    mesh = make_mesh((4, 2))
    batch = {"low_light": np.zeros((8, 32, 32, 3), np.float32)}
    sharded = shard_batch(mesh, batch)
    shard_shape = sharded["low_light"].sharding.shard_shape((8, 32, 32, 3))
    assert shard_shape == (2, 16, 32, 3)  # B/4, H/2


@pytest.fixture(scope="module")
def tiny_training():
    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    tcfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=8,
                       epochs=1)
    return model, schedule, variables, tcfg


def _host_batch(b=8, s=32):
    rng = np.random.default_rng(0)
    return {
        "low_light": rng.normal(size=(b, s, s, 3)).astype(np.float32),
        "normal_light": rng.normal(size=(b, s, s, 3)).astype(np.float32),
    }


def test_dp_train_step_matches_single_device(tiny_training):
    """Data-parallel gradient all-reduce must reproduce single-device math."""
    model, schedule, variables, tcfg = tiny_training

    batch = _host_batch()

    # single device
    state1 = create_train_state(model, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step1 = make_train_step(model, schedule, tcfg, donate=False)
    state1, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    # 8-way DP
    mesh = make_mesh((8, 1))
    state8 = create_train_state(model, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step8 = make_train_step(model, schedule, tcfg, mesh=mesh, donate=False)
    state8, m8 = step8(state8, shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_spatial_sharded_train_step(tiny_training):
    """data×spatial mesh: XLA handles conv halo exchange; loss must match."""
    model, schedule, variables, tcfg = tiny_training
    batch = _host_batch()

    state1 = create_train_state(model, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step1 = make_train_step(model, schedule, tcfg, donate=False)
    _, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh((4, 2))
    state = create_train_state(model, tcfg, jax.random.key(0),
                               steps_per_epoch=10, variables=variables)
    step = make_train_step(model, schedule, tcfg, mesh=mesh, donate=False)
    state, m = step(state, shard_batch(mesh, batch))
    assert float(m["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)


def test_sharded_enhance(tiny_training):
    """Sampling under a DP mesh: batch sharded, params replicated."""
    model, schedule, variables, _ = tiny_training
    mesh = make_mesh((8, 1))
    bsh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    low = np.random.default_rng(1).uniform(-1, 0, (8, 32, 32, 3)).astype(
        np.float32)
    low_sharded = jax.device_put(low, bsh)
    variables_repl = jax.device_put(variables, repl)

    enh = jax.jit(lambda v, k, x: enhance(model, schedule, v, k, x,
                                          num_inference_steps=2),
                  in_shardings=(repl, None, bsh), out_shardings=bsh)
    out = enh(variables_repl, jax.random.key(0), low_sharded)
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_token_sharded_linear_attention():
    """Sharding the token axis + psum of kv/ksum == unsharded result."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cv_diffusion_tpu.ops.attention import (linear_attention_sharded,
                                                linear_attention_xla)

    mesh = make_mesh((1, 8))
    b, n, h, d = 2, 512, 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))

    ref = linear_attention_xla(q, k, v)
    spec = NamedSharding(mesh, P(None, "spatial"))
    qs = jax.device_put(q, spec)
    ks = jax.device_put(k, spec)
    vs = jax.device_put(v, spec)
    out = jax.jit(lambda a, b2, c: linear_attention_sharded(
        a, b2, c, mesh=mesh))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_serving_fn(tiny_training):
    """DP serving: params replicated, batch sharded, linear in chips."""
    from cv_diffusion_tpu.parallel import make_sharded_sample_fn

    model, schedule, variables, _ = tiny_training
    mesh = make_mesh((8, 1))
    fn = make_sharded_sample_fn(model, schedule, num_inference_steps=2,
                                mesh=mesh)
    low = np.random.default_rng(2).uniform(-1, 0, (16, 32, 32, 3)).astype(
        np.float32)
    key_data = jax.random.key_data(jax.random.key(0))
    out = fn(variables["params"], key_data, jnp.asarray(low))
    assert out.shape == (16, 32, 32, 3)
    assert out.dtype == jnp.float32
    # output actually sharded over the data axis
    assert out.sharding.shard_shape(out.shape)[0] == 2
