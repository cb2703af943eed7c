"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_make_mesh_1d_pure_dp():
    """TrainConfig.mesh_shape=(8,) (the documented pure-DP form) must build
    a 1-axis mesh — axis names derive from the shape's rank."""
    mesh = make_mesh((8,))
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == 8


def test_auto_mesh_uses_largest_divisor():
    """auto_mesh picks max d ≤ n_devices dividing the batch — not
    gcd(n, batch): batch 12 on 8 devices must use 6 chips, not 4."""
    from cv_diffusion_tpu.parallel.mesh import auto_mesh

    assert auto_mesh(12).shape["data"] == 6
    assert auto_mesh(6).shape["data"] == 6
    assert auto_mesh(64).shape["data"] == 8
    assert auto_mesh(1) is None


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


@pytest.mark.slow
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


@pytest.mark.slow
def test_spatial_sharded_train_step_with_pallas_attention(tiny_training):
    """use_pallas composes with a data×spatial mesh: pallas_call operands
    get gathered/replicated by SPMD where needed, and the sharded-Pallas
    loss matches the unsharded XLA-path step (cross-path check). Note this
    asserts correctness only — pallas_call is opaque to the partitioner, so
    the token axis is NOT sharded inside the kernel (see ops/attention.py)."""
    model_x, schedule, variables, tcfg = tiny_training
    cfg = diffusion_config("tiny", image_size=32, use_pallas=True)
    model_p, _ = create_model(cfg)
    batch = _host_batch()

    state1 = create_train_state(model_x, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step1 = make_train_step(model_x, schedule, tcfg, donate=False)
    _, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh((4, 2))
    state = create_train_state(model_p, tcfg, jax.random.key(0),
                               steps_per_epoch=10, variables=variables)
    step = make_train_step(model_p, schedule, tcfg, mesh=mesh, donate=False)
    state, m = step(state, shard_batch(mesh, batch))
    assert float(m["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    assert int(state.step) == 1


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


def test_pad_batch():
    from cv_diffusion_tpu.parallel import pad_batch

    batch = {"low_light": np.arange(5 * 4 * 4 * 3, dtype=np.float32)
             .reshape(5, 4, 4, 3)}
    padded, n_valid = pad_batch(batch, 8)
    assert n_valid == 5
    assert padded["low_light"].shape == (8, 4, 4, 3)
    # padding repeats the last real row
    np.testing.assert_array_equal(padded["low_light"][5],
                                  padded["low_light"][4])
    # already-aligned batches come back untouched
    same, n = pad_batch(batch, 5)
    assert n == 5 and same["low_light"].shape[0] == 5


def test_mesh_eval_step_ragged(tiny_training):
    """Ragged final eval batch: padded rows must not change the loss, and the
    mesh-sharded eval step must match the unsharded one."""
    from cv_diffusion_tpu.parallel import pad_batch
    from cv_diffusion_tpu.training import make_eval_step

    model, schedule, variables, tcfg = tiny_training
    batch = _host_batch(b=5)  # ragged: 5 does not divide the 8-way mesh
    padded, n_valid = pad_batch(batch, 8)
    assert padded["low_light"].shape[0] == 8 and n_valid == 5

    key = jax.random.key(7)
    eval1 = make_eval_step(model, schedule, tcfg)
    ref = float(eval1(variables["params"], key, padded, n_valid))

    mesh = make_mesh((8, 1))
    eval8 = make_eval_step(model, schedule, tcfg, mesh=mesh)
    got = float(eval8(variables["params"], key,
                      shard_batch(mesh, padded), n_valid))
    assert got == pytest.approx(ref, rel=1e-5)

    # masking: garbage in the padded rows must not leak into the loss
    garbage = {k: v.copy() for k, v in padded.items()}
    for v in garbage.values():
        v[n_valid:] = 97.0
    got_g = float(eval8(variables["params"], key,
                        shard_batch(mesh, garbage), n_valid))
    assert got_g == pytest.approx(got, rel=1e-5)


def test_make_hybrid_mesh_single_slice_and_errors():
    """Hybrid-mesh builder on the virtual 8-device host: an all-ones DCN
    grid degenerates to a plain ICI mesh; shape mismatches fail loudly at
    this layer (not deep inside mesh_utils)."""
    from cv_diffusion_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh((4, 2), (1, 1))
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    assert mesh.devices.size == 8

    with pytest.raises(ValueError, match="covers 4 devices"):
        make_hybrid_mesh((2, 1), (2, 1))
    with pytest.raises(ValueError, match="equal rank"):
        make_hybrid_mesh((2, 2, 2), (1, 1))

    # a sharded computation actually runs on the hybrid-built mesh
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)
    y = jax.jit(lambda a: a * 2, in_shardings=sh, out_shardings=sh)(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x) * 2)


def test_distributed_init_noop_single_process(monkeypatch):
    """Without coordinator env/args, distributed_init is a safe no-op."""
    from cv_diffusion_tpu.parallel import distributed_init

    monkeypatch.delenv("CVDM_COORDINATOR", raising=False)
    monkeypatch.delenv("CVDM_DISTRIBUTED", raising=False)
    assert distributed_init() is False
    assert len(jax.devices()) == 8  # runtime untouched


@pytest.mark.slow
def test_serving_scaling_1_to_8(tiny_training):
    """DP serving scaling shape on the virtual CPU mesh (1→8 devices):
    identical results at every mesh size, output sharded over data.

    Virtual CPU devices share one core, so this asserts correctness +
    sharding layout only — real img/s scaling is a chip-count property the
    sampler graph guarantees by having zero cross-chip collectives."""
    from cv_diffusion_tpu.parallel import make_sharded_sample_fn

    model, schedule, variables, _ = tiny_training
    low = np.random.default_rng(5).uniform(-1, 0, (16, 32, 32, 3)).astype(
        np.float32)
    key_data = jax.random.key_data(jax.random.key(3))

    outs = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        fn = make_sharded_sample_fn(model, schedule, num_inference_steps=2,
                                    mesh=mesh)
        out = fn(variables["params"], key_data, jnp.asarray(low))
        assert out.sharding.shard_shape(out.shape)[0] == 16 // n
        outs[n] = np.asarray(out)
    # XLA tiles the program differently per partitioning; tiny float diffs
    # amplify through the 2-step sampler of this untrained net → loose atol.
    for n in (2, 4, 8):
        np.testing.assert_allclose(outs[n], outs[1], atol=2e-3)


@pytest.mark.slow
def test_spatial_sharded_unet_forward_small128():
    """Spatial (halo-exchange) sharding correctness at depth: the FULL small
    UNet at 128² must produce the same output spatially sharded 8-way as
    unsharded (backs PARITY.md §5's halo-exchange claim beyond tiny@32)."""
    cfg = diffusion_config("small", image_size=128, dtype="float32")
    model, _ = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))

    rng = np.random.default_rng(11)
    noisy = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
    low = rng.uniform(-1, 0, (1, 128, 128, 3)).astype(np.float32)
    t = np.asarray([350], np.int32)

    def fwd(v, n, c, tt):
        return model.apply(v, n, c, tt, train=False)

    ref = jax.jit(fwd)(variables, noisy, low, t)

    mesh = make_mesh((1, 8))
    bsh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    sharded_fwd = jax.jit(fwd, in_shardings=(repl, bsh, bsh, repl),
                          out_shardings=bsh)
    got = sharded_fwd(jax.device_put(variables, repl),
                      jax.device_put(noisy, bsh),
                      jax.device_put(low, bsh),
                      jax.device_put(t, repl))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_spatial_sharded_unet_forward_small512():
    """SURVEY §7 hard part — 512² linear-attention memory: the FULL small
    UNet at 512² spatially sharded 8-way must match unsharded output.

    At 512² the deepest attention stage holds 4096 tokens; sharded 8-way
    each device sees a 512-token strip and the linear-attention global
    k·v/k-sum reductions cross shard boundaries (1 psum each on the
    token-sharded path), so this exercises the collective pattern at the
    resolution SURVEY names, not a scaled-down stand-in."""
    cfg = diffusion_config("small", image_size=512, dtype="float32")
    model, _ = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))

    rng = np.random.default_rng(17)
    noisy = rng.normal(size=(1, 512, 512, 3)).astype(np.float32)
    low = rng.uniform(-1, 0, (1, 512, 512, 3)).astype(np.float32)
    t = np.asarray([350], np.int32)

    def fwd(v, n, c, tt):
        return model.apply(v, n, c, tt, train=False)

    ref = jax.jit(fwd)(variables, noisy, low, t)

    mesh = make_mesh((1, 8))
    bsh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    sharded_fwd = jax.jit(fwd, in_shardings=(repl, bsh, bsh, repl),
                          out_shardings=bsh)
    got = sharded_fwd(jax.device_put(variables, repl),
                      jax.device_put(noisy, bsh),
                      jax.device_put(low, bsh),
                      jax.device_put(t, repl))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


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


def test_shard_batch_graceful_degradation():
    """Per-leaf sharding drops non-fitting axes innermost-first instead of
    raising: 1-D leaves shard over data only, spatially-indivisible leaves
    drop the spatial axis, batch-indivisible leaves replicate."""
    mesh = make_mesh((4, 2))
    batch = {
        "img": np.zeros((8, 32, 32, 3), np.float32),   # full (data, spatial)
        "odd_h": np.zeros((8, 33, 33, 3), np.float32),  # 33 % 2 → data only
        "t": np.zeros((8,), np.int32),                  # 1-D → data only
        "ragged": np.zeros((3, 4, 4, 3), np.float32),   # 3 % 4 → replicated
        "scalar": np.float32(1.0),                      # 0-D → replicated
    }
    out = shard_batch(mesh, batch)
    def spec(x):
        return tuple(x.sharding.spec)
    assert spec(out["img"]) == ("data", "spatial")
    assert spec(out["odd_h"]) == ("data",)
    assert spec(out["t"]) == ("data",)
    assert spec(out["ragged"]) == ()
    assert spec(out["scalar"]) == ()
    # values are untouched either way
    np.testing.assert_array_equal(np.asarray(out["img"]), batch["img"])


def test_pad_batch_rejects_mismatched_leaves():
    from cv_diffusion_tpu.parallel.mesh import pad_batch

    with pytest.raises(ValueError, match="axis 0"):
        pad_batch({"img": np.zeros((6, 4)), "step": np.int64(3)}, 8)
    with pytest.raises(ValueError, match="axis 0"):
        pad_batch({"a": np.zeros((6, 4)), "b": np.zeros((5, 4))}, 8)


def test_distributed_init_coordinator_requires_process_info(monkeypatch):
    from cv_diffusion_tpu.parallel.mesh import distributed_init

    monkeypatch.delenv("CVDM_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("CVDM_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="CVDM_NUM_PROCESSES"):
        distributed_init(coordinator_address="host:1234")


@pytest.mark.slow
def test_sharded_serving_fn_accepts_variables_dict():
    """int8_act packages carry {'params': ..., 'act_scales': ...}; the
    sharded sampler must accept the full variables dict exactly like the
    single-device sampler (it reuses make_sample_fn — regression for a
    re-implemented copy that dropped the handling)."""
    from cv_diffusion_tpu.export.quantization import act_quant_model
    from cv_diffusion_tpu.models.diffusion import init_model as _init
    from cv_diffusion_tpu.parallel import make_sharded_sample_fn

    cfg = diffusion_config("tiny", image_size=32, num_inference_steps=2)
    model, schedule = create_model(cfg)
    variables = _init(model, jax.random.key(0))
    qmodel, _ = act_quant_model(cfg)
    qvars = _init(qmodel, jax.random.key(0))
    qvars = {"params": variables["params"],
             "act_scales": qvars["act_scales"]}

    mesh = make_mesh((8, 1))
    fn = make_sharded_sample_fn(qmodel, schedule, num_inference_steps=2,
                                mesh=mesh)
    low = np.random.default_rng(3).uniform(-1, 0, (8, 32, 32, 3)).astype(
        np.float32)
    out = fn(qvars, jax.random.key_data(jax.random.key(0)),
             jnp.asarray(low))
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_grad_accum_remat_train_step_on_mesh():
    """grad_accum × remat × DP mesh compose: the sharded accumulated step
    reproduces the single-device accumulated step (same RNG contract)."""
    import dataclasses

    cfg = diffusion_config("tiny", image_size=32, remat=True)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    tcfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=8,
                       epochs=1, grad_accum_steps=2)
    batch = _host_batch()

    state1 = create_train_state(model, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step1 = make_train_step(model, schedule, tcfg, donate=False)
    state1, m1 = step1(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh((4, 2))
    state4 = create_train_state(model, tcfg, jax.random.key(0),
                                steps_per_epoch=10, variables=variables)
    step4 = make_train_step(model, schedule, tcfg, mesh=mesh, donate=False)
    state4, m4 = step4(state4, shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-4)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p4 = jax.tree_util.tree_leaves(state4.params)
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
