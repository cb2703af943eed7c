"""Real multi-process `jax.distributed` run (SURVEY §5 distributed backend).

The reference is strictly single-process (``src/training/trainer.py:142``);
this framework's multi-host entry point is ``parallel.distributed_init``.
Every other test exercises sharding on a single-process virtual mesh — this
one actually starts TWO OS processes with a localhost coordinator, builds a
global 4-device mesh spanning both, shards the data per process
(``shard_files_by_process``), runs ONE jitted sharded train step whose
gradient all-reduce crosses the process boundary (gloo CPU collectives),
and asserts the loss is identical to a single-process run over the same
global batch.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

# Two real OS processes + a jax.distributed coordinator: ~7 min wall. The
# quick tier keeps cross-process coverage via test_parallel's in-process
# sharding tests; this file is the deep (true multi-process) variant.
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

# Executed in each spawned process. Env (set by the harness, NOT conftest):
# JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=2
# => 2 local devices/process, 4 global.
WORKER = r"""
import sys
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")

from cv_diffusion_tpu.parallel import distributed_init, make_mesh

assert distributed_init(f"localhost:{port}", num_processes=2,
                        process_id=pid) is True
assert distributed_init() is True  # idempotent after init
assert jax.process_count() == 2
assert jax.device_count() == 2 * jax.local_device_count() == 4
# process 0's devices precede process 1's in jax.devices() — the global
# batch row order below depends on it
procs = [d.process_index for d in jax.devices()]
assert procs == sorted(procs), procs

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cv_diffusion_tpu.config import TrainConfig, diffusion_config
from cv_diffusion_tpu.data.dataset import shard_files_by_process
from cv_diffusion_tpu.models.diffusion import create_model
from cv_diffusion_tpu.training.train_state import (create_train_state,
                                                   make_train_step)

# --- per-process data sharding: each process "loads" only its file shard ---
files = list(range(8))
mine = shard_files_by_process(files, pid, 2)
other = shard_files_by_process(files, 1 - pid, 2)
assert len(mine) == 4 and sorted(mine + other) == files

rng = np.random.default_rng(0)
all_low = rng.uniform(-1, 0, (8, 32, 32, 3)).astype(np.float32)
all_high = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
# global batch row order: process 0's shard rows then process 1's
order = (shard_files_by_process(files, 0, 2)
         + shard_files_by_process(files, 1, 2))

# the true multi-granule DCN path of make_hybrid_mesh: 2 process granules
# (DCN) x 2 local devices (ICI) -> data axis spans processes, spatial axis
# stays within a process
from cv_diffusion_tpu.parallel import make_hybrid_mesh

hybrid = make_hybrid_mesh((1, 2), (2, 1))
assert dict(hybrid.shape) == {"data": 2, "spatial": 2}
for row in hybrid.devices:  # each data-row = one process (DCN granule)
    assert len({d.process_index for d in row}) == 1

mesh = make_mesh((4, 1))
data_sh = NamedSharding(mesh, P("data"))
repl_sh = NamedSharding(mesh, P())


def put_global(x, sh, local_rows=None):
    # make_array_from_callback materializes only addressable shards: this
    # process touches exactly the rows its own data shard provides.
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


batch = {"low_light": put_global(all_low[order], data_sh),
         "normal_light": put_global(all_high[order], data_sh)}
# sanity: this process's addressable rows came from ITS file shard
local_rows = batch["low_light"].addressable_shards
assert all(s.data.shape[0] == 2 for s in local_rows)

cfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=8,
                  use_ema=False, use_amp=False)
model, schedule = create_model(
    diffusion_config("tiny", image_size=32, dtype="float32"))
state = create_train_state(model, cfg, jax.random.key(0))


def reshard(x, sh):
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                     jax.dtypes.prng_key):
        kd = np.asarray(jax.random.key_data(x))
        return jax.random.wrap_key_data(put_global(kd, sh))
    return put_global(np.asarray(x), sh)


state = jax.tree_util.tree_map(lambda x: reshard(x, repl_sh), state)
step = make_train_step(model, schedule, cfg, mesh=mesh, donate=False)
new_state, metrics = step(state, batch)
assert int(np.asarray(new_state.step)) == 1
print(f"RESULT {pid} {float(metrics['loss'])!r} "
      f"{float(metrics['grad_norm'])!r}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO)
    port = _free_port()

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args} failed:\n{out}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, pid, loss, gnorm = line.split()
        results[int(pid)] = (float(loss), float(gnorm))
    assert set(results) == {0, 1}
    # the replicated metrics must agree bit-for-bit across processes
    assert results[0] == results[1]
    loss2p, gnorm2p = results[0]
    assert np.isfinite(loss2p) and np.isfinite(gnorm2p)

    # single-process reference over the SAME global batch / same init seed
    import jax

    from cv_diffusion_tpu.config import TrainConfig, diffusion_config
    from cv_diffusion_tpu.data.dataset import shard_files_by_process
    from cv_diffusion_tpu.models.diffusion import create_model
    from cv_diffusion_tpu.training.train_state import (create_train_state,
                                                       make_train_step)

    files = list(range(8))
    order = (shard_files_by_process(files, 0, 2)
             + shard_files_by_process(files, 1, 2))
    rng = np.random.default_rng(0)
    all_low = rng.uniform(-1, 0, (8, 32, 32, 3)).astype(np.float32)
    all_high = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
    batch = {"low_light": all_low[order], "normal_light": all_high[order]}

    cfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=8,
                      use_ema=False, use_amp=False)
    model, schedule = create_model(
        diffusion_config("tiny", image_size=32, dtype="float32"))
    state = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, schedule, cfg, mesh=None, donate=False)
    _, metrics = step(state, batch)
    loss1p = float(metrics["loss"])

    # same math, different partitioning → tiny f32 reassociation noise only
    assert loss2p == pytest.approx(loss1p, rel=1e-5)


def test_shard_files_by_process_properties():
    files = [f"img_{i}.png" for i in range(10)]
    shards = [None, None, None]
    for p in range(3):
        shards[p] = __import__(
            "cv_diffusion_tpu.data.dataset",
            fromlist=["shard_files_by_process"]).shard_files_by_process(
                files, p, 3)
    # equal lengths (lockstep step counts) and no overlap
    assert all(len(s) == 3 for s in shards)
    flat = [f for s in shards for f in s]
    assert len(set(flat)) == 9
    with pytest.raises(ValueError, match="outside"):
        from cv_diffusion_tpu.data.dataset import shard_files_by_process
        shard_files_by_process(files, 3, 3)
