"""Driver-contract tests: __graft_entry__ and bench.py must stay loadable."""

import importlib.util
import subprocess
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft", str(REPO / "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles(graft):
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 256, 256, 3)
    # and it actually lowers (catches tracing-time errors beyond shapes)
    jax.jit(fn).lower(*args)


@pytest.mark.slow
def test_dryrun_multichip_two_devices(graft):
    # the driver calls this with N virtual devices; 2 keeps the test fast
    graft.dryrun_multichip(2)


def test_bench_help():
    out = subprocess.run([sys.executable, str(REPO / "bench.py"), "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--batch" in out.stdout


def test_bench_backend_probe(monkeypatch):
    """bench.py guards against the observed tunnel-outage mode where
    jax.devices() hangs forever: an unreachable backend must yield a JSON
    error line, not a hang. The probe subprocess inherits the env, so in
    THIS test env (JAX_PLATFORMS pinned to the TPU backend but no plugin on
    the subprocess PYTHONPATH) it correctly reports unreachable; force CPU
    for the reachable case."""
    spec = importlib.util.spec_from_file_location(
        "bench_mod", str(REPO / "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert mod._backend_reachable() is True  # CPU backend, instant
    # a timeout too short for any interpreter start == simulated hang
    assert mod._backend_reachable(timeout=0.01) is False
