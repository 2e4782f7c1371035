"""Driver-entry contract tests.

`dryrun_multichip` must pass in the *driver's* environment: no
XLA_FLAGS (so no pre-provisioned virtual CPU devices) and whatever
ambient JAX_PLATFORMS the host carries.  Round 1 failed exactly here
(MULTICHIP_r01.json ok=false): nothing set
--xla_force_host_platform_device_count before jax initialized, and the
dryrun materialized arrays on the default (TPU) backend.  These tests
run the entry in a clean subprocess to reproduce that environment.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, env):
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_dryrun_multichip_clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the driver does not provision devices
    # Keep the dryrun off any (possibly sick) TPU tunnel: the entry must
    # work CPU-only regardless of the ambient default platform.
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    r = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')",
        env,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "DRYRUN_OK" in r.stdout


def test_dryrun_multichip_jax_already_initialized():
    """If the driver process initialized jax first (flags frozen, 1 CPU
    device), the dryrun must self-heal via its subprocess fallback."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    code = (
        "import jax; jax.devices(); "  # freeze the backend at 1 CPU device
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    r = _run(code, env)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "DRYRUN_OK" in r.stdout
