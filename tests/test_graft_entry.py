"""Tests for the driver-facing entry points in __graft_entry__.py.

The multi-chip dry run is exercised via a SUBPROCESS with the conftest's
XLA_FLAGS stripped, reproducing the driver's environment (round-1 failure
mode: every in-repo test ran on the conftest-provided 8-CPU mesh while the
driver's process saw 1 axon TPU device and crashed — VERDICT.md weak #1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Environment as the driver sees it: no forced host device count, no
    pytest conftest having pre-configured the backend."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_self_provisions_virtual_mesh():
    """dryrun_multichip(8) must pass in a fresh process with NO forced
    device count — it self-provisions 8 virtual CPU devices."""
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-1000:]


def test_dryrun_multichip_subprocess_fallback_when_backend_taken():
    """If the calling process has already initialized a too-small backend
    (the driver's axon process), the dry run must still succeed by
    re-execing itself in a provisioned subprocess. (light=True: this tests
    the provisioning mechanics; the full program runs in the
    self-provision test above.)"""
    code = (
        "import os\n"
        # Pin this outer process to exactly 1 CPU device and initialize it,
        # simulating the driver's 1-TPU-chip backend without needing a TPU.
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(4, light=True)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-1000:]


def test_entry_refuses_after_inline_dryrun():
    """dryrun_multichip pins the process to virtual CPU devices; a later
    entry() in the same process must raise instead of silently compiling
    the 'single-chip' step for a virtual CPU device."""
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2, light=True)\n"
        "try:\n"
        "    __graft_entry__.entry()\n"
        "except RuntimeError as e:\n"
        "    assert 'fresh process' in str(e), e\n"
        "    print('REFUSED-OK')\n"
        "else:\n"
        "    raise SystemExit('entry() silently ran on the CPU backend')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "REFUSED-OK" in proc.stdout


def test_entry_compiles_and_runs():
    """entry() returns (fn, args) that jit-compile and produce finite output."""
    import jax
    import numpy as np

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
