"""The driver's multichip dryrun must survive a hostile default backend.

Round-1 and round-2 both recorded MULTICHIP failures whose root causes were
environmental: a sitecustomize-registered TPU plugin clobbers the
JAX_PLATFORMS env var after import, and merely *discovering* that backend
(any jax.devices() call) hangs indefinitely when its tunnel/worker is down.
These tests pin the defense: every entry path must force the CPU platform
via jax.config before the first device query, and the dryrun must finish
fast enough for a driver timeout (warm persistent compile cache).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_standalone_dryrun_completes_quickly():
    """`python __graft_entry__.py 8` must pass within a driver-ish budget
    regardless of TPU-plugin health (it may not touch any non-CPU backend)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # simulate the driver's raw environment
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        capture_output=True,
        text=True,
        timeout=380,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


@pytest.mark.slow
def test_driver_style_dryrun_without_device_flag():
    """If the driver calls dryrun_multichip(8) WITHOUT having set
    xla_force_host_platform_device_count (or after the backend is already
    pinned at 1 device), the function must still go green by re-running
    itself in a correctly-configured subprocess."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # no virtual-device flag at all
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        capture_output=True,
        text=True,
        timeout=380,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


@pytest.mark.slow
def test_driver_style_dryrun_import_call():
    """The driver's own invocation shape: import the module, call the fn."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        capture_output=True,
        text=True,
        timeout=380,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
