"""
Regression tests for the driver entry points (`__graft_entry__.py`).

Round 1's `dryrun_multichip` failed in the driver environment (rc=1,
`MULTICHIP_r01.json`): it never forced a CPU platform, so jax initialized
the real (libtpu-version-mismatched) TPU client. These tests execute the
entry exactly the way the driver does — in a CLEAN subprocess with no
conftest-provided JAX_PLATFORMS / XLA_FLAGS — to prove the entry
self-forces the virtual n-device CPU mesh.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """The driver's env: no platform hints of ours."""
    env = dict(os.environ)
    for var in ("JAX_PLATFORMS", "XLA_FLAGS", "TDS_PLATFORM"):
        env.pop(var, None)
    return env


@pytest.mark.integration
def test_dryrun_multichip_clean_subprocess():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=570)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed in a clean subprocess:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}")
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


@pytest.mark.integration
def test_entry_compiles_clean_subprocess():
    code = (
        "import os\n"
        "os.environ['TDS_PLATFORM'] = 'cpu'\n"  # the driver compile-checks on-chip; CPU here
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "print('entry OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=_clean_env(),
        capture_output=True, text=True, timeout=570)
    assert proc.returncode == 0, (
        f"entry() compile check failed:\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}")
    assert "entry OK" in proc.stdout
