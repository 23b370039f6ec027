"""Driver-entry contract tests.

Round-1 lesson (VERDICT.md weak #1): `dryrun_multichip` passed the in-repo
tests — which force an 8-device virtual platform via conftest — yet failed on
the actual 1-device bench host.  These tests therefore run the entry in a
CLEAN subprocess that sees exactly ONE device, so the bootstrap path (re-exec
with a forced virtual CPU platform) is what gets exercised.
"""

import os
import re
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # end-to-end training tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_clean_subprocess(code: str, n_forced_devices: int = 1):
    """Run `code` with the host platform forced to `n_forced_devices` CPU
    devices — simulating the driver's bench host (1 real chip)."""
    env = dict(os.environ)
    env.pop("_GRAFT_DRYRUN_BOOTSTRAPPED", None)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_forced_devices}"
    ).strip()
    preamble = (
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
    )
    return subprocess.run(
        [sys.executable, "-c", preamble + code],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_one_device():
    """On a 1-device host, dryrun_multichip(8) must self-bootstrap an
    8-device virtual platform and succeed — the exact MULTICHIP_r01 failure."""
    proc = _run_in_clean_subprocess(
        "import __graft_entry__ as e\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "e.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
    assert "'data': 4" in proc.stdout and "'model': 2" in proc.stdout


def test_dryrun_multichip_inline_when_devices_present():
    """With devices already present (conftest's 8-device platform), the
    dryrun runs inline — no subprocess marker in the environment."""
    import __graft_entry__ as e

    assert "_GRAFT_DRYRUN_BOOTSTRAPPED" not in os.environ
    e.dryrun_multichip(4)  # inline: 8 >= 4


def test_entry_compiles():
    import jax

    import __graft_entry__ as e

    fn, args = e.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (8, 4)
    assert out[1].shape[1] == 250
