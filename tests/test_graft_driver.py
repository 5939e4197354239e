"""Driver-fidelity test for __graft_entry__.dryrun_multichip.

Round-1 VERDICT item 1: the driver imports __graft_entry__ in a FRESH
interpreter (no conftest, ambient sitecustomize pointing JAX at the
1-chip axon TPU) and calls dryrun_multichip(8) directly. Round 1 failed
because the CPU-platform forcing lived only in conftest and the
__main__ block. This test reproduces the driver's exact call pattern:
a bare subprocess with the conftest env scrubbed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_fresh_interpreter_no_conftest():
    env = dict(os.environ)
    # Scrub what conftest set so the subprocess sees the driver's world.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)

    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun failed rc={proc.returncode}\n"
        f"stdout: {proc.stdout[-1500:]}\nstderr: {proc.stderr[-1500:]}"
    )
    assert "dryrun_multichip ok" in proc.stdout
