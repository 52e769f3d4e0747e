"""Driver-contract regression: dryrun_multichip must pass in a fresh
process with the outer environment untouched (the axon sitecustomize
pins JAX to the tunneled TPU; the dryrun must self-force the virtual
CPU backend — VERDICT r1 item 1)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_selfhosts_virtual_cpu():
    # Deliberately do NOT pass JAX_PLATFORMS/XLA_FLAGS: the contract is
    # that dryrun_multichip forces them itself.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
@pytest.mark.parametrize("n", [2, 6])
def test_dryrun_multichip_other_device_counts(n):
    """The mesh factorization must work for any even device count, not
    just the driver's 8 (VERDICT r1 weak item 1)."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            f"import __graft_entry__; __graft_entry__.dryrun_multichip({n})",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout
