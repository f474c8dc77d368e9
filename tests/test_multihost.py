"""Multi-process integration: tools/multihost_launch.py as TWO local
processes against a localhost coordinator (the single-machine stand-in for
two hosts on DCN). Each process runs the CPU backend with faked devices;
``jax.distributed`` stitches them into one 2-process global mesh and the
sharded solvers run unchanged over it.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCH = os.path.join(HERE, "tools", "multihost_launch.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(demo: str, extra=()):
    """Run the launcher as 2 local processes; return process-0's output."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each process sets its own device count
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, LAUNCH,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--cpu", "2", "--demo", demo, *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=HERE))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    assert procs[0].returncode == 0, outs[0]
    assert procs[1].returncode == 0, outs[1]
    return outs[0]


def test_two_process_topology():
    """--demo none: connectivity smoke — 2 hosts x 2 chips = 4 devices."""
    out = _launch_pair("none")
    assert "2 hosts x 2 chips = 4 devices" in out, out


@pytest.mark.slow
def test_two_process_schur_solve():
    """A coupled chain sharded across both processes' devices converges."""
    out = _launch_pair("schur", ("--points-per-chip", "4"))
    assert "converged=True" in out, out
    assert "32 vars" in out, out


@pytest.mark.slow
def test_two_process_fleet_solve():
    out = _launch_pair("fleet", ("--sketches-per-chip", "64"))
    assert "sketches/sec" in out, out
