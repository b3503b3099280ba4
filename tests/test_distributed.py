"""Multi-process DCN rehearsal (VERDICT r1 item 9): two OS processes, 4
virtual CPU devices each, jax.distributed + gloo collectives, one global
("dp", "sp") mesh — the closest local stand-in for the reference's
mtssrv cluster mode (src/mitsuba/mtssrv.cpp) and for real multi-host
TPU pods. Verifies the sharded render is process-count invariant."""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_render():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, f"proc {pid} no RESULT:\n{out[-3000:]}"
        _, mean, diff = lines[0].split()
        results.append((float(mean), float(diff)))
    # both processes computed the same global image, equal to the
    # single-device render up to float reduction order
    assert abs(results[0][0] - results[1][0]) < 1e-6
    for mean, diff in results:
        assert mean > 0.02
        assert diff < 1e-4, diff
