"""Real 2-process distributed execution (not thread-simulated): two
jax.distributed processes with gloo CPU collectives train one model
data-parallel and run by-chunks inference with shared-store tile ownership
(the reference tests distributed on a real 2-GPU runner, SURVEY.md §4; this
is the honest multi-process analog). The worker also pins the
checkpoint-write/reload barrier — without it ranks raced rank 0's best-
checkpoint rewrite and diverged.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_by_chunks(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for r in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"MPWORKER_OK rank={r}" in out, out[-2000:]
    # both ranks reached the same parameters (digest printed by the worker)
    d0 = outs[0].split("digest=")[1].split()[0]
    d1 = outs[1].split("digest=")[1].split()[0]
    assert d0 == d1, (d0, d1)
