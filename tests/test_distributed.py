"""Multi-process distributed runtime test: 2 local CPU processes.

The reference only ever *declared* multi-GPU (cfg/config.yaml:39-40, flag
never consumed). Here parallel/distributed.py is exercised for real: two
processes bring up jax.distributed over a localhost coordinator, form one
global 8-device mesh (4 CPU devices each), verify a cross-process psum, and
run one sharded PPO train step (MPC-in-the-loop rollout + pmean gradient
reduction). The parent asserts both processes agree on the reward and on
the post-update replicated parameters.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the worker configures devices via jax_num_cpu_devices; a stale
    # force_host_platform_device_count flag (set by conftest for this
    # process) would fight it
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, _WORKER, str(pid), str(port),
                          str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=_REPO)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, f"no RESULT line:\n{out[-4000:]}"
        _, pid, reward, fingerprint = line[-1].split()
        results[int(pid)] = (float(reward), float(fingerprint))

    assert set(results) == {0, 1}
    # both processes saw the same global step: same reward, same params
    assert results[0] == pytest.approx(results[1], rel=1e-6)

    # the strong check: max-abs parameter difference across processes must
    # be exactly 0 after 5 epochs x 4 minibatches of adaptive-lr updates on
    # shard-distinct data (a sum fingerprint can hide sign-balanced drift;
    # shard-local KL -> per-device lr divergence is the bug this catches)
    import numpy as np
    p0 = np.load(tmp_path / "params_0.npz")
    p1 = np.load(tmp_path / "params_1.npz")
    assert set(p0.files) == set(p1.files)
    assert float(p0["lr"]) == float(p1["lr"])
    # the KL that drives the adaptive lr must be the globally-reduced value
    # on every process (shard-local KL = the round-2 replication hazard;
    # params alone can mask it because the lr buckets quantize)
    assert float(p0["kl"]) == float(p1["kl"])
    for k in p0.files:
        diff = float(np.max(np.abs(p0[k] - p1[k]))) if p0[k].ndim else abs(
            float(p0[k]) - float(p1[k]))
        assert diff == 0.0, f"param {k} diverged across processes: {diff}"
