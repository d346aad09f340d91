"""Real 2-process jax.distributed integration: coordinator + worker
subprocesses (2 virtual CPU devices each -> a 4-device global mesh)
running initialize_multihost + make_host_sharded_loader +
make_global_batch end-to-end, plus the evaluate-module cross-process
allgather helpers. Complements tests/test_multihost_data.py, which only
simulates hosts in-process."""

import pytest as _pytest
pytestmark = _pytest.mark.slow

import json
import os
import socket
import subprocess
import sys

from egotap_tpu.data.synthetic import generate_dataset

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_pipeline(tmp_path):
    root = str(tmp_path / "data")
    generate_dataset(root, "UnrealEgo", num_sequences=2, frames_per_seq=6,
                     image_size=16)
    coord = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(_REPO, "tests", "multihost_worker.py")

    env = {**os.environ, "PYTHONPATH": _REPO}
    env.pop("XLA_FLAGS", None)   # the worker sets its own device count
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(p), "2", root, outs[p]],
        env=env, cwd=_REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for p in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count"] == 2
    # both processes ran the same number of global batches and agree on
    # the global valid-sample count, which covers the whole split
    assert results[0]["batches"] == results[1]["batches"] > 0
    assert results[0]["total"] == results[1]["total"]
    # the distributed run covered exactly the samples a single-process
    # loader sees
    from egotap_tpu.data.pipeline import make_loader
    from egotap_tpu.data.synthetic import synthetic_config
    cfg = synthetic_config(root, "UnrealEgo", model="heatmap_shared",
                           num_heatmap=15, num_rot_heatmap=0,
                           heatmap_type="none",
                           load_size_heatmap=(16, 16), batch_size=4)
    n_val = sum(int(b["mask"].sum())
                for b in make_loader(cfg, "validation"))
    assert results[0]["total"] == float(n_val)
    # allgather helpers concatenated ragged per-process rows in order
    assert results[0]["rows"] == [[0, 0], [1, 1], [1, 1]]
    assert results[0]["strs"] == ["host0-a", "host0-bb",
                                  "host1-a", "host1-bb"]
    assert results[0]["rows"] == results[1]["rows"]
