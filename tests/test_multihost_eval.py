"""Multi-host eval sharding (VERDICT r3 item 6): per-process roidb slicing
and detection merge (tllod_tpu/parallel/multihost.py). The pure logic is
pinned here on one process; test_two_process_allgather runs the REAL
``jax.distributed`` 2-process path (CPU backend) in subprocesses when the
runtime provides a coordinator, else skips."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from tllod_tpu.parallel.multihost import (merge_detections,  # noqa: E402
                                          pack_detections, shard_roidb)


def test_shard_roidb_strided_complete():
    roidb = [{"i": i} for i in range(11)]
    seen = []
    for p in range(3):
        local, idx = shard_roidb(roidb, p, 3)
        assert [r["i"] for r in local] == idx
        assert idx == list(range(p, 11, 3))
        seen += idx
    assert sorted(seen) == list(range(11))
    # balance: sizes differ by at most 1
    sizes = [len(shard_roidb(roidb, p, 3)[1]) for p in range(3)]
    assert max(sizes) - min(sizes) <= 1


def _fake_local_boxes(indices, num_classes):
    """all_boxes[class][row] with a recognizable payload per (class, img)."""
    return [[np.full((2, 5), 10 * c + i, np.float32)
             for i in indices] for c in range(num_classes)]


def test_pack_merge_roundtrip():
    n, num_classes, pcount = 10, 4, 3
    roidb = list(range(n))
    parts = []
    for p in range(pcount):
        _, idx = shard_roidb(roidb, p, pcount)
        parts.append(pack_detections(idx, _fake_local_boxes(idx,
                                                            num_classes),
                                     num_classes))
    merged = merge_detections(parts, num_classes, n)
    for c in range(num_classes):
        for i in range(n):
            np.testing.assert_array_equal(
                merged[c][i], np.full((2, 5), 10 * c + i, np.float32))


def test_merge_rejects_overlap_and_gaps():
    num_classes = 2
    blob = pack_detections([0, 1], _fake_local_boxes([0, 1], num_classes),
                           num_classes)
    with pytest.raises(ValueError, match="two processes"):
        merge_detections([blob, blob], num_classes, 2)
    with pytest.raises(ValueError, match="cover"):
        merge_detections([blob], num_classes, 3)


_WORKER = r"""
import os, sys, pickle
sys.path.insert(0, os.environ["TLLOD_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(os.environ["COORD"],
                           num_processes=2,
                           process_id=int(os.environ["PID_IDX"]))
from tllod_tpu.parallel.multihost import allgather_bytes
mine = (b"proc-%d-payload" % jax.process_index()) * (jax.process_index()+1)
parts = allgather_bytes(mine)
assert len(parts) == 2, parts
assert parts[jax.process_index()] == mine
other = 1 - jax.process_index()
assert parts[other] == (b"proc-%d-payload" % other) * (other + 1)
print("OK", jax.process_index())
"""


@pytest.mark.slow
def test_two_process_allgather(tmp_path):
    """Real jax.distributed 2-process allgather on the CPU backend."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith(("AXON", "PALLAS_AXON", "TPU")))}
    env.update({"TLLOD_REPO": repo, "COORD": "localhost:12921",
                "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "JAX_NUM_CPU_DEVICES": "1"})
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for p in range(2):
        e = dict(env, PID_IDX=str(p))
        procs.append(subprocess.Popen([sys.executable, str(script)],
                                      env=e, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    if any("distributed" in o and "not" in o.lower() and p.returncode
           for p, o in zip(procs, outs)):
        pytest.skip(f"no distributed CPU backend: {outs}")
    assert all(p.returncode == 0 for p in procs), outs
    assert "OK 0" in outs[0] and "OK 1" in outs[1]
