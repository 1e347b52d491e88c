"""Multi-host (multi-process) execution tests.

Spawns a real 2-process x 4-virtual-CPU-device JAX cluster (gloo
cross-process collectives through jax.distributed) running
``tests/multihost_worker.py``, which asserts numeric parity of the
multi-host placement layer (:mod:`dfac_tpu.parallel.multihost`) + the
existing GSPMD / shard_map / serving paths against single-device
references. The reference has no distributed code at all (SURVEY.md §2);
this is new TPU-first surface, exercised here the way a TPU pod runs it:
one Python process per host, global arrays assembled from process-local
rows.

Single-process helpers (local_row_range, put_global, fetch_replicated)
are additionally unit-tested in-process on the 8-virtual-device mesh.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from dfac_tpu.parallel import multihost as mh
from dfac_tpu.parallel.mesh import make_mesh

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")
WORKER2 = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker2.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(worker: str) -> None:
    env = os.environ.copy()
    # The worker configures its own backend (cpu, 4 local devices); the
    # suite's 8-device XLA flag must not leak in.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # worker2 runs ~9 min of trainer fits on a loaded 1-core host
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"ALL OK {pid}" in out, f"worker {pid} incomplete:\n{out[-4000:]}"


def test_two_process_cluster_parity():
    """2 processes x 4 devices: GSPMD step, shard_map DP step, sharded eval,
    and the folded fast serving chain all match single-device references."""
    _run_cluster(WORKER)


def test_two_process_large_program_compositions():
    """2 processes x 4 devices: chunked streaming on all three trainers,
    the GSPMD resident epoch scan, the fused whole-run fit, and mid-run LR
    re-replication all match single-device references (round 4)."""
    _run_cluster(WORKER2)


def test_local_row_range_single_process():
    """In one process every device is addressable: the local range is the
    whole batch, and non-contiguous ownership cannot arise."""
    mesh = make_mesh(devices=jax.devices("cpu")[:8])
    assert mh.local_row_range(mesh, 24) == (0, 24)


def test_put_global_and_fetch_replicated_single_process(rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(devices=jax.devices("cpu")[:8])
    x = rng.normal(size=(8, 3)).astype(np.float32)
    rep = mh.put_global(x, NamedSharding(mesh, P()))
    assert rep.sharding.is_fully_replicated
    np.testing.assert_array_equal(mh.fetch_replicated(rep), x)

    sharded = mh.put_global(x, NamedSharding(mesh, P("data")))
    for s in sharded.addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), x[s.index[0]])
    with pytest.raises(ValueError, match="not fully replicated"):
        mh.fetch_replicated(sharded)

    key = mh.put_global(jax.random.key(7), NamedSharding(mesh, P()))
    assert jax.numpy.issubdtype(key.dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)),
        np.asarray(jax.random.key_data(jax.random.key(7))),
    )


def test_predict_multihost_requires_fast():
    """The serving CLIs refuse --multihost without --fast BEFORE joining
    the cluster (a late failure would name --data-parallel, a flag the
    user never passed)."""
    from dfac_tpu.cli.predict import main as predict_main
    from dfac_tpu.cli.predict_hybrid import main as hybrid_main

    with pytest.raises(SystemExit, match="add --fast"):
        predict_main([
            "--features", "x.pkl", "--checkpoint", "c.ckpt",
            "--model", "cnn2d", "--out", "o.pkl", "--multihost",
        ])
    with pytest.raises(SystemExit, match="add --fast"):
        hybrid_main([
            "--features", "x.pkl", "--cnn-checkpoint", "c.ckpt",
            "--cae-checkpoint", "a.ckpt", "--normalizer", "n.npz",
            "--multihost",
        ])


def test_multihost_config_validation():
    """multihost requires DP; all three trainers compose with the chunked,
    GSPMD-resident, and fused paths (round 4)."""
    from dfac_tpu.train.cae_loop import CAEConfig
    from dfac_tpu.train.detector_loop import DetectorConfig
    from dfac_tpu.train.loop import TrainConfig

    for Config in (TrainConfig, CAEConfig, DetectorConfig):
        with pytest.raises(ValueError, match="GLOBAL device count"):
            Config(multihost=True)
        Config(multihost=True, data_parallel=8, device_resident=True)
        Config(multihost=True, data_parallel=8, resident_chunk_batches=4)


def test_broadcast_pyobj_single_process():
    obj = {"a": np.arange(3), "b": "x"}
    out = mh.broadcast_pyobj(obj)
    assert out is obj  # one process: no serialization round trip


def test_batch_from_local_single_process(rng):
    """With one process the local rows ARE the global batch."""
    mesh = make_mesh(devices=jax.devices("cpu")[:8])
    x = rng.normal(size=(16, 4)).astype(np.float32)
    arr = mh.batch_from_local(x, mesh, global_rows=16)
    assert arr.shape == (16, 4) and not arr.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(arr), x)
