"""Multi-host helpers on the virtual 8-device CPU mesh."""
import numpy as np

from vibevoice_tpu.parallel import multihost as mh


def test_global_mesh_and_batch_sharding():
    mesh = mh.global_mesh(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    batch = mh.shard_batch_for_host({"x": np.ones((8, 5), np.float32), "y": None}, mesh)
    assert batch["y"] is None
    assert batch["x"].shape == (8, 5)
    assert len(batch["x"].sharding.device_set) == 8


def test_dp_scaling_report_single_process():
    rep = mh.dp_scaling_report(12.0, 3.0)
    assert rep["hosts"] == 1
    assert rep["throughput"] == 4.0
