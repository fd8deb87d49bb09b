"""The scaling-sweep harness (bench.py --scaling on >1 device) must
actually measure the sharded accel render over growing submeshes — on any
hardware it is given (VERDICT r4 missing #2: the pending-rows-only
version could never produce the BASELINE scaling table). Here it runs on
the virtual 8-device CPU mesh: timings are not hardware-meaningful, but
every row must come from a real executed render."""
import numpy as np

from tracer.dist.scaling import scaling_sweep, default_device_counts
from tracer.utils.config import load_config


def test_default_device_counts():
    assert default_device_counts(1) == [1]
    assert default_device_counts(8) == [1, 2, 4, 8]
    assert default_device_counts(6) == [1, 2, 4, 6]
    assert default_device_counts(16) == [1, 2, 4, 8, 16]


def test_scaling_sweep_measures_rows():
    cfg = load_config("cornell256", height=32, width=16)
    rows = scaling_sweep(cfg, device_counts=[1, 2, 4], iters=2, warmup=1)
    assert [r["devices"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert np.isfinite(r["rays_per_s"]) and r["rays_per_s"] > 0
        assert np.isfinite(r["efficiency"]) and r["efficiency"] > 0
        assert r["height"] % r["devices"] == 0
    assert abs(rows[0]["efficiency"] - 1.0) < 1e-9
