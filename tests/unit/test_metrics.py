"""Metrics/profiling subsystem (SURVEY.md §5): JSONL logger + trace hook."""
import json
import os

from tracer.utils.metrics import MetricsLogger, profile_trace


def test_metrics_logger_writes_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = MetricsLogger(path)
    m.log(step=0, loss=1.5)
    m.log(step=1, loss=0.5, rays_per_s=1e6)
    lines = [json.loads(l) for l in open(path)]
    assert [l["step"] for l in lines] == [0, 1]
    assert lines[1]["rays_per_s"] == 1e6
    assert all("t" in l for l in lines)


def test_metrics_logger_disabled_is_noop():
    m = MetricsLogger(None)
    m.log(step=0)  # must not raise or write anywhere


def test_profile_trace_disabled_and_enabled(tmp_path):
    with profile_trace(False) as d:
        assert d is None
    td = str(tmp_path / "trace")
    with profile_trace(True, td) as d:
        assert d == td
    # jax.profiler.trace writes a plugins/profile tree under the dir.
    assert os.path.isdir(td)
