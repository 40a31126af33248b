"""bench.py busy-chip guard: when a registered round-runner TPU client is
live (scripts/r4_tpu_lib.sh writes its PID to /tmp/r4_tpu_job.pid), bench
must NOT start a second client — two concurrent clients wedge the axon
tunnel (verify-skill runbook) — and instead replays the last recorded
headline, flagged `cached: true`. Driver contract (one JSON line with
metric/value/unit/vs_baseline) holds in both modes."""

import importlib.util
import json
import os
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture()
def benchmod():
    spec = importlib.util.spec_from_file_location("benchmod",
                                                  ROOT / "bench.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class TestBusyChipGuard:
    def test_absent_pidfile_means_not_busy(self, benchmod, monkeypatch,
                                           tmp_path):
        monkeypatch.setenv("BENCH_TPU_PIDFILE", str(tmp_path / "missing"))
        assert benchmod._live_registered_tpu_job() is None

    def test_stale_pid_means_not_busy(self, benchmod, monkeypatch, tmp_path):
        p = tmp_path / "stale.pid"
        p.write_text("999999")
        monkeypatch.setenv("BENCH_TPU_PIDFILE", str(p))
        assert benchmod._live_registered_tpu_job() is None

    def test_live_non_python_pid_means_not_busy(self, benchmod, monkeypatch,
                                                tmp_path):
        p = tmp_path / "init.pid"
        p.write_text("1")  # init: live, but not a python TPU client
        monkeypatch.setenv("BENCH_TPU_PIDFILE", str(p))
        assert benchmod._live_registered_tpu_job() is None

    def test_live_python_pid_detected(self, benchmod, monkeypatch, tmp_path):
        p = tmp_path / "self.pid"
        p.write_text(str(os.getpid()))
        monkeypatch.setenv("BENCH_TPU_PIDFILE", str(p))
        assert benchmod._live_registered_tpu_job() == os.getpid()

    def test_cached_headline_contract(self, benchmod):
        """The replayed row keeps the driver contract and flags itself."""
        row = benchmod._cached_headline(pid=12345)
        assert row is not None, "no cache source on disk"
        for k in ("metric", "value", "unit", "vs_baseline"):
            assert k in row
        assert row["metric"] == "egno_train_throughput"
        assert row["cached"] is True
        assert "12345" in row["note"]
        json.dumps(row)  # one-line JSON serializable
