"""Shared ambient-load + drift gate (dbt_analytics_spark/bench_gate.py):
the contract every benchmark artifact rides — wait for a quiet host
BEFORE timing, refuse to emit an artifact whose gates failed."""

from __future__ import annotations

import json

import pytest

from dbt_analytics_spark.bench_gate import (
    drift_band,
    drift_gate,
    emit_gated,
    wait_for_quiet,
)


def test_wait_for_quiet_ok_on_quiet_host():
    assert wait_for_quiet(load_max=1e9, load_wait=0) == "ok"


def test_wait_for_quiet_times_out_loudly():
    gate = wait_for_quiet(load_max=0.0, load_wait=0)
    assert gate.startswith("TIMEOUT")
    assert "contention-suspect" in gate


def test_drift_band_and_gate():
    assert drift_band([1.0, 1.0, 1.0]) == 0.0
    assert drift_band([1.0, 3.0]) == 2.0
    assert drift_gate({"a": [1.0, 1.5]}, drift_max=3.0) == "ok"
    gate = drift_gate({"a": [0.1, 0.9], "b": [1.0, 1.1]}, drift_max=3.0)
    assert gate.startswith("FAIL") and "'a'" in gate and "'b'" not in gate
    # single-sample series have no band to judge
    assert drift_gate({"a": [5.0]}, drift_max=0.1) == "ok"
    # 0 disables
    assert drift_gate({"a": [0.1, 99.0]}, drift_max=0) == "ok"


def test_emit_gated_stamps_fields(capsys):
    emit_gated({"metric": "m"}, "ok", samples={"a": [1.0, 1.1]})
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["load_gate"] == "ok" and rec["drift_gate"] == "ok"
    assert len(rec["loadavg"]) == 3


def test_emit_gated_refuses_on_load_failure(capsys, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PROBE_FORCE", raising=False)
    with pytest.raises(SystemExit) as e:
        emit_gated({"metric": "m"}, "TIMEOUT: busy", samples={})
    assert e.value.code == 3
    out = capsys.readouterr()
    assert out.out.strip() == ""  # nothing emitted to stdout
    assert "REFUSING" in out.err


def test_emit_gated_refuses_on_drift_failure(capsys, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PROBE_FORCE", raising=False)
    with pytest.raises(SystemExit):
        emit_gated(
            {"metric": "m"}, "ok", samples={"a": [0.1, 9.0]}, drift_max=3.0
        )
    assert capsys.readouterr().out.strip() == ""


def test_emit_gated_force_override_self_documents(capsys, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROBE_FORCE", "1")
    emit_gated({"metric": "m"}, "TIMEOUT: busy", samples={})
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["load_gate"].startswith("TIMEOUT")


def test_combine_gates_ok_only_when_all_windows_quiet():
    from dbt_analytics_spark.bench_gate import combine_gates

    assert combine_gates({"start": "ok", "measured": "ok"}) == "ok"
    g = combine_gates(
        {"start": "ok", "measured": "TIMEOUT: loadavg 17.5 > 4.0"}
    )
    assert "measured" in g and "17.5" in g and g != "ok"
