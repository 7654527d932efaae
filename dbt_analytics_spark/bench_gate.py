"""Shared ambient-load + drift gating for benchmark artifacts.

bench.py gained these gates in rounds 11-12 (BENCH_r08's headline number
was pure host contention: loadavg 7.1 -> +35% on byte-identical
queries), but the scripts/probe_*.py artifacts did not —
BENCH_J1B_STAGES_r12 published under loadavg 29-46 with a 2.8x drift
band on a floor row. This module lifts the two checks into one helper
every probe uses:

- :func:`wait_for_quiet` — bounded wait for the 1-min loadavg to drop
  below the gate BEFORE any timing starts; returns ``"ok"`` or a loud
  TIMEOUT string.
- :func:`drift_gate` — per-series (max-min)/min drift bands over the
  repeats; a band above the gate means the host moved mid-run.
- :func:`emit_gated` — stamps ``load_gate``/``drift_gate``/``loadavg``
  fields into the payload and REFUSES to emit the JSON line (exit 3)
  when either gate failed, so a shell redirect cannot capture a
  contention-suspect artifact as if it were a measurement.

Tunables (same env names bench.py honors): SPARK_GRAFT_BENCH_LOAD_MAX
(default 4.0), SPARK_GRAFT_BENCH_LOAD_WAIT seconds (default 240; 0
disables waiting), SPARK_GRAFT_BENCH_DRIFT_MAX (default 1.5 — r13's
3.0 was loose enough to pass a uniformly-loaded host; 0 disables),
SPARK_GRAFT_PROBE_FORCE=1 to emit anyway (the JSON still carries the
failing gate strings — it self-documents as suspect).

Round-14 fix (VERDICT r13 "What's wrong" #1): a single process-start
wait leaves the MEASURED window ungated — BENCH_SF10_r13 was stamped
``load_gate: ok`` while its own post-warmup loadavg read 17.5. Callers
must re-invoke :func:`wait_for_quiet` after warmup and before each
measured group (bench.py does), and the artifact's gate stamp must be
the WORST of the per-window gates (:func:`combine_gates`).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _env_float(name: str, default: float) -> float:
    return float(os.environ.get(name, str(default)))


def wait_for_quiet(
    load_max: float | None = None, load_wait: float | None = None
) -> str:
    """Bounded wait for a quiet host BEFORE measuring. Returns ``"ok"``
    or a loud ``"TIMEOUT: ..."`` string for the artifact's load_gate
    field."""
    if load_max is None:
        load_max = _env_float("SPARK_GRAFT_BENCH_LOAD_MAX", 4.0)
    if load_wait is None:
        load_wait = _env_float("SPARK_GRAFT_BENCH_LOAD_WAIT", 240.0)
    deadline = time.monotonic() + load_wait
    while os.getloadavg()[0] > load_max:
        if time.monotonic() >= deadline:
            gate = (
                f"TIMEOUT: started at loadavg {os.getloadavg()[0]:.1f} > "
                f"{load_max} after waiting {load_wait:.0f}s — timings below "
                "are contention-suspect"
            )
            print(f"# load gate {gate}", file=sys.stderr)
            return gate
        print(
            f"# load gate: 1-min loadavg {os.getloadavg()[0]:.1f} > "
            f"{load_max}, waiting for a quiet host...",
            file=sys.stderr,
        )
        time.sleep(10)
    return "ok"


def combine_gates(windows: dict[str, str]) -> str:
    """Collapse per-measured-window load gates into ONE artifact stamp:
    ``"ok"`` only when every window was quiet; otherwise a loud string
    naming each failing window — so an artifact can never carry
    ``load_gate: ok`` off a process-start sample while its measured
    windows ran loaded."""
    bad = {k: v for k, v in windows.items() if v != "ok"}
    if not bad:
        return "ok"
    return "; ".join(f"{k}: {v}" for k, v in bad.items())


def drift_band(samples: list[float]) -> float:
    """(max - min) / min over one series' repeats — how much the host
    moved under this measurement during the run."""
    return (max(samples) - min(samples)) / min(samples) if samples else 0.0


def drift_gate(
    samples: dict[str, list[float]], drift_max: float | None = None
) -> str:
    """``"ok"`` or a loud FAIL string naming every series whose drift
    band exceeds the gate. Series with < 2 repeats are skipped (no band
    to judge)."""
    if drift_max is None:
        drift_max = _env_float("SPARK_GRAFT_BENCH_DRIFT_MAX", 1.5)
    if drift_max <= 0:
        return "ok"
    bad = {
        k: round(drift_band(v), 2)
        for k, v in samples.items()
        if len(v) > 1 and drift_band(v) > drift_max
    }
    if bad:
        gate = (
            f"FAIL: {bad} exceed a {drift_max}x drift band — timings are "
            "contention-suspect; re-run this probe on a quiet host"
        )
        print(f"# drift gate {gate}", file=sys.stderr)
        return gate
    return "ok"


def emit_gated(
    payload: dict,
    load_gate: str,
    samples: dict[str, list[float]] | None = None,
    drift_max: float | None = None,
) -> None:
    """Stamp the gate fields and print the artifact JSON line — or
    REFUSE (exit 3) when a gate failed, so the probe's artifact can
    never silently record a contention-shaped number. ``samples`` maps
    series name -> repeat timings for the drift check."""
    dgate = drift_gate(samples or {}, drift_max)
    payload = dict(payload)
    payload["load_gate"] = load_gate
    payload["drift_gate"] = dgate
    payload["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    ok = load_gate == "ok" and dgate == "ok"
    if not ok and os.environ.get("SPARK_GRAFT_PROBE_FORCE") != "1":
        print(
            "# REFUSING to emit artifact: "
            f"load_gate={load_gate!r} drift_gate={dgate!r} "
            "(set SPARK_GRAFT_PROBE_FORCE=1 to emit a self-documented "
            "suspect artifact)",
            file=sys.stderr,
        )
        raise SystemExit(3)
    print(json.dumps(payload))
