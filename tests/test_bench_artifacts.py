"""Pins for bench.py's artifact hygiene (r10 verdict item 2): an
unstable calibration bracket must never become the canonical record
that PER_QUERY_BASELINE / the per-query watch rule reads next round,
and the harness retries until a stable bracket lands (or says loudly
that none did)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _persist_result, _run_with_retries  # noqa: E402


def _read(path):
    with open(path) as f:
        return json.load(f)


def test_unstable_result_never_overwrites_stable_record(tmp_path):
    docs = str(tmp_path)
    stable = {"legacy17_normalized": 8.6, "calibration_unstable": False}
    p1 = _persist_result(stable, docs)
    assert p1.endswith("bench_last.json")
    assert _read(p1) == stable

    unstable = {"legacy17_normalized": 5.7, "calibration_unstable": True,
                "calibration_drift_pct": 38.1}
    p2 = _persist_result(unstable, docs)
    assert p2.endswith("bench_last_unstable.json")
    # the stable record is untouched; the unstable one lives beside it
    assert _read(os.path.join(docs, "bench_last.json")) == stable
    assert _read(p2) == unstable

    # a later stable run takes the canonical slot AND retires the
    # stale unstable sibling (it no longer describes the tip)
    stable2 = {"legacy17_normalized": 8.7, "calibration_unstable": False}
    _persist_result(stable2, docs)
    assert _read(os.path.join(docs, "bench_last.json")) == stable2
    assert not os.path.exists(os.path.join(docs,
                                           "bench_last_unstable.json"))


def test_retry_until_stable_bracket(tmp_path):
    runs = [{"calibration_unstable": True, "calibration_drift_pct": 40.0},
            {"calibration_unstable": True, "calibration_drift_pct": 25.0},
            {"calibration_unstable": False, "calibration_drift_pct": 5.0}]
    it = iter(runs)
    out = _run_with_retries(lambda: dict(next(it)), max_attempts=3,
                            sleep_s=0, log=lambda m: None)
    assert out["calibration_unstable"] is False
    assert out["bench_attempts"] == 3
    assert "no_stable_bracket" not in out

    # first-try stable: exactly one attempt, no retries consumed
    it2 = iter([{"calibration_unstable": False}, RuntimeError])
    out2 = _run_with_retries(lambda: dict(next(it2)), max_attempts=3,
                             sleep_s=0, log=lambda m: None)
    assert out2["bench_attempts"] == 1

    # all attempts unstable: the LAST result ships, flagged loudly
    msgs = []
    out3 = _run_with_retries(
        lambda: {"calibration_unstable": True,
                 "calibration_drift_pct": 99.0},
        max_attempts=2, sleep_s=0, log=msgs.append)
    assert out3["no_stable_bracket"] is True
    assert out3["bench_attempts"] == 2
    assert any("giving up" in m for m in msgs)
