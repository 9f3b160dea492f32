"""Unit tests for bench.run_all's time-budget planner.

The planner must (a) always emit one line per row, (b) skip rows whose
estimate exceeds the remaining budget, and (c) ALWAYS attempt the final
pending row with whatever budget remains — a timeout there produces the
same skip line the estimate check would have, so trying is strictly
better (r5: the eqv2 row was the only one the r4 artifacts never
captured because the estimate check pre-skipped it).
"""

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _run_planner(monkeypatch, tmp_path, estimates):
    import bench

    monkeypatch.setattr(bench, "ROWTIMES_PATH", str(tmp_path / "rowtimes.json"))
    monkeypatch.setattr(bench, "EXPECTED_ROW_SECONDS", estimates)

    calls = []

    def fake_run(cmd, capture_output=True, text=True, timeout=None):
        class R:
            returncode = 0

        r = R()
        if "-c" in cmd:  # device probe
            r.stdout, r.stderr = "", ""
            return r
        name = cmd[cmd.index("--model") + 1]
        calls.append((name, timeout))
        r.stdout = json.dumps({
            "metric": f"{name}_train_conformers_per_sec_per_chip",
            "value": 1.0, "unit": "conformers/s/chip", "vs_baseline": 1.0,
        }) + "\n"
        r.stderr = ""
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.run_all(budget_s=600.0)
    out = [json.loads(ln) for ln in buf.getvalue().splitlines()
           if ln.startswith("{")]
    return out, calls


def test_all_rows_emitted_and_fast_rows_run(monkeypatch, tmp_path):
    import bench

    ests = {k: 10 for k in bench.EXPECTED_ROW_SECONDS}
    out, calls = _run_planner(monkeypatch, tmp_path, ests)
    names = {o["metric"].split("_train_")[0] for o in out}
    assert len(out) == len(bench.EXPECTED_ROW_SECONDS)
    assert names == set(bench.EXPECTED_ROW_SECONDS)
    assert all(o["value"] == 1.0 for o in out)


def test_last_row_attempted_despite_estimate(monkeypatch, tmp_path):
    import bench

    # painn cheap; every other row estimated over budget -> pre-skipped,
    # EXCEPT the final pending row, which must be attempted anyway.
    ests = {k: 10**6 for k in bench.EXPECTED_ROW_SECONDS}
    ests["painn"] = 10
    out, calls = _run_planner(monkeypatch, tmp_path, ests)
    assert len(out) == len(bench.EXPECTED_ROW_SECONDS)
    ran = [n for n, _ in calls]
    assert "painn" in ran
    # exactly one over-estimate row ran: the last one in print order
    assert len(ran) == 2
    by_name = {o["metric"].split("_train_")[0]: o for o in out}
    skipped = [n for n, o in by_name.items() if o["value"] is None]
    assert len(skipped) == len(bench.EXPECTED_ROW_SECONDS) - 2
    assert all("skipped" in by_name[n]["error"] for n in skipped)
