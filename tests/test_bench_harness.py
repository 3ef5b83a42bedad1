"""Kill-resilience tests for the bench.py driver harness (VERDICT r3 item 1).

Round 3's official bench record was rc=124/parsed=null: the driver's outer
timeout killed bench.py before its single end-of-run JSON print, discarding
every completed measurement. These tests run bench.py in BENCH_SIMULATE mode
(timed fake measurement rows, no jax/device) and assert:

* a JSON result line appears after the FIRST measurement, not only at exit;
* SIGKILLing the harness at an arbitrary later moment still leaves a valid
  best-so-far JSON line as the last stdout line;
* a hung ladder subprocess cannot push the run past the global budget.
"""

import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _sim_env(**extra):
    env = dict(os.environ)
    env.update({"BENCH_SIMULATE": "1", "BENCH_SIMULATE_STEP_S": "0.3"}, **extra)
    return env


def _json_lines(text):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def test_full_simulated_run_emits_best():
    proc = subprocess.run(
        [sys.executable, "-u", BENCH], capture_output=True, text=True,
        timeout=60, env=_sim_env(BENCH_TOTAL_BUDGET_S="50"))
    rows = _json_lines(proc.stdout)
    assert rows, f"no JSON lines; stderr tail: {proc.stderr[-500:]}"
    # one line per harvested measurement (6 ladder entries) + the final emit
    assert len(rows) >= 2
    final = rows[-1]
    # group B's last fake row carries the max simulated value (group*10+i+1)*100
    assert final["value"] == max(r["value"] for r in rows)
    assert final["value"] > 0
    assert final["metric"] == "retrieve_refine_throughput_per_chip"
    # best-so-far is monotone non-decreasing across emitted lines
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals)


def test_sigkill_after_first_measurement_leaves_valid_json():
    proc = subprocess.Popen(
        [sys.executable, "-u", BENCH], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=_sim_env())
    lines = []
    deadline = time.monotonic() + 30
    try:
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line)
            if line.lstrip().startswith("{"):
                break  # first streamed JSON line landed — kill NOW
        else:
            raise AssertionError("no JSON line within 30s")
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
        rest = proc.stdout.read() or ""
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    rows = _json_lines("".join(lines) + rest)
    assert rows, "SIGKILL discarded every result line"
    last = rows[-1]
    assert last["value"] > 0
    assert last["unit"] == "chunks/sec"
    assert last["vs_baseline"] > 0


def test_hung_ladder_respects_global_budget():
    # The simulated ladder writes its rows then hangs forever; the global
    # budget must bound the whole run (kill + harvest + final emit). Budgets
    # leave headroom for python-startup latency on a contended CPU.
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-u", BENCH], capture_output=True, text=True,
        timeout=90, env=_sim_env(BENCH_SIMULATE_HANG="1",
                                 BENCH_TOTAL_BUDGET_S="45",
                                 BENCH_MIN_STAGE_S="1"))
    wall = time.monotonic() - t0
    assert wall < 70, f"run overran the global budget: {wall:.0f}s"
    rows = _json_lines(proc.stdout)
    assert rows and rows[-1]["value"] > 0, (
        f"hung ladder discarded completed rows; stderr: {proc.stderr[-500:]}")
