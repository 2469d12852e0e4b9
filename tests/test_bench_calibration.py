"""The bench's load-awareness helpers (r10 verdict ask #2): the calibration
probes must be fixed-work (comparable across samples) and the host snapshot
must expose the fields the drift annotation and post-hoc forensics read.
No Spark involved — these run driver-side between queries."""

import bench


def test_single_thread_probe_is_positive_and_repeatable():
    a = bench._probe_single_thread()
    b = bench._probe_single_thread()
    assert a > 0 and b > 0
    # same fixed workload back-to-back: same order of magnitude even on a
    # noisy host (the drift threshold the bench uses is 1.2 across a RUN;
    # back-to-back samples get a loose 5x sanity bound)
    assert max(a, b) / min(a, b) < 5, (a, b)


def test_multi_thread_probe_runs():
    t = bench._probe_multi_thread(n_threads=4)
    assert t > 0


def test_calibration_probe_shape():
    p = bench._calibration_probe(7)
    assert p["at"] == 7
    assert p["st_sec"] > 0 and p["mt_sec"] > 0


def test_host_snapshot_fields():
    snap = bench._host_snapshot()
    # /proc exists on every host this repo targets (linux container)
    assert len(snap["loadavg"]) == 3
    jif = snap["cpu_jiffies"]
    assert set(jif) == {
        "user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal",
    }
    assert all(isinstance(v, int) and v >= 0 for v in jif.values())


def test_stall_counters_monotone():
    s0 = bench._stall_counters()
    # burn a little CPU so total jiffies advance
    bench._probe_single_thread()
    s1 = bench._stall_counters()
    assert s1[1] > s0[1] >= 0, (s0, s1)   # total advances
    assert s1[0] >= s0[0] >= 0            # steal cumulative
    assert s1[2] >= s0[2] >= 0            # io PSI cumulative


def test_micro_probe_cheap_and_positive():
    import time

    t0 = time.perf_counter()
    m = bench._probe_micro()
    cost = time.perf_counter() - t0
    assert m > 0
    assert cost < 1.0, cost  # bracketing every query must stay cheap


def test_previous_baseline_roundtrip(tmp_path, monkeypatch):
    """r12: the absolute calibration baseline persists through
    bench_details.json and is ignored on SPARK_GRAFT_BENCH_CAL_RESET or
    malformed history (absent file, missing keys, zero values)."""
    import json

    p = tmp_path / "bench_details.json"
    # absent file -> None
    assert bench._previous_baseline(str(p)) is None
    # well-formed baseline reads back as floats
    p.write_text(json.dumps(
        {"calibration": {"baseline": {"st_sec": 0.28, "micro_sec": 0.016}}}
    ))
    b = bench._previous_baseline(str(p))
    # pre-aging format: the stored mins seed one-entry recent windows
    assert b == {
        "st_sec": 0.28,
        "micro_sec": 0.016,
        "recent_st": [0.28],
        "recent_micro": [0.016],
    }
    # zero/missing values are not a baseline
    p.write_text(json.dumps(
        {"calibration": {"baseline": {"st_sec": 0, "micro_sec": 0.016}}}
    ))
    assert bench._previous_baseline(str(p)) is None
    p.write_text(json.dumps({"calibration": {}}))
    assert bench._previous_baseline(str(p)) is None
    # explicit reset discards even a good baseline (hardware change)
    p.write_text(json.dumps(
        {"calibration": {"baseline": {"st_sec": 0.28, "micro_sec": 0.016}}}
    ))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CAL_RESET", "1")
    assert bench._previous_baseline(str(p)) is None


def test_previous_baseline_host_fingerprint_and_aging(tmp_path):
    """r13 (r12 advice): a baseline recorded on a DIFFERENT host is ignored
    wholesale (an inherited faster-machine yardstick would silently disable
    the regression gate), and the ratchet is aged — the baseline is the min
    over the last BASELINE_WINDOW run-bests, so recent lists longer than
    the window are trimmed from the front."""
    import json

    p = tmp_path / "bench_details.json"
    here = bench._host_fingerprint()
    assert here  # nproc is always present even if /proc/cpuinfo has no model
    # same-host baseline with recent lists: trimmed to window, min applies
    long_st = [0.9 - 0.01 * i for i in range(bench.BASELINE_WINDOW + 3)]
    p.write_text(json.dumps({"calibration": {"baseline": {
        "st_sec": 0.01,  # stale pre-computed min: recomputed from recents
        "micro_sec": 0.016,
        "host": here,
        "recent_st": long_st,
        "recent_micro": [0.016, 0.02],
    }}}))
    b = bench._previous_baseline(str(p))
    assert b["recent_st"] == long_st[-bench.BASELINE_WINDOW:]
    assert b["st_sec"] == min(long_st[-bench.BASELINE_WINDOW:])
    assert b["micro_sec"] == 0.016
    # different-host baseline: ignored entirely
    p.write_text(json.dumps({"calibration": {"baseline": {
        "st_sec": 0.001, "micro_sec": 0.0001, "host": "other-cpu|nproc=999",
    }}}))
    assert bench._previous_baseline(str(p)) is None
