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
