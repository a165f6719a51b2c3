"""Unit tests for bench.py's degraded-tunnel guard (_retry_until_sane).

Round-3 incident: the dev tunnel ran the identical compiled program ~10x
slow for an entire best-of-5 window (1,794 img/s vs the recorded 17k
steady state) and the bench recorded it as the headline. The guard keeps
re-sampling until the reading recovers or time runs out, then flags a
still-degraded result. Pure logic — no jax, no device.
"""

import bench


def _clock(start=0.0):
    t = {"now": start}

    def now():
        return t["now"]

    def sleep(s):
        t["now"] += s

    return now, sleep


def test_sane_reading_passes_through_untouched():
    now, sleep = _clock()
    calls = []
    best, degraded = bench._retry_until_sane(
        16000.0, lambda: calls.append(1) or 0.0, recorded=17000.0,
        _time=now, _sleep=sleep)
    assert best == 16000.0 and degraded is False
    assert not calls  # never re-measures when above the floor


def test_no_recorded_value_disables_the_guard():
    now, sleep = _clock()
    best, degraded = bench._retry_until_sane(
        1.0, lambda: 99.0, recorded=None, _time=now, _sleep=sleep)
    assert best == 1.0 and degraded is False


def test_degraded_reading_retries_until_recovery():
    now, sleep = _clock()
    seq = iter([1800.0, 2100.0, 16500.0])
    best, degraded = bench._retry_until_sane(
        1794.0, lambda: next(seq), recorded=17000.0,
        sleep_s=10.0, _time=now, _sleep=sleep)
    assert best == 16500.0 and degraded is False
    assert bench._BEST_PRIMARY["value"] == 16500.0  # watchdog sees progress


def test_persistent_degradation_reports_best_and_flags(monkeypatch):
    monkeypatch.setitem(bench._DEADLINE, "s", 0.0)
    now, sleep = _clock()
    best, degraded = bench._retry_until_sane(
        1794.0, lambda: 1900.0, recorded=17000.0,
        max_window_s=100.0, sleep_s=40.0, _time=now, _sleep=sleep)
    assert best == 1900.0 and degraded is True


def test_watchdog_margin_bounds_the_retry_window(monkeypatch):
    # Watchdog fires at t0=0 + 1000s; margin 900s => retries must stop
    # by t=100 even though max_window_s would allow 1800s.
    monkeypatch.setitem(bench._DEADLINE, "t0", 0.0)
    monkeypatch.setitem(bench._DEADLINE, "s", 1000.0)
    now, sleep = _clock()
    n = {"calls": 0}

    def measure():
        n["calls"] += 1
        return 1900.0

    best, degraded = bench._retry_until_sane(
        1794.0, measure, recorded=17000.0, sleep_s=40.0,
        margin_s=900.0, _time=now, _sleep=sleep)
    assert degraded is True
    assert n["calls"] <= 3 and now() <= 140.0


def test_measurement_exceptions_do_not_abort_sampling(monkeypatch):
    monkeypatch.setitem(bench._DEADLINE, "s", 0.0)
    now, sleep = _clock()
    seq = iter([RuntimeError("tunnel hiccup"), 16800.0])

    def measure():
        v = next(seq)
        if isinstance(v, Exception):
            raise v
        return v

    best, degraded = bench._retry_until_sane(
        1794.0, measure, recorded=17000.0,
        sleep_s=10.0, _time=now, _sleep=sleep)
    assert best == 16800.0 and degraded is False


def test_recorded_primary_reads_full_json():
    v = bench._recorded_primary()
    # benchmarks/full.json ships in-repo with a measured primary row.
    assert v is None or v > 0


def test_mesh_gspmd_arm_smoke():
    """The round-5 `bench.py --mesh gspmd` arm end-to-end on the
    (CPU-forced) virtual device: the GSPMD-scan program must build,
    place its TP-sharded state, and interleave against DP-scan + plain
    without error. Tiny geometry; one round, one chunk."""
    res = bench.measure_train_mesh(
        8, 4, n_steps=2, warmup=2, steps_per_call=2, n_data=8, rounds=1,
        lhs_ab=False, gspmd_ab=True)
    assert res["gspmd_img_s"] > 0
    assert res["mesh_img_s"] > 0
    assert "gspmd_over_plain" in res
