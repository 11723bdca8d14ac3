"""Unit tests for bench.py's scaling estimator — the north-rule record
math (matched-window median, peak reporting, direction-neutral
throttle-retry, pair-first phase ordering) exercised deterministically
with fake workers, no Spark, no subprocesses."""
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

# phase-1 schedule: 9 matched (2, 8) repeats before any retry/phase-2
N_PAIR = 9


def _fake_worker_factory(schedule, calls=None):
    iters = {c: iter(v) for c, v in schedule.items()}

    def fake(cores, staged, rep):
        if calls is not None:
            calls.append((cores, rep))
        rps = next(iters[cores])
        return {"cores": cores, "sec": 1.0, "rows": int(rps), "rps": rps}

    return fake


def test_scaling_median_peak_and_retry(monkeypatch):
    """A throttled local[8] window (>2x below that level's median) is
    re-run as a matched pair; the headline stays the MEDIAN of the
    matched-window ratios; raw pre-retry runs are published."""
    monkeypatch.setattr(bench, "CPUS", 32)
    schedule = {
        # 6 pair reps + 1 retry draw for the flagged rep
        2: [100.0] * N_PAIR + [100.0],
        # rep 1 throttled; retry draw 400; then 3 phase-2 draws
        8: [400.0, 100.0] + [400.0] * (N_PAIR - 2) + [400.0] + [400.0] * 3,
        32: [400.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule))
    scaling, pairs, detector = bench._run_scaling("/unused")
    assert pairs["2->8"] == 1.0
    assert pairs["2->8_peak"] >= 1.0
    assert pairs["2->8_runs"] == [1.0] * N_PAIR
    assert detector["retried_reps"] == [1]
    # the raw (pre-retry) record keeps the throttled 100 rps sample
    assert detector["runs_raw_rps"][8][1] == 100.0
    assert detector["runs_raw_rps"][2][1] == 100.0
    # per-level bests reflect post-retry values
    assert scaling[8]["rps"] == 400.0
    assert pairs["8->32"] == 0.25            # DRAM-ceiling level, honest
    assert pairs["8->32_runs"] == [0.25] * 3  # matched (8,32) phase-2 reps


def test_scaling_no_retry_when_inside_band(monkeypatch):
    """Samples within [0.88, 1/0.88] of each level's median never
    re-run, and the median is reported as-is (no silent peak
    promotion)."""
    monkeypatch.setattr(bench, "CPUS", 32)
    schedule = {
        2: [100.0, 110.0, 90.0, 105.0, 95.0, 100.0, 102.0, 98.0, 100.0],
        8: [320.0, 360.0, 300.0, 340.0, 310.0, 320.0, 325.0, 315.0,
            320.0] + [320.0] * 3,
        32: [500.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule))
    scaling, pairs, detector = bench._run_scaling("/unused")
    assert detector == {}                    # nothing retried
    runs = pairs["2->8_runs"]
    assert len(runs) == N_PAIR
    assert pairs["2->8"] == round(statistics.median(runs), 3)  # not max
    assert pairs["2->8_peak"] == round(max(
        runs + [(scaling[8]["rps"] / scaling[2]["rps"]) / 4]), 3)


def test_scaling_retry_direction_neutral_on_burst(monkeypatch):
    """A BURST (not throttle) on the high level also re-runs — the
    detector is direction-neutral, so lucky windows can't inflate the
    record any more than unlucky ones can deflate it."""
    monkeypatch.setattr(bench, "CPUS", 32)
    schedule = {
        2: [100.0] * N_PAIR + [100.0],
        8: [320.0, 800.0] + [320.0] * (N_PAIR - 2)   # rep 1 bursts 2.5x
           + [320.0] + [320.0] * 3,
        32: [500.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule))
    scaling, pairs, detector = bench._run_scaling("/unused")
    assert detector["retried_reps"] == [1]
    assert pairs["2->8_runs"] == [0.8] * N_PAIR


def test_scaling_band_catches_mild_throttle(monkeypatch):
    """The widened ±12% band re-runs a window whose level sample sits
    only ~13% off its median — the round-3 record's 0.726/0.741 windows
    were exactly this shape and survived the old 2x band."""
    monkeypatch.setattr(bench, "CPUS", 32)
    schedule = {
        2: [100.0] * N_PAIR + [100.0],
        # rep 2 runs 13% below the level median of 320, retry draws 320
        8: [320.0, 320.0, 278.0] + [320.0] * (N_PAIR - 3)
           + [320.0] + [320.0] * 3,
        32: [500.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule))
    scaling, pairs, detector = bench._run_scaling("/unused")
    assert detector["retried_reps"] == [2]
    assert pairs["2->8_runs"] == [0.8] * N_PAIR


def test_scaling_window_order_alternates(monkeypatch):
    """Within-window run order flips (lo,hi)/(hi,lo) between repeats so
    the host's within-window heating penalizes each level equally often
    instead of always the second runner."""
    monkeypatch.setattr(bench, "CPUS", 32)
    calls: list[tuple[int, int]] = []
    schedule = {
        2: [100.0] * N_PAIR,
        8: [320.0] * N_PAIR + [320.0] * 3,
        32: [500.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule, calls))
    bench._run_scaling("/unused")
    pair_calls = [c for c, _ in calls][:2 * N_PAIR]
    for rep in range(N_PAIR):
        window = pair_calls[2 * rep:2 * rep + 2]
        assert window == ([2, 8] if rep % 2 == 0 else [8, 2])


def test_scaling_pair_runs_before_top_level(monkeypatch):
    """Phase ordering: every headline-pair (2, 8) repeat — including
    retries — completes BEFORE the first bandwidth-saturating top-level
    (32) run, so the pair's matched windows get the coolest host."""
    monkeypatch.setattr(bench, "CPUS", 32)
    calls: list[tuple[int, int]] = []
    schedule = {
        2: [100.0] * N_PAIR,
        8: [320.0] * N_PAIR + [320.0] * 3,
        32: [500.0] * 3,
    }
    monkeypatch.setattr(bench, "_run_scaling_worker",
                        _fake_worker_factory(schedule, calls))
    bench._run_scaling("/unused")
    first_top = next(i for i, (c, _) in enumerate(calls) if c == 32)
    assert all(c != 2 for c, _ in calls[first_top:])
    # phase 2 pairs (8, 32) within each repeat for the 8->32 ratios
    assert [c for c, _ in calls[first_top - 1:]] == [8, 32] * 3
