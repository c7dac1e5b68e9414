"""Perf-regression floors (SURVEY.md §4.4 last row; VERDICT r4 task 5).

The floor VALUES live in bench_configs.FLOORS / bench.HEADLINE_FLOOR
and are documented with provenance in BASELINE.md; the check logic is
unit-tested here (CPU), and the hardware run enforces them via
`python bench.py --assert` / `python bench_configs.py --assert`
(exercised end-to-end by the tpu-marked test below)."""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench
import bench_configs


def test_floor_values_sane():
    # every floor is positive and below the WORST round-5 measured
    # number (a floor above observed perf would fail on normal weather)
    # and within 2.5x of the round-4/5 best (loose floors miss real
    # regressions — VERDICT r4 weak #3)
    worst_r5 = {"1_single_file_cbr_decode": 62.6,
                "2_vbr_joint_stereo_decode": 58.3,
                "4_player_seek_gapless_dsp": 22.7,
                "5_encode_path_single": 16.5,
                "5_encode_batch_aggregate": 55.3}
    best = {"1_single_file_cbr_decode": 112.3,
            "2_vbr_joint_stereo_decode": 111.7,
            "4_player_seek_gapless_dsp": 38.3,
            "5_encode_path_single": 20.4,
            "5_encode_batch_aggregate": 74.7}
    for cfg, floor in bench_configs.FLOORS.items():
        assert 0 < floor < worst_r5[cfg], (cfg, floor)
        assert floor >= best[cfg] / 2.9, (cfg, floor)
    assert 1000.0 <= bench.HEADLINE_FLOOR <= 2397.9


def test_check_floors_logic():
    results = [
        {"config": "1_single_file_cbr_decode", "x_realtime": 60.0},
        {"config": "4_player_seek_gapless_dsp", "x_realtime": 3.0},
        {"config": "3_batched_256_resample48k", "see": "bench.py"},
        {"config": "unknown_config", "x_realtime": 0.1},
    ]
    bad = bench_configs.check_floors(results)
    assert bad == [("4_player_seek_gapless_dsp", 3.0, 18.0)]
    # a regression in every config is fully reported
    low = [{"config": c, "x_realtime": 0.5} for c in bench_configs.FLOORS]
    assert len(bench_configs.check_floors(low)) == len(bench_configs.FLOORS)
    # all-good passes
    ok = [{"config": c, "x_realtime": f + 1}
          for c, f in bench_configs.FLOORS.items()]
    assert bench_configs.check_floors(ok) == []


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("MP3TPU_TEST_PLATFORM") != "tpu",
                    reason="hardware floor enforcement runs on TPU only")
def test_bench_configs_floors_on_hardware():
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench_configs.py"),
         "--assert"], capture_output=True, text=True, timeout=3600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert '"floors": "ok"' in out.stdout
