"""Reduced scheduler soak/chaos session (SURVEY.md §5.2-§5.3; the
hour-scale run lives in tools/soak.py, its committed snapshot in
docs/soak_r03.json). Same harness, ~4 minutes of audio: elastic
refill churn, corrupt-stream injection, live ring consumers — zero
crashes, no starvation, bounded memory, exact accounting."""
import numpy as np
import pytest

import soak


@pytest.mark.slow
def test_soak_scheduler_chaos_session():
    rep = soak.run_soak(total_audio_s=240.0, wave_streams=12)
    assert rep["n_streams"] >= 30
    assert rep["n_corrupted"] >= 3
    assert rep["n_ring_consumers"] >= 2
    # zero underruns: every wave decodes faster than realtime, so a
    # 1x-paced consumer with one-window buffering never starves
    assert rep["min_wave_x"] >= 1.0, rep["waves"]
    # stable throughput: no decay across the session
    assert rep["last_third_x"] >= 0.6 * rep["first_third_x"], rep
    # bounded RSS after the warmup wave's jit compiles
    assert rep["rss_growth_post_warmup_mb"] < 300.0, rep
    # exact accounting survived the chaos
    m = rep["metrics"]
    assert m["streams_finished"] == rep["n_streams"]
    assert rep["clean_streams_checked"] >= 1
    assert rep["ring_samples_drained"] > 0
