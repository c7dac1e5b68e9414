"""Repeat-listening session speedup from the device group cache.

The reference's core usage (/root/reference/README.md:46) replays the
same sentence N times; mp3tpu's Player keeps the decoded group's device
PCM in a two-entry cache (player/engine.py `_group_cache`), so repeat
passes cost zero decode dispatches (pinned by
tests/test_player.py::test_loop_reuses_decoded_group). This tool puts a
NUMBER on that in config-4 conditions (player + seek + gain + gapless,
hardware): wall time of `loop(a, b, times=N)` vs N x the times=1 wall,
plus the decode-granule counts proving the cache (not warm compiles)
is what you're seeing. Run alone (single-tenant TPU tunnel). Prints one
JSON line."""
import json
import os
import sys
import time

_R = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_R, "src"))
sys.path.insert(0, os.path.join(_R, "tools"))
sys.path.insert(0, _R)


def _session(mp3, a, b, times):
    from mp3tpu.player import Player
    p = Player(mp3, gain_db=-3.0)
    t0 = time.perf_counter()
    p.loop(a, b, times=times)
    wall = time.perf_counter() - t0
    return wall, p.metrics.granules_decoded, len(p.sink.pcm)


def main(times: int = 5, seconds: float = 12.0):
    from bench import _fixture_mp3
    mp3 = _fixture_mp3(seconds)
    a, b = 1.0, 6.0
    _session(mp3, a, b, 1)          # warmup: compile at session shapes
    t1, g1, n1 = _session(mp3, a, b, 1)
    tn, gn, nn = _session(mp3, a, b, times)
    assert nn == times * n1, (nn, times, n1)
    # the cache claim: repeats decode NOTHING beyond the first pass
    assert gn == g1, (gn, g1)
    print(json.dumps({
        "metric": "repeat_session_speedup", "value": round(times * t1 / tn, 2),
        "unit": f"x_vs_{times}x_uncached",
        "detail": {"segment_s": b - a, "times": times,
                   "wall_times1_s": round(t1, 3),
                   f"wall_times{times}_s": round(tn, 3),
                   "granules_decoded_times1": g1,
                   f"granules_decoded_times{times}": gn,
                   "repeat_pass_s": round((tn - t1) / (times - 1), 4)}}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
