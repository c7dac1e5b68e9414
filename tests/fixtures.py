"""Deterministic test-signal generators + fixture cache (SURVEY.md F5/§4.3).

All MP3 fixtures are generated at test time (no binary assets in git):
real-world encodings via the system LAME library (trust anchor), plus
hand-crafted streams via tools/craft.py.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def tone_sweep(seconds: float, sr: int, ch: int = 2) -> np.ndarray:
    """Exponential sine sweep + harmonics; stereo gets decorrelated phase."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0, f1 = 40.0, min(0.45 * sr, 16000.0)
    k = np.log(f1 / f0)
    phase = 2 * np.pi * f0 * (np.exp(t / t[-1] * k) - 1) * t[-1] / k
    sig = 0.45 * np.sin(phase) + 0.2 * np.sin(2.3 * phase)
    if ch == 1:
        return sig[:, None]
    rphase = phase * 1.003 + 0.7
    return np.stack([sig, 0.45 * np.sin(rphase) + 0.1 * np.sin(3.1 * rphase)], 1)


def transients(seconds: float, sr: int, ch: int = 2) -> np.ndarray:
    """Click train + noise bursts — forces short/mixed block switching."""
    n = int(seconds * sr)
    rng = np.random.default_rng(1234)
    sig = 0.02 * rng.standard_normal((n, ch))
    period = sr // 7
    for i in range(0, n - 400, period):
        burst = rng.standard_normal((300, ch)) * np.hanning(300)[:, None]
        sig[i:i + 300] += 0.8 * burst
    return np.clip(sig, -0.99, 0.99)


def tonal_stereo(seconds: float, sr: int) -> np.ndarray:
    """Highly correlated stereo — encourages MS + intensity coding."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    base = sum(0.12 * np.sin(2 * np.pi * f * t + f) for f in
               (220.0, 440.0, 659.0, 880.0, 1320.0, 3520.0, 7040.0, 11000.0))
    lr = np.stack([base, base * 0.55 + 0.001 * np.sin(2 * np.pi * 9000 * t)], 1)
    return lr.astype(np.float64)


def silence(seconds: float, sr: int, ch: int = 2) -> np.ndarray:
    return np.zeros((int(seconds * sr), ch))


# "sentence" spans of the bursts() fixture, in seconds
BURST_SPANS = [(0.30, 1.10), (1.55, 2.15), (2.65, 3.35)]
BURST_TOTAL = 3.70


def bursts(seconds: float, sr: int, ch: int = 2) -> np.ndarray:
    """Speech-like modulated tone bursts at BURST_SPANS separated by
    silence — the segmentation fixture (`seconds` is ignored; the
    pattern is fixed so tests know the boundaries)."""
    n = int(BURST_TOTAL * sr)
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for k, (a, b) in enumerate(BURST_SPANS):
        i, j = int(a * sr), int(b * sr)
        seg = t[i:j] - a
        tone = 0.4 * np.sin(2 * np.pi * (180 + 60 * k) * seg) \
            + 0.2 * np.sin(2 * np.pi * (700 + 150 * k) * seg)
        tone *= 0.6 + 0.4 * np.sin(2 * np.pi * 4.0 * seg)  # syllable AM
        r = max(1, int(0.012 * sr))                        # 12 ms ramps
        envl = np.ones(j - i)
        envl[:r] = np.linspace(0, 1, r)
        envl[-r:] = np.linspace(1, 0, r)
        sig[i:j] = tone * envl
    return np.repeat(sig[:, None], ch, axis=1)


def lsf_fixture(sample_rate: int = 11025, frames: int = 40,
                bitrate_idx: int = 8, seed: int = 3) -> bytes:
    """Self-hosted LSF (MPEG-2 / MPEG-2.5) mono stream with real
    spectral content on every host — no external sample file needed
    (VERDICT r4 task 4; SURVEY.md §4.3 hand-assembled streams).

    Each frame carries a deterministic decaying random spectrum,
    entropy-coded by the encoder's own Huffman emitter (huffcode.
    encode_granule — big-values tables, count1 quads and the region
    split from the target rate's LONG band table are all version-
    independent) and wrapped in hand-assembled LSF mono frames
    (tools/craft.craft_frame_lsf_mono: 1 granule, 9-byte side info,
    8-bit main_data_begin, no preflag). scalefac_compress stays 0, so
    part2 is empty under BOTH the MPEG-1 and the LSF slen partitioning
    — the payload is valid for either interpretation, and libmpg123
    (where present) anchors the LSF one."""
    key = ("lsf", sample_rate, frames, bitrate_idx, seed)
    if key not in _CACHE:
        from craft import (BITRATES_V2, GranuleSpec, craft_frame_lsf_mono)
        from mp3tpu.encoder.huffcode import encode_granule
        cap_bits = (72 * BITRATES_V2[bitrate_idx] * 1000 // sample_rate
                    - 13) * 8
        rng = np.random.default_rng(seed)
        out = []
        for f in range(frames):
            n_big = int(rng.integers(40, 140)) & ~1     # even line count
            n_c1 = int(rng.integers(0, 10)) * 4
            scale = 9.0 * (0.4 + 0.6 * rng.random())
            while True:
                i = np.arange(n_big)
                mag = np.rint(scale * np.exp(-i / 60.0)
                              * np.abs(rng.standard_normal(n_big)))
                ix = np.zeros(576, np.int64)
                ix[:n_big] = np.clip(mag, 0, 13) * \
                    rng.choice([-1, 1], n_big)
                ix[n_big:n_big + n_c1] = rng.integers(-1, 2, n_c1)
                g = encode_granule(ix, gg=170, sample_rate=sample_rate)
                if g.part2_3_length <= cap_bits:
                    break
                scale *= 0.7                            # rare: too dense
            by = g.bits.to_bytes()
            bits = "".join(format(b, "08b") for b in by)[:g.part2_3_length]
            spec = GranuleSpec(
                part2_3_length=g.part2_3_length, big_values=g.big_values,
                global_gain=g.global_gain, scalefac_compress=0,
                table_select=g.table_select,
                region0_count=g.region0_count,
                region1_count=g.region1_count,
                count1table_select=g.count1table_select, main_bits=bits)
            out.append(craft_frame_lsf_mono(spec, sample_rate,
                                            bitrate_idx))
        _CACHE[key] = b"".join(out)
    return _CACHE[key]


_CACHE: dict = {}


def lame_fixture(name: str, **kw) -> bytes:
    """Cached LAME encodings of the named deterministic signal."""
    key = (name, tuple(sorted(kw.items())))
    if key not in _CACHE:
        import lameref
        sr = kw.pop("sr", 44100)
        ch = kw.pop("ch", 2)
        seconds = kw.pop("seconds", 2.0)
        gen = {"sweep": tone_sweep, "transients": transients,
               "tonal": tonal_stereo, "silence": silence,
               "bursts": bursts}[name]
        sig = gen(seconds, sr) if name == "tonal" else gen(seconds, sr, ch)
        _CACHE[key] = lameref.encode(sig, sr, **kw)
    return _CACHE[key]


def own_fixture(name: str = "sweep", sr: int = 44100, seconds: float = 1.0,
                **kw) -> bytes:
    """Fixtures produced by mp3tpu's OWN encoder (SURVEY.md F5: the
    fixture generator reuses E1-E6 once it exists)."""
    key = ("own", name, sr, seconds, tuple(sorted(kw.items())))
    if key not in _CACHE:
        from mp3tpu.encoder import encode_pcm
        gen = {"sweep": tone_sweep, "transients": transients,
               "tonal": tonal_stereo, "silence": silence}[name]
        sig = gen(seconds, sr) if name == "tonal" else gen(seconds, sr, 2)
        _CACHE[key] = encode_pcm(sig, sr, **kw)
    return _CACHE[key]
