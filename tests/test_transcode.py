"""Device-resident transcode (SURVEY.md §3.2 + §3.4 chained):
decode_batch(output="device") -> encode_batch consumes the decoded
int16 PCM straight from HBM — no staging H2D, no decode D2H. The
contract: byte-identical MP3s to encoding the handle's .numpy() PCM
(same dequantization, same executables), with block-type labels from
the device sub-block-energy reduction matching the host decision
logic on real transient material."""
import numpy as np
import pytest

import mp3tpu
from mp3tpu.encoder import encode_batch
from mp3tpu.pipeline import decode_files

import fixtures


@pytest.fixture(scope="module")
def stereo_mp3s():
    pytest.importorskip("lameref")
    return [
        fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo"),
        fixtures.lame_fixture("tonal", seconds=1.2, bitrate=160),
        fixtures.lame_fixture("bursts", ch=2, bitrate=128, mode="jstereo"),
    ]


def _host_pcms(handle):
    """What the host-input path would encode: the handle's PCM as the
    float values the int16-origin staging dequantizes to."""
    return [p.astype(np.float64) / 32768.0 for p, _sr in handle.numpy()]


def test_transcode_matches_host_encode(stereo_mp3s):
    """Long-blocks encode: the device-input path is byte-identical to
    encoding the materialized PCM (labels are trivially equal, the
    spectra come from the same executable on the same values)."""
    handle = mp3tpu.decode_batch(stereo_mp3s, output="device")
    got = encode_batch(handle, bitrate=112, short_blocks=False)
    ref = encode_batch(_host_pcms(handle), 44100, bitrate=112,
                       short_blocks=False)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g == r


def test_transcode_short_blocks_labels(stereo_mp3s):
    """Transient material with short_blocks on: the device energy
    reduction (f32) must reproduce the host labels (f64) — the attack
    thresholds sit orders of magnitude off the margins on real onsets
    — making the full output byte-identical."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128,
                                mode="jstereo")
    handle = mp3tpu.decode_batch([mp3], output="device")
    # label-level agreement, diagnosed directly
    from mp3tpu.encoder.device import _gather_rows_jit, _subblock_energy_jit
    from mp3tpu.encoder.psymodel import (MDCT_ALIGN, align_to_mdct,
                                         block_type_sequence,
                                         block_types_from_subblock_energy)
    from mp3tpu.encoder import ENCODER_DELAY, SPF
    pcm, sr = handle.numpy(0)
    n = len(pcm)
    G = -(-(n + ENCODER_DELAY + 529) // SPF)
    G += G & 1
    padded = np.zeros((G * SPF, 2))
    padded[:n] = pcm.astype(np.float64) / 32768.0
    want = block_type_sequence(align_to_mdct(padded), sr)
    chunk, row, lo, hi, nch = handle.device_pcm(0)
    grab = _gather_rows_jit(G * SPF, nch)(
        chunk, np.array([row], np.int32), np.array([lo], np.int32),
        np.array([hi - lo], np.int32))
    e = np.asarray(_subblock_energy_jit(MDCT_ALIGN)(grab), np.float64)
    got_bt = block_types_from_subblock_energy(e[0, : G * 9])
    assert np.array_equal(got_bt, want)
    assert (got_bt == 2).any()          # the material really has shorts
    # and therefore the full encodes agree byte-for-byte
    out_dev = encode_batch(handle, bitrate=128, short_blocks=True)
    out_host = encode_batch(_host_pcms(handle), 44100, bitrate=128,
                            short_blocks=True)
    assert out_dev[0] == out_host[0]


def test_transcode_mono(stereo_mp3s):
    pytest.importorskip("lameref")
    mono = [fixtures.lame_fixture("sweep", ch=1, bitrate=96, mode="mono"),
            fixtures.lame_fixture("sweep", ch=1, bitrate=128, mode="mono",
                                  seconds=1.3)]
    handle = mp3tpu.decode_batch(mono, output="device")
    got = encode_batch(handle, bitrate=96)
    ref = encode_batch(_host_pcms(handle), 44100, bitrate=96)
    assert got == ref


def test_transcode_api_roundtrip(stereo_mp3s):
    """mp3tpu.transcode_batch end to end: outputs are valid MP3s whose
    decode matches the original audio (128 -> 96 kbps re-encode)."""
    outs = mp3tpu.transcode_batch(stereo_mp3s, bitrate=96)
    assert len(outs) == len(stereo_mp3s)
    for src, out in zip(stereo_mp3s, outs):
        p0, r0 = mp3tpu.decode(src)
        p1, r1 = mp3tpu.decode(out)
        assert r1 == r0
        n = min(len(p0), len(p1))
        assert n > 0.9 * len(p0)
        a = p0[:n].astype(np.float64) / 32768.0
        b = p1[:n].astype(np.float64) / 32768.0
        # 96 kbps re-encode of 128 kbps material stays close
        err = np.sqrt(np.mean((a - b) ** 2))
        ref = np.sqrt(np.mean(a ** 2)) + 1e-9
        assert err / ref < 0.2, (err, ref)


def test_transcode_host_fallback_records(stereo_mp3s):
    """A handle carrying host-fallback records transparently routes
    through the materialized host path — same bytes."""
    from mp3tpu.config import resolve, set_active
    set_active(resolve(decode={"use_native": False}))
    try:
        handle = decode_files(stereo_mp3s, output="device")
        got = encode_batch(handle, bitrate=112, short_blocks=False)
    finally:
        set_active(resolve())
    handle2 = mp3tpu.decode_batch(stereo_mp3s, output="device")
    ref = encode_batch(_host_pcms(handle2), 44100, bitrate=112,
                       short_blocks=False)
    assert got == ref


def test_transcode_rate_validation(stereo_mp3s):
    handle = mp3tpu.decode_batch(stereo_mp3s, output="device")
    with pytest.raises(ValueError, match="!= decoded"):
        encode_batch(handle, 48000, bitrate=128)
    with pytest.raises(ValueError, match="sample rate"):
        encode_batch([np.zeros(4096)], None, bitrate=128)
