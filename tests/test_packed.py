"""12-bit packed spectrum plane: device unpack parity and escape/overflow
handling (transfer-optimized path used by the batch scheduler/bench)."""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from mp3tpu.bitstream.native import available, unpack_native, unpack_native_into12
from mp3tpu.kernels import pipeline as kp

import fixtures


def test_unpack12_device_roundtrip():
    """numpy-pack -> device unpack12 == original, incl. escapes."""
    rng = np.random.default_rng(0)
    v = rng.integers(-2047, 2048, (4, 2, 576)).astype(np.int32)
    v[0, 0, 5] = 8206   # escapes
    v[0, 0, 9] = -3000
    clamped = np.clip(v, -2047, 2047)
    a = clamped[..., 0::2] & 0xFFF
    b = clamped[..., 1::2] & 0xFFF
    packed = np.zeros((4, 2, 864), np.uint8)
    packed[..., 0::3] = a >> 4
    packed[..., 1::3] = ((a & 0xF) << 4) | (b >> 8)
    packed[..., 2::3] = b & 0xFF
    esc_pos = np.full((4, 2, 16), -1, np.int16)
    esc_val = np.zeros((4, 2, 16), np.int16)
    esc_pos[0, 0, 0], esc_val[0, 0, 0] = 5, 8206
    esc_pos[0, 0, 1], esc_val[0, 0, 1] = 9, -3000
    out = np.asarray(kp.unpack12(jnp.asarray(packed), jnp.asarray(esc_pos),
                                 jnp.asarray(esc_val)))
    assert np.array_equal(out, v)


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_packed_decode_matches_int16():
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    st = unpack_native(mp3)
    G = st.n_granules
    is12 = np.zeros((G, 2, 864), np.uint8)
    esc = np.zeros((G, 2, 16, 2), np.int16)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    ok = unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is12, esc)
    assert ok
    W = 32
    a, _ = kp.decode_window_i16(
        jnp.asarray(st.is_[:W][None]), jnp.asarray(exp[:W][None]),
        jnp.asarray(bt[:W][None]), jnp.asarray(mx[:W][None].astype(bool)),
        jnp.asarray(sm[:W][None]), kp.init_state(1), 44100)
    b, _ = kp.decode_window_packed_i16(
        jnp.asarray(is12[:W][None]), jnp.asarray(esc[:W][None]),
        jnp.asarray(exp[:W][None]), jnp.asarray(bt[:W][None]),
        jnp.asarray(mx[:W][None].astype(bool)), jnp.asarray(sm[:W][None]),
        kp.init_state(1), 44100)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_unpack8_device_roundtrip():
    """int8 plane -> device unpack8 == original, incl. escapes."""
    rng = np.random.default_rng(1)
    v = rng.integers(-127, 128, (4, 2, 576)).astype(np.int32)
    v[1, 1, 3] = 766    # escapes (>127)
    v[1, 1, 7] = -8206
    clamped = np.clip(v, -127, 127).astype(np.int8)
    esc_pos = np.full((4, 2, 16), -1, np.int16)
    esc_val = np.zeros((4, 2, 16), np.int16)
    esc_pos[1, 1, 0], esc_val[1, 1, 0] = 3, 766
    esc_pos[1, 1, 1], esc_val[1, 1, 1] = 7, -8206
    out = np.asarray(kp.unpack8(jnp.asarray(clamped), jnp.asarray(esc_pos),
                                jnp.asarray(esc_val)))
    assert np.array_equal(out, v)


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_packed8_decode_matches_int16():
    """The 8-bit plane + sideband decodes bit-identically to the int16
    plane on content that exercises the escape path (values > 127)."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    st = unpack_native(mp3)
    G = st.n_granules
    is8 = np.zeros((G, 2, 576), np.int8)
    esc = np.zeros((G, 2, 16, 2), np.int16)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    ok = unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is8, esc,
                              plane_bits=8)
    assert ok
    # the sideband is real on this fixture (values above 127 exist)
    if int((np.abs(st.is_) > 127).sum()) > 0:
        assert int((esc[..., 0] >= 0).sum()) > 0
    # reconstruction == exact int16 plane
    rec = np.asarray(kp.unpack8(
        jnp.asarray(is8), jnp.asarray(np.ascontiguousarray(esc[..., 0])),
        jnp.asarray(np.ascontiguousarray(esc[..., 1]))))
    assert np.array_equal(rec, st.is_.astype(np.int32))
    W = 32
    a, _ = kp.decode_window_i16(
        jnp.asarray(st.is_[:W][None]), jnp.asarray(exp[:W][None]),
        jnp.asarray(bt[:W][None]), jnp.asarray(mx[:W][None].astype(bool)),
        jnp.asarray(sm[:W][None]), kp.init_state(1), 44100)
    b, _ = kp.decode_window_packed_i16(
        jnp.asarray(is8[:W][None]), jnp.asarray(esc[:W][None]),
        jnp.asarray(exp[:W][None]), jnp.asarray(bt[:W][None]),
        jnp.asarray(mx[:W][None].astype(bool)), jnp.asarray(sm[:W][None]),
        kp.init_state(1), 44100, plane_bits=8)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_unpack4_device_roundtrip():
    """nibble plane -> device unpack4 == original; the position-free
    two-level sideband lands escapes by marker rank (cumsum), deep
    (|v|>127) values by rank among -128 markers."""
    rng = np.random.default_rng(2)
    v = rng.integers(-7, 8, (4, 2, 576)).astype(np.int32)
    v[2, 0, 4] = 120    # escapes (>7), in line order
    v[2, 0, 11] = -8206  # deep escape (|v| > 127)
    v[2, 0, 570] = 33
    clamped = np.clip(v, -7, 7) + 7
    for i in (4, 11, 570):
        clamped[2, 0, i] = 15   # escape marker nibble
    packed = (clamped[..., 0::2] | (clamped[..., 1::2] << 4)).astype(np.uint8)
    esc = np.zeros((4, 2, 80), np.int8)
    esc[2, 0, :3] = [120, -128, 33]
    esc.view(np.uint8)[2, 0, 64] = (-8206) & 255   # lo byte of deep value 0
    esc[2, 0, 72] = np.int8((-8206) >> 8)          # hi byte
    out = np.asarray(kp.unpack4(jnp.asarray(packed), jnp.asarray(esc)))
    assert np.array_equal(out, v)


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_packed4_decode_matches_int16():
    """The 4-bit nibble plane + position-free 64-slot sideband decodes
    bit-identically to the int16 plane (|v|>7 is common at 128 kbps)."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    st = unpack_native(mp3)
    G = st.n_granules
    is4 = np.zeros((G, 2, 288), np.uint8)
    esc = np.zeros((G, 2, 80), np.int8)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    ok = unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is4, esc,
                              plane_bits=4)
    assert ok
    assert int((np.abs(st.is_) > 7).sum()) > 0   # sideband is real here
    assert int((esc != 0).sum()) > 0
    rec = np.asarray(kp.unpack4(jnp.asarray(is4), jnp.asarray(esc)))
    assert np.array_equal(rec, st.is_.astype(np.int32))
    W = 32
    a, _ = kp.decode_window_i16(
        jnp.asarray(st.is_[:W][None]), jnp.asarray(exp[:W][None]),
        jnp.asarray(bt[:W][None]), jnp.asarray(mx[:W][None].astype(bool)),
        jnp.asarray(sm[:W][None]), kp.init_state(1), 44100)
    b, _ = kp.decode_window_packed_i16(
        jnp.asarray(is4[:W][None]), jnp.asarray(esc[:W][None]),
        jnp.asarray(exp[:W][None]), jnp.asarray(bt[:W][None]),
        jnp.asarray(mx[:W][None].astype(bool)), jnp.asarray(sm[:W][None]),
        kp.init_state(1), 44100, plane_bits=4)
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_packed4_overflow_falls_back():
    """>64 |v|>7 escapes per granule-channel (hi-rate content) must be
    refused so callers widen to the 8-bit plane."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("sweep", ch=2, bitrate=320, mode="stereo")
    st = unpack_native(mp3)
    if int((np.abs(st.is_.reshape(-1, 576)) > 7).sum(-1).max()) <= 64:
        pytest.skip("fixture never overflows the 4-bit sideband")
    G = st.n_granules
    is4 = np.zeros((G, 2, 288), np.uint8)
    esc = np.zeros((G, 2, 80), np.int8)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    assert not unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is4, esc,
                                    plane_bits=4)


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_packed_overflow_falls_back():
    """>16 escapes per granule-channel (hi-rate content) must be refused
    so callers fall back to the exact int16 plane."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("sweep", ch=2, bitrate=320, mode="stereo")
    st = unpack_native(mp3)
    if int((np.abs(st.is_) > 2047).sum()) == 0:
        pytest.skip("fixture has no large values")
    G = st.n_granules
    is12 = np.zeros((G, 2, 864), np.uint8)
    esc = np.zeros((G, 2, 16, 2), np.int16)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    ok = unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is12, esc)
    assert not ok


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_fused_resample_matches_reference():
    """decode+resample fused jit == decode then dsp.Resampler."""
    pytest.importorskip("lameref")
    from mp3tpu.dsp.resample import Resampler
    mp3 = fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")
    st = unpack_native(mp3)
    G = st.n_granules
    is12 = np.zeros((G, 2, 864), np.uint8)
    esc = np.zeros((G, 2, 16, 2), np.int16)
    exp = np.zeros((G, 2, 64), np.int16)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    assert unpack_native_into12(mp3, G, None, exp, bt, mx, sm, is12, esc)
    W = 32
    args = (jnp.asarray(is12[:W][None]), jnp.asarray(esc[:W][None]),
            jnp.asarray(exp[:W][None]), jnp.asarray(bt[:W][None]),
            jnp.asarray(mx[:W][None].astype(bool)), jnp.asarray(sm[:W][None]))
    fused, _, _ = kp.decode_window_packed_resampled_i16(
        *args, kp.init_state(1), kp.init_resample_state(1, 44100), 44100, 48000)
    pcm, _ = kp.decode_window_packed_i16(*args, kp.init_state(1), 44100)
    rs = Resampler(44100, 48000)
    ref, _ = rs(jnp.asarray(np.asarray(pcm)[0].astype(np.float32) / 32768.0))
    ref16 = np.asarray(kp.quantize_i16(ref))
    got = np.asarray(fused)[0]
    n = min(len(got), len(ref16))
    d = np.abs(got[:n].astype(np.int32) - ref16[:n].astype(np.int32))
    assert d.max() <= 1  # fused path quantizes once; reference twice


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_exp_byte_plane_matches_int16():
    """The compact uint8[65] exponent plane ([gg, offset+128]) decodes
    bit-identically to the int16[64] exponents."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    st = unpack_native(mp3)
    G = st.n_granules
    is4 = np.zeros((G, 2, 288), np.uint8)
    esc = np.zeros((G, 2, 80), np.int8)
    expb = np.zeros((G, 2, 65), np.uint8)
    bt = np.zeros((G, 2), np.int8)
    mx = np.zeros((G, 2), np.uint8)
    sm = np.zeros((G, 64), np.uint8)
    ok = unpack_native_into12(mp3, G, None, expb, bt, mx, sm, is4, esc,
                              plane_bits=4 | 0x10)
    assert ok
    # reconstruction: exp = gg - 210 + (off - 128) on every slot a
    # flavor can read (61-63 are dead; the int16 plane holds zeros there)
    rec = (expb[..., :1].astype(np.int32) - 210) + \
        (expb[..., 1:].astype(np.int32) - 128)
    assert np.array_equal(rec[..., :61], st.exp[..., :61].astype(np.int32))
    W = 32
    a, _ = kp.decode_window_i16(
        jnp.asarray(st.is_[:W][None]), jnp.asarray(st.exp[:W][None]),
        jnp.asarray(bt[:W][None]), jnp.asarray(mx[:W][None].astype(bool)),
        jnp.asarray(sm[:W][None]), kp.init_state(1), 44100)
    b, _ = kp.decode_window_packed_i16(
        jnp.asarray(is4[:W][None]), jnp.asarray(esc[:W][None]),
        jnp.asarray(expb[:W][None]), jnp.asarray(bt[:W][None]),
        jnp.asarray(mx[:W][None].astype(bool)), jnp.asarray(sm[:W][None]),
        kp.init_state(1), 44100, plane_bits=4)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_arena_regroup_matches_host_carve():
    """The staging-arena splitter (one device_put per stream group) must
    reproduce exactly the tensors host-side carving produces."""
    n_win, Sg, win, n_groups = 2, 2, 4, 3
    total, layout = kp.arena_layout(n_win, Sg, win)
    rng = np.random.default_rng(0)
    arenas = [rng.integers(0, 256, total, dtype=np.uint8)
              for _ in range(n_groups)]
    got = kp.regroup_device_arenas([jnp.asarray(a) for a in arenas],
                                   n_win, Sg, win)
    order = ("is12", "esc", "exp", "bt", "mx", "smode")
    ref = {k: [] for k in order}
    for a in arenas:
        for k, off, shp, dt in layout:
            n = int(np.prod(shp))
            ref[k].append(a[off:off + n].view(dt).reshape(shp))
    # regroup_device_arenas returns (is12, esc, exp, bt, mx, smode)
    for i, k in enumerate(order):
        assert np.array_equal(np.asarray(got[i]),
                              np.concatenate(ref[k], axis=1)), k
