"""Fuzzing the native unpacker (SURVEY.md §5.2): it parses untrusted
bytes and must never crash or scribble. Runs with faulthandler armed;
the Makefile `asan` target builds an ASan/UBSan variant for deeper CI."""
import faulthandler
import os

import numpy as np
import pytest

from mp3tpu.bitstream.native import available, unpack_native
from mp3tpu.bitstream.unpack import unpack
from mp3tpu.container.frames import scan_frames

import fixtures

faulthandler.enable()


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_fuzz_random_bytes():
    rng = np.random.default_rng(42)
    for _ in range(50):
        n = int(rng.integers(8, 20000))
        junk = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        st = unpack_native(junk)   # None or a valid SymbolTensors
        if st is not None:
            assert st.n_granules >= 1


@pytest.mark.skipif(not available(), reason="native unpacker unavailable")
def test_fuzz_mutated_stream_parity():
    """Bit-flipped real streams: native and Python paths must agree
    exactly even on garbage (same error policy)."""
    pytest.importorskip("lameref")
    base = bytearray(fixtures.lame_fixture("sweep", ch=2, bitrate=128,
                                           mode="jstereo"))
    rng = np.random.default_rng(7)
    for trial in range(8):
        bad = bytearray(base)
        for _ in range(40):
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
        data = bytes(bad)
        try:
            a = unpack(data)
        except ValueError:
            continue
        b = unpack_native(data)
        assert b is not None
        for f in ("is_", "exp", "block_type", "mixed", "smode", "errors",
                  "huff_slack", "lines_used"):
            assert np.array_equal(getattr(a, f), getattr(b, f)), (trial, f)


def test_crc_detection():
    """CRC-protected frames with corrupted side info must fail the check
    (ISO §2.4.3.1); our LAME fixtures are unprotected so craft one."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from craft import GranuleSpec, craft_frame
    frame = bytearray(craft_frame(GranuleSpec()))
    # flip protection bit on (bit 16 of header = byte1 LSB)
    frame[1] &= 0xFE
    # insert a CRC16 placeholder after the header (frame grows by 2)
    protected = bytes(frame[:4]) + b"\x12\x34" + bytes(frame[4:-2])
    from mp3tpu.container.frames import check_crc16, parse_header
    buf = np.frombuffer(protected, np.uint8)
    h = parse_header(int.from_bytes(protected[:4], "big"))
    assert h.crc_protected
    assert not check_crc16(buf, 0, h)  # placeholder CRC must fail


def test_asan_fuzz_driver():
    """Build and run the ASan/UBSan fuzz driver against random bytes and
    a mutated real stream (SURVEY.md §5.2 sanitizer CI variant)."""
    import shutil
    import subprocess
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "src", "mp3tpu", "native")
    r = subprocess.run(["make", "-s", "-C", d, "fuzz_driver"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")
    r = subprocess.run([os.path.join(d, "fuzz_driver"), "100"], input=mp3,
                       capture_output=True, timeout=300)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert b"fuzz ok" in r.stdout
