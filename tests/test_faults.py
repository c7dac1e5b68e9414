"""Failure detection / fault injection (SURVEY.md §5.3, §4.3.3):
corrupted streams must never crash, must resync, and must account
errors; chunk-parallel decode must match sequential."""
import numpy as np
import pytest

from mp3tpu.bitstream.unpack import ERR_RESERVOIR, unpack
from mp3tpu.container import frames as fr
from mp3tpu.pipeline import decode_file, decode_symbols_chunked, load_symbols

import fixtures


@pytest.fixture(scope="module")
def mp3():
    pytest.importorskip("lameref")
    return fixtures.lame_fixture("sweep", ch=2, bitrate=128, mode="jstereo")


def test_truncated_stream(mp3):
    pcm, sr = decode_file(mp3[: len(mp3) // 3], gapless=False)
    assert len(pcm) > 10000


def test_midstream_garbage_resyncs(mp3):
    bad = bytearray(mp3)
    lo = len(bad) // 2
    bad[lo:lo + 800] = b"\xaa" * 800   # clobber ~2 frames
    st = unpack(bytes(bad))
    clean = unpack(mp3)
    # must keep most granules and never crash; damaged region flagged
    assert st.n_granules > clean.n_granules - 10
    pcm, _ = decode_file(bytes(bad), gapless=False)
    assert len(pcm) > 50000


def test_random_bytes_rejected():
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError):
        decode_file(junk)


def test_chaos_frame_corruption(mp3):
    """Randomly corrupt frames; decode must survive with errors counted."""
    rng = np.random.default_rng(7)
    idx = fr.scan_frames(np.frombuffer(mp3, np.uint8))
    bad = bytearray(mp3)
    hit = 0
    for off, h in zip(idx.offsets[2:], idx.headers[2:]):
        if rng.random() < 0.15:
            p = int(off) + 40
            bad[p:p + 30] = rng.integers(0, 256, 30, dtype=np.uint8).tobytes()
            hit += 1
    assert hit > 3
    st = unpack(bytes(bad))
    pcm, _ = decode_file(bytes(bad), gapless=False)
    assert len(pcm) > 50000  # playback never dies mid-stream


def test_reservoir_underflow_mutes():
    """A stream starting mid-file (cut frames) has dangling
    main_data_begin back-pointers: those granules must be muted and
    flagged, not crash."""
    pytest.importorskip("lameref")
    mp3 = fixtures.lame_fixture("transients", ch=2, bitrate=128, mode="jstereo")
    idx = fr.scan_frames(np.frombuffer(mp3, np.uint8))
    cut = bytes(mp3[int(idx.offsets[20]):])
    st = unpack(cut)
    assert (st.errors & ERR_RESERVOIR).any()
    # the flagged granules carry no spectrum (muted, not garbage)
    bad = (st.errors & ERR_RESERVOIR) != 0
    assert (st.is_[bad] == 0).all()
    pcm, _ = decode_file(cut, gapless=False)
    assert len(pcm) > 10000


def test_chunk_parallel_matches_sequential(mp3):
    st, _info, _ = load_symbols(mp3)
    ref, _ = decode_file(mp3, gapless=False)
    par = decode_symbols_chunked(st, chunk_granules=32, halo=2)
    from mp3tpu.kernels.pipeline import quantize_i16
    import jax.numpy as jnp
    par16 = np.asarray(quantize_i16(jnp.asarray(par)))
    n = min(len(ref), len(par16))
    d = np.abs(ref[:n].astype(np.int32) - par16[:n].astype(np.int32))
    assert d.max() <= 1 and (d == 0).mean() > 0.999
    # the fused int16 output (quantize inside the dispatch, one 4x
    # smaller download) honors the same <=1 LSB contract; XLA may fuse
    # the combined program's float math differently than the float-only
    # program (observed: identical on CPU, 0.05% of samples 1 LSB off
    # on the TPU backend)
    par16_dev = decode_symbols_chunked(st, chunk_granules=32, halo=2,
                                       output="int16")
    dd = np.abs(par16_dev.astype(np.int32) - par16.astype(np.int32))
    assert dd.max() <= 1 and (dd == 0).mean() > 0.999
