"""Minimal MPEG-1 Layer III frame crafter for behavioral spec-table recovery.

Builds syntactically valid single-granule probe streams (mono, 44.1 kHz,
128 kbps CBR, no CRC) whose granule-0 main data is an arbitrary caller-chosen
bit string. Used by tools/extract_huffman_behavioral.py to probe libmpg123's
Huffman decoding one code-tree path at a time.

This is also the embryo of the mp3tpu encoder's bitstream mux (E6): the
header/side-info field layout here follows ISO 11172-3 §2.4.1.
"""
from __future__ import annotations

from dataclasses import dataclass, field


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_bits(self, bitstr: str):
        self.bits.extend(1 if c == "1" else 0 for c in bitstr)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, f"overflow: {len(out)} > {pad_to}"
            out += b"\x00" * (pad_to - len(out))
        return bytes(out)


@dataclass
class GranuleSpec:
    part2_3_length: int = 0
    big_values: int = 0
    global_gain: int = 210
    scalefac_compress: int = 0
    window_switching: int = 0
    block_type: int = 0
    mixed_block_flag: int = 0
    table_select: tuple = (0, 0, 0)
    subblock_gain: tuple = (0, 0, 0)
    region0_count: int = 0
    region1_count: int = 0
    preflag: int = 0
    scalefac_scale: int = 0
    count1table_select: int = 1  # table B (all 4-bit codes)
    main_bits: str = ""  # scalefactor+huffman payload bits


FRAME_BYTES = 417  # 144*128000/44100, padding=0


def craft_frame(gr0: GranuleSpec, gr1: GranuleSpec | None = None) -> bytes:
    """One MPEG-1 Layer III mono 44.1k/128k frame. main_data_begin=0."""
    if gr1 is None:
        gr1 = GranuleSpec()
    w = BitWriter()
    # header
    w.put(0x7FF, 11)  # sync
    w.put(0b11, 2)    # MPEG-1
    w.put(0b01, 2)    # Layer III
    w.put(1, 1)       # protection: none
    w.put(9, 4)       # 128 kbps
    w.put(0, 2)       # 44100
    w.put(0, 1)       # padding
    w.put(0, 1)       # private
    w.put(0b11, 2)    # single channel
    w.put(0, 2)       # mode extension
    w.put(0, 1)       # copyright
    w.put(0, 1)       # original
    w.put(0, 2)       # emphasis
    # side info (mono: 17 bytes)
    w.put(0, 9)       # main_data_begin
    w.put(0, 5)       # private bits
    w.put(0, 4)       # scfsi
    for g in (gr0, gr1):
        w.put(g.part2_3_length, 12)
        w.put(g.big_values, 9)
        w.put(g.global_gain, 8)
        w.put(g.scalefac_compress, 4)
        w.put(g.window_switching, 1)
        if g.window_switching:
            w.put(g.block_type, 2)
            w.put(g.mixed_block_flag, 1)
            for t in g.table_select[:2]:
                w.put(t, 5)
            for s in g.subblock_gain:
                w.put(s, 3)
        else:
            for t in g.table_select:
                w.put(t, 5)
            w.put(g.region0_count, 4)
            w.put(g.region1_count, 3)
        w.put(g.preflag, 1)
        w.put(g.scalefac_scale, 1)
        w.put(g.count1table_select, 1)
    # main data (main_data_begin = 0 -> starts right here)
    w.put_bits(gr0.main_bits)
    w.put_bits(gr1.main_bits)
    assert len(gr0.main_bits) == gr0.part2_3_length
    assert len(gr1.main_bits) == gr1.part2_3_length
    return w.to_bytes(pad_to=FRAME_BYTES)


def craft_stream(probe: GranuleSpec, n_pre: int = 2, n_post: int = 3) -> bytes:
    """Silent frames around one probe frame (probe in granule 0)."""
    silent = craft_frame(GranuleSpec(), GranuleSpec())
    frames = [silent] * n_pre + [craft_frame(probe, GranuleSpec())] + [silent] * n_post
    return b"".join(frames)


def craft_frame_stereo(gr0_pair, gr1_pair=None, mode=1, mode_ext=1,
                       scfsi=0) -> bytes:
    """One MPEG-1 Layer III stereo frame (mode 0=stereo 1=joint;
    mode_ext bit1=MS bit0=intensity). gr*_pair = (GranuleSpec ch0,
    GranuleSpec ch1). 44.1k/128k, no CRC, main_data_begin=0."""
    if gr1_pair is None:
        gr1_pair = (GranuleSpec(), GranuleSpec())
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(0b11, 2)
    w.put(0b01, 2)
    w.put(1, 1)
    w.put(9, 4)
    w.put(0, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(mode, 2)
    w.put(mode_ext, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 2)
    # side info stereo: 32 bytes
    w.put(0, 9)
    w.put(0, 3)
    for _ch in range(2):
        w.put(scfsi, 4)
    for pair in (gr0_pair, gr1_pair):
        for g in pair:
            w.put(g.part2_3_length, 12)
            w.put(g.big_values, 9)
            w.put(g.global_gain, 8)
            w.put(g.scalefac_compress, 4)
            w.put(g.window_switching, 1)
            if g.window_switching:
                w.put(g.block_type, 2)
                w.put(g.mixed_block_flag, 1)
                for t in g.table_select[:2]:
                    w.put(t, 5)
                for s in g.subblock_gain:
                    w.put(s, 3)
            else:
                for t in g.table_select:
                    w.put(t, 5)
                w.put(g.region0_count, 4)
                w.put(g.region1_count, 3)
            w.put(g.preflag, 1)
            w.put(g.scalefac_scale, 1)
            w.put(g.count1table_select, 1)
    for pair in (gr0_pair, gr1_pair):
        for g in pair:
            w.put_bits(g.main_bits)
            assert len(g.main_bits) == g.part2_3_length
    return w.to_bytes(pad_to=417)


def craft_stream_stereo(gr0_pair, mode=1, mode_ext=1, n_pre=2, n_post=3) -> bytes:
    silent = craft_frame_stereo(
        (GranuleSpec(), GranuleSpec()), mode=mode, mode_ext=mode_ext)
    probe = craft_frame_stereo(gr0_pair, mode=mode, mode_ext=mode_ext)
    return b"".join([silent] * n_pre + [probe] + [silent] * n_post)


def craft_frame_lsf_stereo(gr_pair, mode=1, mode_ext=1, sr_idx=0,
                           bitrate_idx=8) -> bytes:
    """One MPEG-2 (LSF, 22.05k default) Layer III stereo frame:
    1 granule, 8-bit main_data_begin, 9-bit scalefac_compress."""
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(0b10, 2)    # MPEG-2
    w.put(0b01, 2)    # Layer III
    w.put(1, 1)
    w.put(bitrate_idx, 4)   # idx 8 = 64 kbps LSF
    w.put(sr_idx, 2)        # 0 = 22050
    w.put(0, 1)
    w.put(0, 1)
    w.put(mode, 2)
    w.put(mode_ext, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 2)
    # LSF stereo side info: 17 bytes
    w.put(0, 8)   # main_data_begin
    w.put(0, 2)   # private
    for g in gr_pair:
        w.put(g.part2_3_length, 12)
        w.put(g.big_values, 9)
        w.put(g.global_gain, 8)
        w.put(g.scalefac_compress, 9)
        w.put(g.window_switching, 1)
        if g.window_switching:
            w.put(g.block_type, 2)
            w.put(g.mixed_block_flag, 1)
            for t in g.table_select[:2]:
                w.put(t, 5)
            for s in g.subblock_gain:
                w.put(s, 3)
        else:
            for t in g.table_select:
                w.put(t, 5)
            w.put(g.region0_count, 4)
            w.put(g.region1_count, 3)
        w.put(g.scalefac_scale, 1)
        w.put(g.count1table_select, 1)
    for g in gr_pair:
        w.put_bits(g.main_bits)
        assert len(g.main_bits) == g.part2_3_length
    # LSF 22.05k @ 64kbps: 72*64000/22050 = 208.9 -> 208 bytes
    return w.to_bytes(pad_to=72 * 64000 // 22050)


# (version code, sr_idx) per LSF sample rate — MPEG-2 (0b10) and
# MPEG-2.5 (0b00) families; frames.py:12-24 is the decode-side mirror
LSF_RATES = {22050: (0b10, 0), 24000: (0b10, 1), 16000: (0b10, 2),
             11025: (0b00, 0), 12000: (0b00, 1), 8000: (0b00, 2)}
BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)


def craft_frame_lsf_mono(gr: GranuleSpec, sample_rate: int = 11025,
                         bitrate_idx: int = 8, padding: int = 0) -> bytes:
    """One MPEG-2/2.5 (LSF) Layer III MONO frame at any of the six LSF
    rates: 1 granule, 8-bit main_data_begin, 9-bit scalefac_compress,
    no preflag bit (dropped in LSF side info), 9-byte side info.
    main_data_begin = 0 (each frame self-contained)."""
    version, sr_idx = LSF_RATES[sample_rate]
    w = BitWriter()
    w.put(0x7FF, 11)
    w.put(version, 2)
    w.put(0b01, 2)          # Layer III
    w.put(1, 1)             # no CRC
    w.put(bitrate_idx, 4)
    w.put(sr_idx, 2)
    w.put(padding, 1)
    w.put(0, 1)
    w.put(0b11, 2)          # single channel
    w.put(0, 2)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 2)
    # LSF mono side info: 9 bytes (8 mdb + 1 private + 63 granule bits)
    w.put(0, 8)             # main_data_begin
    w.put(0, 1)             # private
    w.put(gr.part2_3_length, 12)
    w.put(gr.big_values, 9)
    w.put(gr.global_gain, 8)
    w.put(gr.scalefac_compress, 9)
    w.put(gr.window_switching, 1)
    if gr.window_switching:
        w.put(gr.block_type, 2)
        w.put(gr.mixed_block_flag, 1)
        for t in gr.table_select[:2]:
            w.put(t, 5)
        for s in gr.subblock_gain:
            w.put(s, 3)
    else:
        for t in gr.table_select:
            w.put(t, 5)
        w.put(gr.region0_count, 4)
        w.put(gr.region1_count, 3)
    w.put(gr.scalefac_scale, 1)
    w.put(gr.count1table_select, 1)
    w.put_bits(gr.main_bits)
    assert len(gr.main_bits) == gr.part2_3_length
    frame_bytes = 72 * BITRATES_V2[bitrate_idx] * 1000 // sample_rate \
        + padding
    return w.to_bytes(pad_to=frame_bytes)


def craft_stream_lsf_stereo(gr_pair, mode=1, mode_ext=1, n_pre=2, n_post=3) -> bytes:
    silent = craft_frame_lsf_stereo((GranuleSpec(), GranuleSpec()),
                                    mode=mode, mode_ext=mode_ext)
    probe = craft_frame_lsf_stereo(gr_pair, mode=mode, mode_ext=mode_ext)
    return b"".join([silent] * n_pre + [probe] + [silent] * n_post)
