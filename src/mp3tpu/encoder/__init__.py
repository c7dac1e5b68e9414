"""MP3 encoder (SURVEY.md E1-E6): analysis filterbank + MDCT on the
batched transform path, psychoacoustic-informed block switching, rate
loop, Huffman coding and CBR mux. Produces ISO 11172-3 conformant
MPEG-1 Layer III streams with a Xing/LAME gapless tag so that
decode(encode(x)) is sample-aligned with x.
"""
from __future__ import annotations

import numpy as np

from ..container.frames import BITRATES_V1_L3
from .huffcode import encode_granule
from .mux import (FrameSizer, ReservoirMux, build_frame, build_xing_frame,
                  frame_capacity_bits)
from .psymodel import block_type_sequence, get_model
from .quantize import (inner_rate_loop, outer_distortion_loop,
                       outer_distortion_loop_short)
from .transform import granule_spectra

SPF = 576
ENCODER_DELAY = 528   # analysis+MDCT chain delay minus the decoder's 529
SR_IDX = {44100: 0, 48000: 1, 32000: 2}

from functools import lru_cache

from ..tables.sfb import LONG

# reduceat edges for long-band energies (22 segments, last runs to 576)
LONG_EDGES = {sr: LONG[sr][:22] for sr in LONG}


@lru_cache(maxsize=None)
def _short_flat_map(sample_rate: int) -> np.ndarray:
    """transmitted line -> window*13 + short_sfb (band_map slot - 22)."""
    from ..tables import maps as tmaps
    return (tmaps.band_map(sample_rate, tmaps.FLAVOR_SHORT) - 22).astype(np.int64)


def encode_pcm(pcm: np.ndarray, sample_rate: int, bitrate: int = 128,
               gapless_tag: bool = True, short_blocks: bool = True,
               joint_stereo: bool = True, noise_shaping: bool = True,
               device_transform: bool = False, reservoir: bool = True,
               vbr_quality: int | None = None) -> bytes:
    """Encode float PCM [-1, 1], shape [n] or [n, ch], to MP3 bytes.

    MPEG-1 rates (44100/48000/32000); 1 or 2 channels. CBR at `bitrate`
    kbps; mid/side joint stereo is chosen per frame when the side
    channel is weak; the first frame is a Xing/LAME metadata frame.
    noise_shaping (default on) enables the outer distortion loop:
    per-band scalefactors driven by the psychoacoustic model 2's
    masking thresholds (1024-pt FFT unpredictability tonality, bark
    spreading, pre-echo control — see psymodel.py), for both long and
    short blocks. It trades plain SNR for masked-noise placement;
    disable it for maximum plain-SNR encodes.
    device_transform runs E1+E2 (analysis filterbank + MDCT) on the
    TPU as one batched jitted call (SURVEY.md §3.4); the float64 numpy
    transform is the default reference path.
    reservoir enables bit-reservoir coding (granules borrow capacity
    that quieter earlier granules left unused, ISO §2.4.1.7).
    vbr_quality (0 best .. 9 smallest) switches to constant-quality VBR:
    each granule is quantized at a fixed quality step and every frame
    gets the smallest bitrate that fits; the Xing frame carries a real
    byte TOC for seeking.
    """
    if sample_rate not in SR_IDX:
        raise ValueError(f"unsupported sample rate {sample_rate} "
                         f"(MPEG-1: 44100/48000/32000)")
    if bitrate not in BITRATES_V1_L3:
        raise ValueError(f"unsupported bitrate {bitrate}")
    pcm = np.asarray(pcm, np.float64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    if nch > 2:
        raise ValueError("at most 2 channels")

    # flush so the decoded+trimmed output covers all n input samples
    total_needed = n + ENCODER_DELAY + 529
    G = -(-total_needed // SPF)
    G += G & 1  # whole frames (2 granules)
    enc_padding = G * SPF - ENCODER_DELAY - n
    padded = np.zeros((G * SPF, nch))
    padded[:n] = pcm

    sr_idx = SR_IDX[sample_rate]
    br_idx = BITRATES_V1_L3.index(bitrate)
    bts = block_type_sequence(padded, sample_rate) if short_blocks \
        else np.zeros(G, np.int64)

    # E1+E2 transform: all channels in one device batch, or numpy f64
    if device_transform:
        from .device import granule_spectra_device_batch
        xr = granule_spectra_device_batch(
            padded.T.copy(), np.tile(bts, (nch, 1)), sample_rate)
        xr = xr.transpose(1, 0, 2)                 # [G, nch, 576]
    else:
        xr = np.stack([granule_spectra(padded[:, c], bts, sample_rate)
                       for c in range(nch)], axis=1)

    # psychoacoustic model 2: per-channel threshold/energy ratios
    # (FFT-domain, dimensionless — applied to MDCT band energies below)
    psy = None
    if noise_shaping and vbr_quality is None:
        model = get_model(sample_rate)
        psy = [model.analyze(padded[:, c], bts) for c in range(nch)]

    vbr = vbr_quality is not None
    if vbr:
        reservoir = True  # VBR uses the stream mux
    sizer = FrameSizer(sample_rate, bitrate * 1000)
    mux = ReservoirMux(nch, sr_idx, br_idx,
                       FrameSizer(sample_rate, bitrate * 1000)) if reservoir else None
    frames = []
    n_frames = G // 2
    s2 = 1.0 / np.sqrt(2.0)
    # per-granule energy for demand-weighted reservoir draws
    g_energy = (xr ** 2).sum(axis=(1, 2)) + 1e-12
    med_energy = float(np.median(g_energy))
    from .huffcode import count_granule_bits
    from .quantize import IX_MAX, quantize
    for f in range(n_frames):
        frame_bytes, padbit = sizer.next()
        budget = frame_capacity_bits(frame_bytes, nch) // (2 * nch) - 8
        if mux is not None:
            # loud/transient frames borrow from the reservoir
            draw_total = min(mux.reservoir_bits, 3000)
            f_energy = float(g_energy[f * 2: f * 2 + 2].sum())
            loud = f_energy > 2.0 * med_energy or                 (bts[f * 2: f * 2 + 2] == 2).any()
            budget += (draw_total if loud else draw_total // 8) // (2 * nch)
            budget = min(budget, 3900)
        fx = xr[f * 2: f * 2 + 2].copy()          # [2, nch, 576]
        # per-frame mid/side decision: MS when the side channel is weak
        # (the decoder applies the 1/sqrt2 butterfly; its exact inverse
        # is applied here — the butterfly is orthogonal)
        ms = ms_flag = False
        if nch == 2 and joint_stereo:
            mid = (fx[:, 0] + fx[:, 1]) * s2
            side = (fx[:, 0] - fx[:, 1]) * s2
            e_s, e_m = (side ** 2).sum(), (mid ** 2).sum()
            if e_s < 0.5 * e_m:
                ms = ms_flag = True
                fx[:, 0], fx[:, 1] = mid, side
        if vbr:
            # constant-quality quantization, then the smallest bitrate
            # whose capacity (plus reservoir) fits this frame
            chs_all = []
            need = 0
            for gr in range(2):
                row = []
                for c in range(nch):
                    bt = int(bts[f * 2 + gr])
                    x = fx[gr, c]
                    amax = float(np.abs(x).max())
                    gg = 210
                    if amax > 0:
                        while (amax * 2.0 ** (-(gg - 210) / 4.0)) ** 0.75 > IX_MAX:
                            gg += 1
                        while gg > 0 and (amax * 2.0 ** (-(gg - 1 - 210) / 4.0)) ** 0.75 <= IX_MAX:
                            gg -= 1
                    gg = min(gg + 12 + 3 * vbr_quality, 255)
                    ix = quantize(x, gg)
                    bits = count_granule_bits(ix, sample_rate, bt)
                    need += min(bits, 4000)
                    row.append((ix, gg, bt, bits))
                chs_all.append(row)
            chosen = 14
            for bi in range(1, 15):
                fb_try = (1152 // 8) * BITRATES_V1_L3[bi] * 1000 // sample_rate
                cap = frame_capacity_bits(fb_try, nch)
                if cap + min(mux.reservoir_bits, 2000) >= need + 64:
                    chosen = bi
                    break
            fb_sel = (1152 // 8) * BITRATES_V1_L3[chosen] * 1000 // sample_rate
            cap = frame_capacity_bits(fb_sel, nch)
            granules = []
            for gr in range(2):
                out_row = []
                for c in range(nch):
                    ix, gg, bt, bits = chs_all[gr][c]
                    if bits > 4000 or need > cap + mux.reservoir_bits:
                        # re-fit to the per-granule share of the max frame
                        ix, gg = inner_rate_loop(
                            fx[gr, c], cap // (2 * nch) - 8, sample_rate, bt)
                    out_row.append(encode_granule(ix, gg, sample_rate, bt))
                granules.append(out_row)
            ms = False
            if nch == 2 and joint_stereo:
                pass  # fx already MS-transformed above when chosen
            mux.add_frame(granules, ms_flag, br_idx=chosen,
                          frame_bytes=fb_sel, pad=0)
            continue
        granules = []
        for gr in range(2):
            chs = []
            g_idx = f * 2 + gr
            for c in range(nch):
                bt = int(bts[g_idx])
                x = fx[gr, c]
                if psy is not None and bt in (0, 2):
                    # threshold/energy ratio per band; under mid/side the
                    # conservative elementwise min of both channels' masking
                    # applies to both mid and side
                    if bt == 0:
                        r = psy[c].ratio_l[g_idx]
                        if ms:
                            r = np.minimum(psy[0].ratio_l[g_idx],
                                           psy[1].ratio_l[g_idx])
                        en = np.add.reduceat(x * x, LONG_EDGES[sample_rate])
                        ix, gg, long_sf = outer_distortion_loop(
                            x, r * en[:21], budget, sample_rate)
                        chs.append(encode_granule(ix, gg, sample_rate, bt,
                                                  long_sf=long_sf))
                    else:
                        r = psy[c].ratio_s[g_idx]
                        if ms:
                            r = np.minimum(psy[0].ratio_s[g_idx],
                                           psy[1].ratio_s[g_idx])
                        flat = _short_flat_map(sample_rate)
                        en = np.bincount(flat, weights=x * x,
                                         minlength=39).reshape(3, 13)
                        ix, gg, short_sf, sbg = outer_distortion_loop_short(
                            x, r * en[:, :12], budget, sample_rate)
                        chs.append(encode_granule(
                            ix, gg, sample_rate, bt, short_sf=short_sf,
                            subblock_gain=tuple(int(s) for s in sbg)))
                else:
                    ix, gg = inner_rate_loop(x, budget, sample_rate, bt)
                    chs.append(encode_granule(ix, gg, sample_rate, bt))
            granules.append(chs)
        if mux is not None:
            mux.add_frame(granules, ms)
        else:
            frames.append(build_frame(granules, nch, sr_idx, br_idx,
                                      frame_bytes, padbit, ms=ms))

    out = mux.finish() if mux is not None else b"".join(frames)
    if gapless_tag:
        xing_bytes = FrameSizer(sample_rate, bitrate * 1000).next()[0]
        toc = None
        if vbr and mux is not None:
            sizes = np.asarray([fr[2] for fr in mux.frames], np.float64)
            cum = np.concatenate([[0.0], np.cumsum(sizes)])
            total = max(cum[-1], 1.0)
            marks = (np.arange(100) / 100.0) * len(sizes)
            toc = bytes(np.clip(
                np.interp(marks, np.arange(len(cum)), cum) / total * 256.0,
                0, 255).astype(np.uint8))
        xing = build_xing_frame(nch, sr_idx, br_idx, xing_bytes,
                                n_frames=n_frames,
                                n_bytes=len(out) + xing_bytes,
                                encoder_delay=ENCODER_DELAY,
                                encoder_padding=enc_padding, toc=toc)
        out = xing + out
    return out
