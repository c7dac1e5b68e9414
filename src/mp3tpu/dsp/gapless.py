"""Gapless trim (SURVEY.md D1).

LAME-family encoders prepend `encoder_delay` priming samples and append
`encoder_padding` flush samples; the Layer III decoder itself adds a
529-sample filterbank delay. Trimming delay+529 leading and
padding-529 trailing samples reconstructs the original clip exactly
(sample count preserved), which is what makes consecutive tracks
concatenate seamlessly [SURVEY.md §2.2].
"""
from __future__ import annotations

DECODER_DELAY = 529


def gapless_bounds(total_decoded: int, encoder_delay: int,
                   encoder_padding: int) -> tuple[int, int]:
    """(start, end) sample bounds into the decoded PCM."""
    start = encoder_delay + DECODER_DELAY
    drop_end = max(encoder_padding - DECODER_DELAY, 0)
    end = max(total_decoded - drop_end, start)
    return start, end


def trim_gapless(pcm, info) -> object:
    """Trim decoded PCM [n, ch] according to a StreamInfo's LAME tag."""
    if info is None or not getattr(info, "gapless", False):
        return pcm
    start, end = gapless_bounds(len(pcm), info.encoder_delay, info.encoder_padding)
    return pcm[start:end]
