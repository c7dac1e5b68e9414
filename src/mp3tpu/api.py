"""Public API (SURVEY.md L5). Full implementations land with the kernels."""
from __future__ import annotations


def decode(path_or_bytes, **kw):
    from .pipeline import decode_file
    return decode_file(path_or_bytes, **kw)


def decode_batch(paths, **kw):
    from .pipeline import decode_files
    return decode_files(paths, **kw)


def encode(pcm, sample_rate, **kw):
    from .encoder import encode_pcm
    return encode_pcm(pcm, sample_rate, **kw)
