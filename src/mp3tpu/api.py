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


def play(path_or_bytes, sink=None, **kw):
    """Open a playback session (SURVEY.md §3.3): returns a Player with
    play/seek/loop/stop/snapshot; decodes to the given sink (default:
    an in-memory CollectSink)."""
    from .player import Player
    return Player(path_or_bytes, sink=sink, **kw)
