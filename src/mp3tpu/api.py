"""Public API (SURVEY.md L5)."""
from __future__ import annotations

_INITIALIZED = False


def init(config=None, sample_rates=(44100,), n_streams: int = 1,
         distributed_coordinator: str | None = None,
         num_processes: int | None = None, process_id: int | None = None):
    """Framework bring-up (SURVEY.md §3.5): resolve config, initialize
    multi-host jax.distributed when requested, generate + device_put the
    constant tables, and warm-trace the decode pipeline at the configured
    batch shape so the first real decode hits a compiled program (the
    cold-start underrun that made the reference player need restarts
    is exactly a first-buffer compile stall).

    Returns the resolved Config.
    """
    global _INITIALIZED
    from .config import Config, resolve, set_active
    from .parallel.distributed import init_distributed
    cfg = config if config is not None else resolve()
    set_active(cfg)  # decode/player/scheduler defaults now come from cfg
    init_distributed(distributed_coordinator, num_processes, process_id)
    import jax.numpy as jnp
    import numpy as np
    from .kernels import pipeline as kp
    from .pipeline import GROUP_WINDOWS
    for sr in sample_rates:
        kp.build_tables(sr)
        W = cfg.decode.window_granules
        S = max(n_streams, 1)
        zeros = lambda shape, dt: jnp.asarray(np.zeros(shape, dt))
        # the single-stream program decode_file/play actually run: the
        # GROUP_WINDOWS-window group scan (kernels/pipeline.py)
        GW = W * GROUP_WINDOWS
        pcm, _ = kp.decode_window_group(
            zeros((1, GW, 2, 576), np.int16), zeros((1, GW, 2, 64), np.int16),
            zeros((1, GW, 2), np.int8), zeros((1, GW, 2), bool),
            zeros((1, GW, 64), np.uint8), kp.init_state(1), sr,
            GROUP_WINDOWS)
        pcm.block_until_ready()
        if S > 1:  # the scheduler's masked-batch program
            pcm, _ = kp.decode_window_i16(
                zeros((S, W, 2, 576), np.int16), zeros((S, W, 2, 64), np.int16),
                zeros((S, W, 2), np.int8), zeros((S, W, 2), bool),
                zeros((S, W, 64), np.uint8), kp.init_state(S), sr)
            pcm.block_until_ready()
    _INITIALIZED = True
    return cfg


def decode(path_or_bytes, **kw):
    from .pipeline import decode_file
    return decode_file(path_or_bytes, **kw)


def decode_batch(paths, **kw):
    """Batched multi-stream decode (SURVEY.md §3.2). Default returns
    [(pcm, sample_rate), ...]; output="device" returns a DecodedBatch
    handle whose int16 PCM stays in HBM for downstream device stages
    (levels/segments/custom jax), materializable via .numpy()."""
    from .pipeline import decode_files
    return decode_files(paths, **kw)


def segment(path_or_bytes, **kw):
    """Sentence/pause boundaries of one file — decoded and reduced on
    device; the PCM never crosses to host (SURVEY.md §0.1 navigation)."""
    from .pipeline import segment_file
    return segment_file(path_or_bytes, **kw)


def segment_batch(paths, **kw):
    from .pipeline import segment_files
    return segment_files(paths, **kw)


def split(path_or_bytes, out_dir, fmt: str = "wav", **kw) -> list:
    """Write each sentence of a track to its own clip file (wav, or
    mp3 re-encoded through ONE batched encode call). Returns paths."""
    from .pipeline import split_file
    return split_file(path_or_bytes, out_dir, fmt=fmt, **kw)


def loudness(path_or_bytes) -> float:
    """Track loudness in dB (ReplayGain-style statistic) from the
    device-computed envelope; PCM never crosses to host."""
    from .pipeline import loudness_file
    return loudness_file(path_or_bytes)


def levels(path_or_bytes) -> tuple:
    """(loudness_db, peak_db) from one device envelope scan — what a
    normalizing queue measures per track (dsp/loudness.py): loudness
    drives the gain toward the target, the sample peak caps boosts so
    normalization never clips."""
    from .pipeline import track_levels
    return track_levels(path_or_bytes)


def levels_batch(paths) -> list:
    """levels() over many files through the batched fused-envelope
    fast path (one packed-plane scan per chunk; PCM never downloads)."""
    from .pipeline import track_levels_batch
    return track_levels_batch(paths)


def encode(pcm, sample_rate, **kw):
    from .encoder import encode_pcm
    return encode_pcm(pcm, sample_rate, **kw)


def encode_batch(pcms, sample_rate=None, **kw):
    """Batched multi-stream encode (SURVEY.md §3.4, the encoder's
    aggregate-throughput path): spectra stay device-resident from the
    analysis transform through the rate loops. Also accepts a
    DecodedBatch handle (see transcode_batch)."""
    from .encoder import encode_batch as _impl
    return _impl(pcms, sample_rate, **kw)


def transcode_batch(paths, bitrate=None, **kw) -> list[bytes]:
    """Batched MP3 -> MP3 re-encode with the PCM device-resident end
    to end (SURVEY.md §3.2 + §3.4 chained): decode_batch(...,
    output="device") feeds encode_batch directly — the int16 PCM is
    decoded into HBM, trimmed/dequantized/padded there, and consumed
    by the encoder's device transforms without ever crossing the
    host boundary. Returns MP3 bytes aligned with the inputs."""
    from .encoder import encode_batch as _enc
    from .pipeline import decode_files
    return _enc(decode_files(list(paths), output="device"),
                bitrate=bitrate, **kw)


def global_metrics():
    """Process-wide observability counters (SURVEY.md F3/§5.5): every
    decode path — decode/decode_batch, the scheduler, the player —
    feeds this Metrics instance alongside its local one, so the fault
    family (frames_ok/frames_error/granules_muted/resyncs/underruns)
    reflects everything this process decoded. Tail .log_line() for
    structured JSON."""
    from .metrics import GLOBAL
    return GLOBAL


def play(path_or_bytes, sink=None, **kw):
    """Open a playback session (SURVEY.md §3.3): returns a Player with
    play/seek/loop/stop/snapshot; decodes to the given sink (default:
    an in-memory CollectSink)."""
    from .player import Player
    return Player(path_or_bytes, sink=sink, **kw)
