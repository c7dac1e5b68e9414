"""mp3tpu — a TPU-native batched MP3 decode/encode/playback framework.

Built from scratch against ISO/IEC 11172-3 (MPEG-1 Audio Layer III), with
the LSF extension (ISO/IEC 13818-3, MPEG-2/2.5) for decode. The reference
project (lxm0851/mp3) ships no source; see SURVEY.md for the capability
blueprint this framework implements.

Architecture: variable-length, branchy bitstream work (sync scan, side
info, scalefactors, Huffman) runs on host and is packed into dense
SymbolTensors; all per-granule DSP (requantize -> stereo -> reorder ->
alias -> IMDCT/overlap -> polyphase synthesis) runs on TPU as batched
JAX/XLA/Pallas kernels over [stream, granule, channel, ...] tensors.
"""

__version__ = "0.1.0"

import os as _os


def _enable_jit_cache():
    """Persistent XLA compilation cache: first-run compiles of the decode
    pipeline (~30-60 s over remote-compile TPU tunnels) are reused across
    processes — the production cure for the reference player's
    cold-start glitch symptom (SURVEY.md §3.5)."""
    try:
        import jax
        cache = _os.environ.get(
            "MP3TPU_JIT_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "mp3tpu_jax"))
        if cache and cache != "0":
            # CPU AOT entries are machine-feature-pinned (noisy warnings
            # when reloaded on a different host), so cache TPU compiles
            # only; checking the backend lazily avoids eager device init
            def _maybe_enable(_cache=cache):
                try:
                    if jax.default_backend() == "cpu":
                        return
                    _os.makedirs(_cache, exist_ok=True)
                    jax.config.update("jax_compilation_cache_dir", _cache)
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 0.5)
                except Exception:
                    pass
            _maybe_enable()
    except Exception:
        pass


_enable_jit_cache()

from .api import (decode, decode_batch, encode, encode_batch,  # noqa: F401
                  global_metrics, init, levels, levels_batch, loudness, play,
                  segment, segment_batch, split, transcode_batch)


def __getattr__(name):
    # lazy: DecodedBatch lives in pipeline, which pulls in jax/kernels —
    # keep `import mp3tpu` light (api functions import on first call)
    if name == "DecodedBatch":
        from .pipeline import DecodedBatch
        return DecodedBatch
    raise AttributeError(name)
