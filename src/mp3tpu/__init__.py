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

from .api import decode, decode_batch, encode  # noqa: F401
