"""Player/session layer (SURVEY.md L4 / D5-D7)."""

from .engine import Player, open_track  # noqa: F401
from .queue import PlayQueue  # noqa: F401
from .scheduler import StreamScheduler, decode_batch_streams  # noqa: F401
from .sink import (CallbackSink, CollectSink, RawFileSink, RingBuffer,  # noqa: F401
                   Sink, WavFileSink)
