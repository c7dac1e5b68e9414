"""PCM post-processing on device (SURVEY.md L3 / D1-D4)."""

from .gapless import gapless_bounds, trim_gapless  # noqa: F401
from .gain import apply_gain  # noqa: F401
from .resample import Resampler  # noqa: F401
from .eq import GraphicEQ  # noqa: F401
from .timestretch import TimeStretch, stretch  # noqa: F401
from .segment import split_silence  # noqa: F401
