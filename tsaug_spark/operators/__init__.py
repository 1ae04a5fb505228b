"""The ten tsaug-parity series operators plus composition machinery.

Public surface mirrors the reference library's
(/root/reference/src/tsaug/__init__.py:15-24): Pool, Resize, Quantize,
Dropout, Crop, Reverse, Convolve, Drift, AddNoise, TimeWarp, composable
with ``+`` (pipe), ``*`` (repeats) and ``@`` (probability).
"""

from .add_noise import AddNoise
from .base import OpPipe, SeriesOp
from .convolve import Convolve
from .crop import Crop
from .drift import Drift
from .dropout import Dropout
from .pool import Pool
from .quantize import Quantize
from .resize import Resize
from .reverse import Reverse
from .time_warp import TimeWarp

__all__ = [
    "AddNoise",
    "Convolve",
    "Crop",
    "Drift",
    "Dropout",
    "OpPipe",
    "Pool",
    "Quantize",
    "Resize",
    "Reverse",
    "SeriesOp",
    "TimeWarp",
]
