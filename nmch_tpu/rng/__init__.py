from .philox import philox4x32, mulhilo32, split_seed, draw4, path_counter_hi
from .normal import (
    uniform_open01,
    uniform_halfopen01,
    boxmuller,
    normal4_from_bits,
)
from .streams import PathStreams

__all__ = [
    "philox4x32", "mulhilo32", "split_seed", "draw4", "path_counter_hi",
    "uniform_open01", "uniform_halfopen01", "boxmuller", "normal4_from_bits",
    "PathStreams",
]
