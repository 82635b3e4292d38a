"""Utilities: profiling/timing and reference-format spectrum I/O."""

from nusiprop_tpu.utils.io import load_spectrum, save_spectrum  # noqa: F401
from nusiprop_tpu.utils.profiling import Timer, trace  # noqa: F401
