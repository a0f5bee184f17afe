"""Native (C++) kernels for rsis_tpu: RLE mask ops behind a ctypes binding."""

from . import mask  # noqa: F401
