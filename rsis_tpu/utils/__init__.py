"""Utilities: log parsing/plotting, profiling."""

from .plot_curves import parse_train_log, plot_curves  # noqa: F401
from .profiling import step_timer, trace  # noqa: F401
