"""Shared utilities: tagged logging, padding/alignment helpers."""

from smvp_toolkit_tpu.utils.logging import log, set_color
from smvp_toolkit_tpu.utils.padding import round_up, pad_to

__all__ = ["log", "set_color", "round_up", "pad_to"]
