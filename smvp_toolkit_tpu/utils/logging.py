"""Tagged, ANSI-colored console logging.

Same UX as the reference's color-macro printf tags
(``[START]/[FILE]/[INFO]/[DATA]/[DEBUG]/[ERROR]/[STOP]``, main-cli.c:25-32
and usage e.g. main-cli.c:1402,1417,1449).
"""

from __future__ import annotations

import os
import sys

__all__ = ["log", "set_color"]

_COLORS = {
    "START": "\x1b[32m",  # green
    "FILE": "\x1b[35m",  # magenta
    "INFO": "\x1b[33m",  # yellow
    "DATA": "\x1b[36m",  # cyan
    "DEBUG": "\x1b[34m",  # blue
    "ERROR": "\x1b[31m",  # red
    "STOP": "\x1b[32m",  # green
}
_RESET = "\x1b[0m"

_use_color = sys.stdout.isatty() and os.environ.get("NO_COLOR") is None


def set_color(enabled: bool) -> None:
    global _use_color
    _use_color = enabled


def log(tag: str, message: str, *, file=None) -> None:
    """Print a tagged line, colored when stdout is a TTY."""
    file = file or (sys.stderr if tag == "ERROR" else sys.stdout)
    color = _COLORS.get(tag, "")
    if _use_color and color:
        print(f"{color}[{tag}]\t{message}{_RESET}", file=file)
    else:
        print(f"[{tag}]\t{message}", file=file)
