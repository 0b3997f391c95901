"""Leveled logging (the reference's Verbose::PrintMess,
/root/reference/include/System.h:48-73: QUIET / NORMAL / VERBOSE /
VERY_VERBOSE / DEBUG with a static threshold, set QUIET at
src/System.cc:186).

Idiomatic Python: one stdlib logger for the whole package with the
reference's five levels mapped onto logging's scale, so handlers,
formatting, and per-module filtering come for free while call sites keep
the reference's vocabulary:

    from hfnet_slam_tpu.utils import log
    log.set_level("normal")
    log.print_mess("loop closed", log.VERBOSE)   # suppressed
"""
from __future__ import annotations

import logging

QUIET = 0
NORMAL = 1
VERBOSE = 2
VERY_VERBOSE = 3
DEBUG = 4

_NAMES = {"quiet": QUIET, "normal": NORMAL, "verbose": VERBOSE,
          "very_verbose": VERY_VERBOSE, "debug": DEBUG}

# reference level -> stdlib severity of messages AT that level
_PY_LEVEL = {NORMAL: logging.INFO, VERBOSE: logging.DEBUG,
             VERY_VERBOSE: logging.DEBUG - 1, DEBUG: logging.DEBUG - 2}

logger = logging.getLogger("hfnet_slam_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
    logger.addHandler(_h)
    logger.propagate = False

_threshold = QUIET  # the reference defaults to QUIET (System.cc:186)


def set_level(level) -> None:
    """Accepts a name ('normal'), a reference constant (log.VERBOSE), or a
    stdlib logging level when >= logging.DEBUG."""
    global _threshold
    if isinstance(level, str):
        level = _NAMES[level.lower()]
    _threshold = int(level)
    # warnings (warn()) always pass, whatever the reference-level threshold
    logger.setLevel(min(logging.WARNING,
                        _PY_LEVEL.get(_threshold, logging.CRITICAL + 1)
                        if _threshold > QUIET else logging.CRITICAL + 1))


def get_level() -> int:
    return _threshold


def print_mess(msg: str, level: int = NORMAL) -> None:
    """Emit msg when the configured threshold is >= its level
    (Verbose::PrintMess semantics)."""
    if level <= _threshold and level > QUIET:
        logger.log(_PY_LEVEL.get(level, logging.INFO), msg)


def warn(msg: str) -> None:
    """Unconditional warning — bypasses the QUIET threshold. For conditions
    that silently degrade results (dropped BA edges, capacity overflows)."""
    logger.log(logging.WARNING, msg)


set_level(QUIET)
