"""Byte-size unit parsing (driver-side scalar utils).

Reproduces the observable behavior of the reference's size helpers
(``/root/reference/levi/__init__.py:66-106`` — ``str_to_bytes`` /
``boundary_parser``): decimal units (kb = 1_000, not 1_024), tolerance
for non-digit prefixes, and the documented 10 TB upper cap on open
bucket boundaries.
"""

from __future__ import annotations

import re

_UNIT_FACTORS = {
    "b": 1,
    "kb": 1_000,
    "mb": 1_000_000,
    "gb": 1_000_000_000,
    "tb": 1_000_000_000_000,
}

# Anything above this silently falls out of ">X" buckets — kept for
# output parity with the reference (levi/__init__.py:90-91).
TEN_TB = 10 * _UNIT_FACTORS["tb"]

_SPLIT_DIGITS = re.compile(r"(\d+)")


def str_to_bytes(s: str) -> int:
    """``"45b" / "8kb" / "4gb"`` → bytes, decimal units.

    Non-digit prefixes (``<``, ``>=`` …) are tolerated because the split
    keys off the digit run; an unrecognized unit suffix raises
    ``ValueError`` (same contract as the reference).
    """
    parts = _SPLIT_DIGITS.split(s)
    # parts = [prefix, digits, suffix]; prefix ignored.
    number = int(parts[1])
    unit = parts[2].strip().lower()
    try:
        return number * _UNIT_FACTORS[unit]
    except KeyError:
        raise ValueError(
            f"Unknown size unit {unit!r} in {s!r}; expected one of "
            f"{sorted(_UNIT_FACTORS)}"
        ) from None


def boundary_parser(boundary: str) -> tuple[int, int]:
    """Parse a histogram bucket spec into an inclusive ``(lo, hi)`` range.

    ``<=X`` → (0, X); ``<X`` → (0, X-1); ``>=X`` → (X, 10TB);
    ``>X`` → (X+1, 10TB); ``A-B`` → (A, B); anything else → ValueError.
    """
    if boundary.startswith("<="):
        return 0, str_to_bytes(boundary)
    if boundary.startswith("<"):
        return 0, str_to_bytes(boundary) - 1
    if boundary.startswith(">="):
        return str_to_bytes(boundary), TEN_TB
    if boundary.startswith(">"):
        return str_to_bytes(boundary) + 1, TEN_TB
    if "-" in boundary:
        lo_s, hi_s = boundary.split("-", 1)
        return str_to_bytes(lo_s), str_to_bytes(hi_s)
    raise ValueError(
        f"Invalid boundary {boundary!r}: expected '<X', '<=X', '>X', '>=X' or 'A-B'"
    )
