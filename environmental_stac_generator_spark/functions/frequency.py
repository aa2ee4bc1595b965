"""F1: forecast-frequency parsing (ref ``utils.py:122-158``).

``parse_forecast_frequency("2hours") -> (2.0, "hours")`` etc., with
both a driver-side Python form (for job parameters) and column
expressions (for per-row parsing).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

FREQ_PATTERN = r"^\s*([0-9]*\.?[0-9]+)\s*(hours?|days?|weeks?|months?|years?)\s*$"
_FREQ_RE = re.compile(FREQ_PATTERN)


class FrequencyParseError(ValueError):
    """Raised for strings like '5fortnights' (ref raises ValueError,
    ``utils.py:152-157``)."""


def parse_forecast_frequency(freq: str) -> tuple[float, str]:
    m = _FREQ_RE.match(freq)
    if not m:
        raise FrequencyParseError(
            f"invalid forecast frequency {freq!r}; expected "
            "'<number><hours|days|weeks|months|years>'"
        )
    value, unit = float(m.group(1)), m.group(2)
    if not unit.endswith("s"):
        unit += "s"
    return value, unit


def freq_value(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, FREQ_PATTERN, 1).cast("double")


def freq_unit(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, FREQ_PATTERN, 2)
