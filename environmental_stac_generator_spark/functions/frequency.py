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
    """try_cast, not cast: regexp_extract yields '' for a
    non-matching string, and under Spark 4's default ANSI mode
    cast('' AS DOUBLE) aborts the whole job — the column form of a
    parser must yield NULL per bad row, the relational analog of
    :class:`FrequencyParseError`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, FREQ_PATTERN, 1).try_cast("double")


def freq_unit(col: Column | str) -> Column:
    """Pluralized like :func:`parse_forecast_frequency` ('1hour' ->
    'hours'), so the column form's output is always a unit
    :func:`leadtime_offset` accepts — the two forms this module
    presents as equivalent must agree on singular-unit strings."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_extract(c, FREQ_PATTERN, 2)
    return F.when(u == "", u).when(u.endswith("s"), u).otherwise(
        F.concat(u, F.lit("s"))
    )


def leadtime_offset(ts: Column | str, unit: str, value: Column | float) -> Column:
    """F2: ``forecast_reference_time + relativedelta(**{unit: value})``
    as a column expression (ref ``stac/generator.py:680-682,855-857``),
    with ``dateutil.relativedelta`` semantics, machine-checked by
    tests/test_properties.py:

    - hours/days/weeks take fractional values (relativedelta
      normalizes the fraction into lower units — an exact duration;
      weeks are days*7, ``relativedelta.py`` normalize);
    - months/years must be integral — relativedelta raises
      "Non-integer years and months are ambiguous"; the column form
      raises the analogous error at evaluation time;
    - month/year steps clamp to month end (Jan 31 + 1 month =
      Feb 29), which is exactly Spark's ``add_months``.
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    v = F.lit(value) if not isinstance(value, Column) else value
    v = v.cast("double")
    if unit not in {"hours", "days", "weeks", "months", "years"}:
        raise FrequencyParseError(f"unknown leadtime unit {unit!r}")
    if unit in ("hours", "days", "weeks"):
        per_unit = {"hours": 3600.0, "days": 86400.0, "weeks": 604800.0}[unit]
        # exact duration at microsecond precision: 1.5days -> +129600s
        return F.timestamp_micros(
            F.unix_micros(t) + (v * per_unit * 1_000_000.0).cast("long")
        )
    n_months = 12 if unit == "years" else 1
    # NULL propagates (a null offset -> null timestamp), matching the
    # hours/days/weeks branch — without the explicit branch, v ==
    # floor(v) is NULL, when() falls through, and raise_error aborts
    # the job on a sparse leadtime column for these units only
    checked = (
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(v == F.floor(v), (v * n_months).cast("int"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"Non-integer {unit} are ambiguous: "), v.cast("string")
                )
            ).cast("int")
        )
    )
    # timestamp + month interval clamps to month end AND preserves
    # time-of-day (add_months would truncate to a date)
    return t + F.make_interval(months=checked)
