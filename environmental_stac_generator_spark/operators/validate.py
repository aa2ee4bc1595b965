"""Single-pass declarative data validation (Deequ-style, Spark-first).

Ingest-time quality gates for a 100 TB pipeline: every declared
constraint — not-null, uniqueness, numeric range, set membership,
regex shape, row count — compiles to an aggregate EXPRESSION, and the
whole rule set evaluates in ONE scan + one map-side-partial aggregate
of the table. N rules never cost N passes; uniqueness uses the
HyperLogLog++ sketch by default so even that stays one pass with a
constant-size shuffle (exact mode opts into the extra distinct).

The result is a small (rule, column, metric, threshold, ok) frame —
drive a pipeline gate with ``.filter("NOT ok")`` or persist it as a
run report next to the output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Rule:
    """One declarative constraint; ``metric`` is always "fraction of
    rows violating" (0.0 = clean) except row_count_min, where it is
    the observed count."""

    kind: str  # not_null | unique | in_range | in_set | matches | row_count_min
    column: str = ""
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = field(default_factory=tuple)
    pattern: str = ""
    min_rows: int = 0
    max_violation_fraction: float = 0.0


def not_null(column: str, tolerance: float = 0.0) -> Rule:
    return Rule("not_null", column, max_violation_fraction=tolerance)

def unique(column: str, tolerance: float = 0.0) -> Rule:
    return Rule("unique", column, max_violation_fraction=tolerance)

def in_range(column: str, lo: float, hi: float, tolerance: float = 0.0) -> Rule:
    return Rule("in_range", column, lo=lo, hi=hi, max_violation_fraction=tolerance)

def in_set(column: str, allowed, tolerance: float = 0.0) -> Rule:
    return Rule("in_set", column, allowed=tuple(allowed),
                max_violation_fraction=tolerance)

def matches(column: str, pattern: str, tolerance: float = 0.0) -> Rule:
    return Rule("matches", column, pattern=pattern,
                max_violation_fraction=tolerance)

def row_count_min(n: int) -> Rule:
    return Rule("row_count_min", min_rows=n)


def _violations(rule: Rule) -> Column:
    """Count of rows violating ``rule`` — a plain aggregate expression."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "in_range":
        bad = c.isNull() | (c < rule.lo) | (c > rule.hi)
    elif rule.kind == "in_set":
        bad = c.isNull() | ~c.isin(*rule.allowed)
    elif rule.kind == "matches":
        bad = c.isNull() | ~c.rlike(rule.pattern)
    else:
        raise ValueError(f"no violation expression for {rule.kind}")
    # coalesce: sum over ZERO rows is NULL, which would make metric
    # and ok NULL on an empty table — the documented `.filter("NOT
    # ok")` gate then silently PASSES an empty upstream output while
    # all(r["ok"]) fails it. 0 violations keeps every rule's result
    # determinate (an empty table trips row_count_min, not a
    # tri-state).
    return F.coalesce(F.sum(bad.cast("long")), F.lit(0))


def validate(
    df: DataFrame, rules: list[Rule], exact_unique: bool = False
) -> DataFrame:
    """Evaluate every rule in one aggregate pass; returns one row per
    rule: (kind, column, metric, threshold, ok). ``exact_unique``
    swaps the HLL duplicate estimate for an exact count_distinct
    (same single pass, but the shuffle carries the keys). A unique
    rule whose tolerance sits INSIDE the HLL error envelope
    (threshold < 2×rsd) forces the exact path on its own: an
    approx_count_distinct that under-estimates by <1% would flag a
    perfectly unique column as failed, and an over-estimate would
    mask that many real duplicates — the estimator cannot answer a
    question tighter than its own error bar. Over-estimates are also
    clamped so the violation count never goes negative."""
    if not rules:
        # inline(array()) of zero structs is an AnalysisException
        # (empty array defaults to array<string>); an empty rule set
        # is a caller error, not an empty report
        raise ValueError("validate() needs at least one rule")
    _HLL_RSD = 0.01
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.kind == "row_count_min":
            continue
        if r.kind == "unique":
            use_exact = (
                exact_unique or r.max_violation_fraction < 2 * _HLL_RSD
            )
            distinct = (
                F.count_distinct(F.col(r.column))
                if use_exact
                else F.approx_count_distinct(r.column, rsd=_HLL_RSD)
            )
            aggs.append(
                F.greatest(F.lit(0), F.count(r.column) - distinct)
                .cast("long")
                .alias(f"_v{i}")
            )
        else:
            aggs.append(_violations(r).alias(f"_v{i}"))
    tot = df.agg(*aggs)

    # One struct per rule, inlined from the single aggregate row — the
    # whole report is one job, one scan, however many rules.
    entries = []
    for i, r in enumerate(rules):
        if r.kind == "row_count_min":
            metric = F.col("_n").cast("double")
            ok = F.col("_n") >= r.min_rows
            thr = F.lit(float(r.min_rows))
        else:
            metric = F.col(f"_v{i}") / F.greatest(F.col("_n"), F.lit(1))
            ok = metric <= r.max_violation_fraction
            thr = F.lit(r.max_violation_fraction)
        entries.append(
            F.struct(
                F.lit(r.kind).alias("rule"),
                F.lit(r.column or None).cast("string").alias("column"),
                metric.cast("double").alias("metric"),
                thr.cast("double").alias("threshold"),
                ok.alias("ok"),
            )
        )
    return tot.select(F.inline(F.array(*entries)))
