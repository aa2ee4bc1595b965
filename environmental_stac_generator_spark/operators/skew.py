"""Skew mitigation: salted aggregation and salted broadcast-free join.

At 100 TB a handful of hot keys (one collection getting most files,
one return-flag dominating lineitem) turn a single reducer into the
job's critical path. Two standard remedies, expressed so results are
bit-identical to the unsalted plans:

- :func:`salted_agg` — two-stage aggregation: partial aggregate on
  (keys + salt) spreads a hot key over ``n_salt`` reducers, then a
  cheap final aggregate on the true keys combines the partials.
  Exact for algebraic aggregates (sum/count/min/max, avg via
  sum+count).
- :func:`salted_join` — replicate the small side once per salt value
  and join on (key, salt): every hot-key row of the big side lands on
  a different reducer. The salt is ``pmod(hash(...), n)`` over a
  deterministic column, never ``rand()``, so plans are replayable and
  oracle-checkable.

AQE's skew-join splitting (session.py) handles sort-merge skew
adaptively; these operators are for the cases AQE cannot see —
aggregation skew, and joins whose skew appears only after upstream
transforms.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# (partial_expr, final_expr) per supported aggregate: partial runs on
# (keys + salt), final re-combines partials on the true keys.
# count follows SQL null-skipping: count(col) counts non-null values,
# count("*") counts rows — the partial must NOT collapse both to
# count(*) or results diverge from the unsalted plan on null inputs.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    # the star/None test must be identity-based: Column.__eq__ builds
    # an expression, so an `in`/`==` against a Column argument raises
    # "Cannot convert column into bool"
    "count": (
        lambda c: (
            F.count(F.lit(1))
            if c is None or (isinstance(c, str) and c == "*")
            else F.count(c)
        ),
        F.sum,
    ),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, from_col: str, n_salt: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salt): pmod(hash(col), n)."""
    return df.withColumn(salt_col, F.pmod(F.hash(F.col(from_col)), F.lit(n_salt)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    n_salt: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> (agg_name, input_column) with
    agg_name in {sum, count, min, max, avg}. avg decomposes into
    sum+count so the final division is exact regardless of how rows
    were spread over salts.
    """
    partials = []
    finals = []
    post = []
    for out, (name, col) in aggs.items():
        if name == "avg":
            # AVG skips nulls in numerator AND denominator: the count
            # partial must be count(col), not count(*), or a null row
            # deflates the mean vs the unsalted plan
            partials += [F.sum(col).alias(f"__s_{out}"), F.count(col).alias(f"__c_{out}")]
            finals += [F.sum(f"__s_{out}").alias(f"__s_{out}"), F.sum(f"__c_{out}").alias(f"__c_{out}")]
            post.append((F.col(f"__s_{out}") / F.col(f"__c_{out}")).alias(out))
        elif name in _ALGEBRAIC:
            p, f = _ALGEBRAIC[name]
            partials.append(p(col).alias(out))
            finals.append(f(out).alias(out))
            post.append(F.col(out))
        else:
            raise ValueError(f"unsupported salted aggregate {name!r}")
    salted = with_salt(df, salt_from, n_salt)
    stage1 = salted.groupBy(*keys, "_salt").agg(*partials)
    stage2 = stage1.groupBy(*keys).agg(*finals)
    return stage2.select(*[F.col(k) for k in keys], *post)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the small side is replicated ``n_salt``
    times (explode of a sequence literal — map-side, no shuffle of the
    big side beyond the join's own exchange on (key, salt)).

    Only join types where an UNMATCHED small-side row emits nothing
    are allowed: for right/full outer the n_salt replicas of an
    unmatched small row would each emit a null-padded output row
    (n_salt duplicates vs the unsalted plan), so those raise."""
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"
    ):
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "replicated small-side rows would duplicate the output"
        )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return (
        with_salt(big, salt_from, n_salt)
        .join(replicated, [key, "_salt"], how)
        .drop("_salt")
    )


def skew_report(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnose key skew before choosing a remedy: per-key counts in
    one shuffle, then the tiny count table re-aggregates into a
    single summary row — total rows, distinct keys, the max/mean key
    population, a skew factor (max/mean; >> 1 means one reducer owns
    the job), the share of rows held by the hottest key, and the
    ``top`` hottest keys with counts. Feed the skew factor into
    ``n_salt`` for :func:`salted_agg` / :func:`salted_join` (a key
    ``s``× the mean wants ~``s`` salts to level its reducers)."""
    from environmental_stac_generator_spark.operators.lineage import (
        persist_tracked,
    )

    # pinned: the summary aggregate and the hottest top-k are two
    # independent actions over this groupBy — unpinned, each re-runs
    # the full input scan + per-key shuffle, doubling the cost of a
    # diagnostic that should be cheap (releasable via the tracked
    # registry, same pattern as bucket_pairs)
    counts = persist_tracked(df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")))
    key_repr = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    summary = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("n").alias("max_key_rows"),
        (F.sum("n") / F.count(F.lit(1))).alias("mean_key_rows"),
        (F.max("n") * F.count(F.lit(1)) / F.sum("n")).alias("skew_factor"),
        (F.max("n") / F.sum("n")).alias("top_key_share"),
    )
    # the hottest keys come from a TakeOrdered limit, NOT a
    # collect_list over every distinct key — at 10^8 distinct keys a
    # single aggregate row holding them all is the one-hot-reducer
    # pattern this module exists to avoid; only `top` structs ever
    # reach one task here (sort_array on <= top entries restores the
    # descending order the limit selected by). Boundary ties at the
    # limit break by key DESCENDING — the same order sort_array's
    # struct compare emits, so the selected set and the displayed
    # order always agree.
    hottest = (
        counts.orderBy(F.desc("n"), F.desc(key_repr))
        .limit(top)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("n"), key_repr.alias("key"))),
                asc=False,
            ).alias("hottest")
        )
    )
    return summary.crossJoin(F.broadcast(hottest))
