"""Single-pass declarative validation over the documents table."""

from __future__ import annotations

import pyspark.sql.functions as F

from environmental_stac_generator_spark.operators import validate as V
from environmental_stac_generator_spark.tables import load


def _rules():
    return [
        V.not_null("doc_id"),
        V.unique("doc_id"),
        V.row_count_min(100),
        V.in_range("n_chars", 0, 10**9),
        V.in_set("lang", ["en", "de", "fr", "es", "xx"], tolerance=1.0),
        V.matches("source", r"^src\d+$"),
    ]


def test_validate_clean_table(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = V.validate(docs, _rules()).collect()
    assert len(out) == len(_rules())
    by = {(r["rule"], r["column"]): r for r in out}
    assert by[("not_null", "doc_id")]["ok"]
    assert by[("not_null", "doc_id")]["metric"] == 0.0
    assert by[("unique", "doc_id")]["ok"]
    assert by[("row_count_min", None)]["ok"]
    assert by[("row_count_min", None)]["metric"] == 500.0
    assert by[("in_range", "n_chars")]["ok"]
    assert by[("matches", "source")]["ok"]


def test_validate_flags_violations(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "lang", F.when(F.col("doc_id") % 10 == 0, None).otherwise(F.col("lang"))
    )
    rules = [
        V.not_null("lang"),                    # 10% nulls -> fail
        V.not_null("lang", tolerance=0.2),     # within tolerance -> pass
        V.in_range("doc_id", 0, 100),          # most ids above -> fail
        V.row_count_min(10**6),                # too few rows -> fail
    ]
    out = {i: r for i, r in enumerate(V.validate(docs, rules).collect())}
    assert not out[0]["ok"] and abs(out[0]["metric"] - 0.1) < 1e-9
    assert out[1]["ok"]
    assert not out[2]["ok"]
    assert not out[3]["ok"]


def test_validate_exact_unique_catches_dups(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    dup = docs.unionByName(docs.limit(25))
    res = {
        r["rule"]: r
        for r in V.validate(dup, [V.unique("doc_id")], exact_unique=True).collect()
    }
    assert not res["unique"]["ok"]
    assert abs(res["unique"]["metric"] - 25 / 525) < 1e-9


def test_validate_is_one_job_one_aggregate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    plan = (
        V.validate(docs, _rules())
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # one aggregate over one scan, not one per rule
    assert plan.count("Aggregate") <= 2  # partial+final at most
    assert plan.count("relation") <= 1 or plan.count("Relation") <= 1


def test_empty_input_is_determinate(spark):
    """sum over zero rows is NULL — without coalesce, metric/ok were
    NULL on an empty table and `.filter('NOT ok')` silently PASSED an
    empty upstream output. Every rule must come back with a real
    boolean; the row-count rule is what trips."""
    import environmental_stac_generator_spark.operators.validate as V

    empty = spark.createDataFrame([], "doc_id long, source string")
    report = V.validate(
        empty,
        [V.not_null("doc_id"), V.unique("doc_id"), V.row_count_min(1)],
    ).collect()
    by_rule = {r["rule"]: r for r in report}
    assert all(r["ok"] is not None for r in report)
    assert by_rule["not_null"]["ok"] is True and by_rule["not_null"]["metric"] == 0.0
    assert by_rule["unique"]["ok"] is True
    assert by_rule["row_count_min"]["ok"] is False


def test_empty_rule_list_rejected(spark):
    import pytest

    import environmental_stac_generator_spark.operators.validate as V

    with pytest.raises(ValueError, match="at least one rule"):
        V.validate(spark.range(3), [])
