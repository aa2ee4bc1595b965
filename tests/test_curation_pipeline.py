"""End-to-end curation pipeline: stage semantics + report counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from environmental_stac_generator_spark.plans.curation_pipeline import (
    CurationConfig,
    curate,
)
from environmental_stac_generator_spark.tables import load


def test_curate_full_chain(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    probes = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") >= 5)
    cfg = CurationConfig(
        near_dup_jaccard=0.5,
        quality_min=0.3,
        sample_rates={"src0": 100, "src1": 50},
        default_rate=80,
        token_budget=15_000,
        seq_len=512,
    )
    res = curate(corpus, probes=probes, config=cfg)

    s = res.stats
    # monotonic survivor counts through the chain
    order = ["input", "exact_dedup", "near_dedup", "decontaminate",
             "quality_filter", "mixing", "budget"]
    counts = [s[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0

    sel = res.selected.collect()
    assert len(sel) == s["budget"]
    # budget respected
    assert sum(r["n_tokens"] for r in sel) <= cfg.token_budget
    # no contaminated doc survives: no selected doc shares a 3-gram
    # with any probe
    probe_sh = {
        tuple(t)
        for r in probes.collect()
        for t in zip(*(r["text"].split(" ")[i:] for i in range(3)))
    }
    for r in sel:
        toks = [row for row in r["text"].split(" ")]
        doc_sh = set(zip(toks, toks[1:], toks[2:]))
        assert not (doc_sh & probe_sh), r["doc_id"]

    # packing conserves tokens and numbers sequences contiguously
    packed = res.packed.collect()
    assert sum(r["tokens"] for r in packed) == sum(r["n_tokens"] for r in sel)
    seq_ids = sorted(r["seq_id"] for r in packed)
    assert seq_ids == list(range(len(seq_ids)))
    assert s["sequences"] == len(packed)


def test_curate_semantic_and_redact(spark, sf_dir):
    import re

    from environmental_stac_generator_spark.queries.text import (
        ENTITY_PATTERN,
        PII_PATTERN,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    cfg = CurationConfig(
        near_dup_jaccard=None,
        semantic_cosine=0.35,
        redact_pii=True,
    )
    res = curate(docs, config=cfg, embeddings=emb)
    s = res.stats
    assert "semantic_dedup" in s and "redact" in s
    # semantic dedup only drops rows; redaction drops none
    assert s["semantic_dedup"] <= s["exact_dedup"]
    assert s["redact"] == s["semantic_dedup"]
    # every semantic-duplicate loser is gone from the selection
    from environmental_stac_generator_spark.queries.similarity import (
        semantic_pairs_of,
    )

    # mirror the chain exactly: pairs are generated over the
    # exact-dedup SURVIVORS (not the full corpus — a doc must not
    # lose to a pair-mate already removed upstream), with the chain's
    # default auto clustering so the K matches too
    from environmental_stac_generator_spark.plans.curation_pipeline import (
        _exact_dedup,
    )

    survivors_in = _exact_dedup(docs).select("doc_id")
    losers = {
        r.vec_b
        for r in semantic_pairs_of(
            emb.join(survivors_in, "doc_id", "left_semi").select(
                F.col("doc_id").alias("vec_id"), "embedding"
            ),
            threshold=0.35,
            n_clusters="auto",
        ).collect()
    }
    survivors = {r.doc_id for r in res.selected.collect()}
    assert not (losers & survivors)
    # redaction scrubbed every PII / entity shape from surviving text
    pii = re.compile(PII_PATTERN)
    ent = re.compile(ENTITY_PATTERN)
    for r in res.selected.select("text").collect():
        assert not pii.search(r.text)
        assert not ent.search(r.text)


def test_curate_stages_optional(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    res = curate(docs, config=CurationConfig(near_dup_jaccard=None))
    assert "near_dedup" not in res.stats
    assert "decontaminate" not in res.stats
    # exact dedup only: survivor count equals distinct content hashes
    n_hashes = docs.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    assert res.stats["exact_dedup"] == n_hashes


def test_curate_importance_stage(spark, sf_dir):
    """`importance_target` keeps exactly the docs whose DSIR log-weight
    vs the target domain is positive, computed over the stage's own
    input (post-dedup survivors)."""
    from environmental_stac_generator_spark.queries.curation import (
        importance_logw_of,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    cfg = CurationConfig(near_dup_jaccard=None, importance_target="src0")
    res = curate(docs, config=cfg)
    assert "importance" in res.stats
    assert 0 < res.stats["importance"] < res.stats["exact_dedup"]

    # recompute expected winners over the same stage input
    survivors_in = docs.join(
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"),
        "doc_id",
    )
    expect = {
        r.doc_id
        for r in importance_logw_of(survivors_in, "src0")
        .filter(F.col("logw_micro") > 0)
        .collect()
    }
    got = {r.doc_id for r in res.selected.collect()}
    assert got == expect


def test_curate_perplexity_stage(spark, sf_dir):
    """`perplexity_max` keeps exactly the docs whose mean bigram NLL
    under the stage-input corpus LM is at or below the cut."""
    from environmental_stac_generator_spark.queries.text import perplexity_of

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    cut = 4.92
    cfg = CurationConfig(near_dup_jaccard=None, perplexity_max=cut)
    res = curate(docs, config=cfg)
    assert "perplexity" in res.stats
    assert 0 < res.stats["perplexity"] < res.stats["exact_dedup"]

    survivors_in = docs.join(
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id"),
        "doc_id",
    )
    expect = {
        r.doc_id
        for r in perplexity_of(survivors_in).collect()
        if r.n_bigrams > 0 and r.nll_micro <= r.n_bigrams * cut * 1e6
    }
    got = {r.doc_id for r in res.selected.collect()}
    assert got == expect


def test_curate_dedup_keep_best_quality(spark, tmp_path):
    """keep='best_quality' keeps the highest-quality member of each
    duplicate cluster; keep='first' keeps the lowest id."""
    base = " ".join(f"tok{i}" for i in range(40))
    extra = " ".join(f"extra{i}" for i in range(25))
    rows = [
        (1, base, "web"),                 # near-dup of 2, lower quality
        (2, f"{base} {extra}", "web"),    # longer, more diverse: higher quality
        (3, " ".join(f"solo{i}" for i in range(30)), "web"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    first = curate(df, config=CurationConfig())
    assert {r.doc_id for r in first.selected.collect()} == {1, 3}

    best = curate(df, config=CurationConfig(dedup_keep="best_quality"))
    assert {r.doc_id for r in best.selected.collect()} == {2, 3}
    assert best.stats["near_dedup"] == 2


def test_exact_dedup_passes_null_text_through(spark):
    """N distinct null-text docs share md5(NULL)=NULL — they are
    missing data, not duplicates; all must survive exact dedup."""
    from environmental_stac_generator_spark.plans.curation_pipeline import (
        _exact_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "same", "s"), (2, "same", "s"), (3, None, "s"), (4, None, "s")],
        "doc_id long, text string, source string",
    )
    got = sorted(r["doc_id"] for r in _exact_dedup(docs).collect())
    assert got == [1, 3, 4]


def test_semantic_cosine_without_embeddings_rejected(spark):
    """A requested filter silently not applied is a config error."""
    import pytest

    from environmental_stac_generator_spark.plans.curation_pipeline import (
        CurationConfig,
        curate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="embeddings"):
        curate(docs, config=CurationConfig(semantic_cosine=0.9))


def test_redact_matches_with_pii_fingerprint(spark):
    """The chain's redaction and with_pii's fingerprint share ONE
    expression: md5 of the redacted text equals redacted_fp."""
    import pyspark.sql.functions as F

    from environmental_stac_generator_spark.plans.curation_pipeline import _redact
    from environmental_stac_generator_spark.queries.text import with_pii

    docs = spark.createDataFrame(
        [(1, "mail me at a@b.com from 10.0.0.1", "s")],
        "doc_id long, text string, source string",
    )
    fp = with_pii(docs).select("doc_id", "redacted_fp")
    red = _redact(docs).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    row = fp.join(red, "doc_id").first()
    assert row["redacted_fp"] == row["h"]
