"""Text analysis operators (SURVEY §2.11 north-star extensions).

Language-ID (marker-token heuristic), quality scoring, token
counting, and content fingerprinting over the ``documents`` table.
Everything is built-in string/array functions — one map pass, no
Python, no shuffle except the final small aggregations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd, sql_rnd
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load

STOPWORDS = ["the", "a", "of", "and", "to"]

# marker-token groups for the n-gram-free language heuristic
LANG_MARKERS = {
    "en": ["the", "a"],
    "db": ["table", "row", "column"],
    "ops": ["join", "merge", "sort"],
    "qry": ["query", "filter", "scan"],
    "sys": ["spark", "stream", "batch"],
}


TOKEN_COUNT_SQL = """
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
           length(text) AS n_chars
    FROM documents
    """


@register(
    "token_count",
    TOKEN_COUNT_SQL,
    doc="Token counting: whitespace tokenizer + BPE-ish regex "
    "tokenizer + char count, all codegen'd string ops.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_profile(spark, sf_dir).select(
        "doc_id", "ws_tokens", "re_tokens", "n_chars"
    )


_STOPWORD_FRAC = (
    "CAST(sum(CASE WHEN tok IN ("
    + ", ".join("'" + w + "'" for w in STOPWORDS)
    + ") THEN 1 ELSE 0 END) AS DOUBLE) / count(*)"
)

QUALITY_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    stats AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             {sql_rnd("avg(length(tok))", 4)} AS avg_token_len,
             {sql_rnd(_STOPWORD_FRAC, 4)}
               AS stopword_ratio,
             {sql_rnd("CAST(count(DISTINCT tok) AS DOUBLE) / count(*)", 4)}
               AS distinct_ratio
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, distinct_ratio,
           {sql_rnd("0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * distinct_ratio + 0.3 * (1.0 - stopword_ratio)", 4)} AS quality
    FROM stats
    """


@register(
    "quality_score",
    QUALITY_SQL,
    doc="Quality scoring: length, stopword ratio, lexical diversity "
    "combined into a [0,1] score — the standard pretraining-corpus "
    "heuristic filter, fully relational.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_of(load(spark, sf_dir, "documents", fan_out=True))


def quality_of(d: DataFrame) -> DataFrame:
    """Per-doc quality stats for a (doc_id, text) frame."""
    return with_quality(d).select(
        "doc_id",
        "n_tokens",
        "avg_token_len",
        "stopword_ratio",
        "distinct_ratio",
        "quality",
    )


def with_quality(d: DataFrame) -> DataFrame:
    """Append per-doc quality columns to a frame with a ``text``
    column, keeping every existing column.

    Map-side only: every component is an array expression over the
    in-row token list — no explode + groupBy shuffle of the corpus
    and no self-join to reattach scores; at 100 TB this is one
    codegen'd scan."""
    toks = d.withColumn("_ts", F.split("text", " "))
    n = F.size("_ts").cast("double")
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    stats = toks.select(
        *d.columns,
        F.size("_ts").cast("long").alias("n_tokens"),
        rnd(
            F.expr("aggregate(_ts, 0, (acc, t) -> acc + length(t))").cast("double") / n,
            4,
        ).alias("avg_token_len"),
        rnd(
            F.size(F.expr(f"filter(_ts, t -> array_contains({stop_arr}, t))")).cast("double") / n,
            4,
        ).alias("stopword_ratio"),
        rnd(F.size(F.array_distinct("_ts")).cast("double") / n, 4).alias("distinct_ratio"),
    )
    quality = rnd(0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.3 * F.col("distinct_ratio")
        + 0.3 * (1.0 - F.col("stopword_ratio")), 4)
    return stats.withColumn("quality", quality)


_REPETITION_SQL = f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1])) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 2
    ),
    counts AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    rep AS (
      SELECT doc_id, max(c) AS mx,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
             sum(c) AS n
      FROM counts GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(r.n, 0) AS BIGINT) AS n_2grams,
           {sql_rnd("COALESCE(CAST(r.mx AS DOUBLE) / r.n, 0.0)", 4)}
             AS top2gram_frac,
           {sql_rnd("COALESCE(CAST(r.dup AS DOUBLE) / r.n, 0.0)", 4)}
             AS dup2gram_frac
    FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id
    """

def _runs_expr(grams_col: str) -> str:
    """Sorted-run scan over the in-row 2-gram array ``grams_col``:
    ONE aggregate pass over array_sort carries (prev, run, max-run,
    dup-positions). Equivalent to explode → groupBy(doc_id, gram) →
    count, but map-side: nothing corpus-sized ever shuffles, which is
    what makes repetition filtering feasible on a 100 TB corpus. A
    function of the column name — the previous constant was rewired
    per call site with a blanket ``.replace("grams", ...)`` that
    would corrupt the SQL if any field or literal ever contained the
    substring."""
    return (
        f"aggregate(array_sort({grams_col}), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'mx', 0L, 'dup', 0L), "
        "(acc, g) -> IF(acc.prev IS NOT NULL AND g = acc.prev, "
        "named_struct('prev', g, 'run', acc.run + 1L, 'mx', acc.mx, 'dup', acc.dup), "
        "named_struct('prev', g, 'run', 1L, 'mx', greatest(acc.mx, acc.run), "
        "'dup', acc.dup + IF(acc.run > 1L, acc.run, 0L))), "
        "acc -> named_struct('mx', greatest(acc.mx, acc.run), "
        "'dup', acc.dup + IF(acc.run > 1L, acc.run, 0L)))"
    )


def _with_repetition(df: DataFrame, ts: str = "ts") -> DataFrame:
    """Append (n_2grams, top2gram_frac, dup2gram_frac) to a frame
    holding an in-row token-array column — pure map-side; the runs
    struct is projected once so the aggregate runs once per row."""
    grams = (
        f"IF(size({ts}) >= 2, transform(sequence(0, size({ts}) - 2), "
        f"i -> concat_ws(' ', {ts}[i], {ts}[i+1])), "
        "cast(array() as array<string>))"
    )
    staged = df.withColumn("_grams", F.expr(grams)).withColumn(
        "_runs", F.expr(_runs_expr("_grams"))
    )
    n = F.size("_grams").cast("long")
    return staged.select(
        *df.columns,
        n.alias("n_2grams"),
        F.when(n > 0, rnd(F.col("_runs.mx").cast("double") / n, 4))
        .otherwise(0.0)
        .alias("top2gram_frac"),
        F.when(n > 0, rnd(F.col("_runs.dup").cast("double") / n, 4))
        .otherwise(0.0)
        .alias("dup2gram_frac"),
    )


@register(
    "repetition_profile",
    _REPETITION_SQL,
    doc="Repetition metrics (the Gopher-style quality filter): "
    "fraction of token 2-gram positions covered by the most frequent "
    "2-gram and by any duplicated 2-gram. Computed map-side as a "
    "sorted-run scan of the in-row gram array — no explode/groupBy "
    "shuffle of corpus n-grams at any scale.",
)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents", fan_out=True)
    toks = d.select("doc_id", F.split("text", " ").alias("ts"))
    return _with_repetition(toks).drop("ts")


def _duck_marker_count(markers: list[str]) -> str:
    inlist = ", ".join("'" + m + "'" for m in markers)
    return f"sum(CASE WHEN tok IN ({inlist}) THEN 1 ELSE 0 END)"


_LANG_ID_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    scores AS (
      SELECT doc_id,
             {_duck_marker_count(LANG_MARKERS["en"])} AS s_en,
             {_duck_marker_count(LANG_MARKERS["db"])} AS s_db,
             {_duck_marker_count(LANG_MARKERS["ops"])} AS s_ops,
             {_duck_marker_count(LANG_MARKERS["qry"])} AS s_qry,
             {_duck_marker_count(LANG_MARKERS["sys"])} AS s_sys
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN s_en >= s_db AND s_en >= s_ops AND s_en >= s_qry
                     AND s_en >= s_sys THEN 'en'
                WHEN s_db >= s_ops AND s_db >= s_qry AND s_db >= s_sys THEN 'db'
                WHEN s_ops >= s_qry AND s_ops >= s_sys THEN 'ops'
                WHEN s_qry >= s_sys THEN 'qry'
                ELSE 'sys' END AS predicted_lang
    FROM scores
    """

_FINGERPRINT_SQL = """
    SELECT doc_id,
           md5(lower(text)) AS exact_fp,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS bow_fp
    FROM documents
    """


@register(
    "lang_id",
    _LANG_ID_SQL,
    doc="Language-ID heuristic: argmax of marker-token counts with a "
    "fixed tie-break order — the n-gram-profile langid pattern "
    "expressed as a single aggregation.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_profile(spark, sf_dir).select("doc_id", "predicted_lang")


@register(
    "doc_fingerprint",
    _FINGERPRINT_SQL,
    doc="Document fingerprinting: exact content hash + bag-of-words "
    "hash (order-insensitive) — the rolling-hash family's relational "
    "stand-ins for dedup keys.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_profile(spark, sf_dir).select("doc_id", "exact_fp", "bow_fp")


# ---------------------------------------------------------------------------
# PII / sensitive-entity scan — the redaction pass of a training-data
# pipeline. Two pattern classes: real PII shapes (emails, IPv4,
# US-style phone numbers — regexes portable between Java regex and
# RE2) and a configurable sensitive-term list (the NER-redaction
# stand-in; demonstrated on terms that occur in the corpus so the
# check exercises nonzero counts and a changed fingerprint).
# Everything is per-row regex work — a pure map stage at any scale.

PII_PATTERN = (
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    "|\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    "|\\b\\d{3}-\\d{3}-\\d{4}\\b"
)
ENTITY_PATTERN = "\\bcustomer\\b|\\bsupplier\\b"

_PII_SQL = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_PATTERN}')) AS BIGINT)
             AS n_pii,
           CAST(len(regexp_extract_all(text, '{ENTITY_PATTERN}')) AS BIGINT)
             AS n_entities,
           md5(regexp_replace(regexp_replace(text, '{PII_PATTERN}', '<PII>', 'g'),
                              '{ENTITY_PATTERN}', '<ENT>', 'g')) AS redacted_fp
    FROM documents
    """


def redacted_text_col(col: str = "text") -> Column:
    """THE redaction expression — matches replaced by <PII>/<ENT>
    tags. One definition shared by the fingerprinting scan
    (:func:`with_pii`) and the curate chain's rewrite stage
    (``plans.curation_pipeline._redact``), so the invariant "the
    redacted fingerprint matches the text the chain actually
    produces" cannot drift between two copies."""
    return F.regexp_replace(
        F.regexp_replace(col, PII_PATTERN, "<PII>"),
        F.lit(ENTITY_PATTERN),
        F.lit("<ENT>"),
    )


def with_pii(d: DataFrame) -> DataFrame:
    """Append (n_pii, n_entities, redacted_fp) to a frame with a
    ``text`` column. Row-local regex counting + redaction — codegen'd
    string ops, no shuffle; the redacted fingerprint pins the exact
    post-redaction content so a downstream writer can verify the
    redaction actually happened."""
    redacted = redacted_text_col("text")
    return d.select(
        *d.columns,
        F.regexp_count("text", F.lit(PII_PATTERN)).cast("long").alias("n_pii"),
        F.regexp_count("text", F.lit(ENTITY_PATTERN)).cast("long").alias("n_entities"),
        F.md5(redacted.cast("binary")).alias("redacted_fp"),
    )


@register(
    "pii_scan",
    _PII_SQL,
    doc="PII / sensitive-entity scan: count email/IPv4/phone shapes "
    "and configured sensitive terms per document, and fingerprint the "
    "redacted text (matches replaced by <PII>/<ENT> tags) — the "
    "redaction pass of a curation pipeline, one map-side regex scan.",
)
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_pii(
        load(spark, sf_dir, "documents", fan_out=True).select("doc_id", "text")
    ).drop(
        "text"
    )


# Merged single-scan text profile (token_count + lang_id +
# doc_fingerprint): the consolidated registry's ``text_profile`` row.
# All metrics are array/string expressions over the in-row token list
# — one codegen'd map pass over the corpus, no joins, no shuffle.
# The oracle joins the three per-doc sub-selects on doc_id (the
# oracle never needs to scale).


TEXT_PROFILE_SQL = f"""
    SELECT t.doc_id, t.ws_tokens, t.re_tokens, t.n_chars,
           l.predicted_lang, f.exact_fp, f.bow_fp,
           r.n_2grams, r.top2gram_frac, r.dup2gram_frac,
           p.n_pii, p.n_entities, p.redacted_fp
    FROM ({TOKEN_COUNT_SQL}) t
    JOIN ({_LANG_ID_SQL}) l ON t.doc_id = l.doc_id
    JOIN ({_FINGERPRINT_SQL}) f ON t.doc_id = f.doc_id
    JOIN ({_REPETITION_SQL}) r ON t.doc_id = r.doc_id
    JOIN ({_PII_SQL}) p ON t.doc_id = p.doc_id
    """


def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan text analysis: token counts, language-ID heuristic,
    and content fingerprints as a single projection over documents."""
    d = load(spark, sf_dir, "documents", fan_out=True)
    scored = d.select(
        "doc_id",
        "text",
        F.split("text", " ").alias("ts"),
        *[
            F.size(
                F.expr(
                    "filter(split(text, ' '), t -> array_contains(array("
                    + ", ".join(f"'{m}'" for m in markers)
                    + "), t))"
                )
            ).alias(f"s_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    s = {k: F.col(f"s_{k}") for k in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["db"])
            & (s["en"] >= s["ops"])
            & (s["en"] >= s["qry"])
            & (s["en"] >= s["sys"]),
            "en",
        )
        .when((s["db"] >= s["ops"]) & (s["db"] >= s["qry"]) & (s["db"] >= s["sys"]), "db")
        .when((s["ops"] >= s["qry"]) & (s["ops"] >= s["sys"]), "ops")
        .when(s["qry"] >= s["sys"], "qry")
        .otherwise("sys")
    )
    base = with_pii(
        scored.select(
            "doc_id",
            "text",
            "ts",
            F.size("ts").alias("ws_tokens"),
            F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias(
                "re_tokens"
            ),
            F.length("text").alias("n_chars"),
            predicted.alias("predicted_lang"),
            F.md5(F.lower("text").cast("binary")).alias("exact_fp"),
            F.md5(
                F.concat_ws(" ", F.array_sort(F.array_distinct("ts"))).cast("binary")
            ).alias("bow_fp"),
        )
    ).drop("text")
    return _with_repetition(base).drop("ts")


# ---------------------------------------------------------------------------
# CCNet-style perplexity quality filter (Wenzek et al. 2020): score
# each document by a bigram language model and keep/flag low-perplexity
# (fluent) text. The LM here is a hashed add-one-smoothed bigram model
# trained on the corpus itself — the same fixed-bucket hashing trick
# DSIR uses (importance_weights), which makes both count tables
# constant-size (NB_LM rows) and therefore BROADCAST joins: at 100 TB
# the plan is one bigram explode, two tiny aggregates, two broadcast
# joins, and an integer partial-agg shuffle per doc. Per-bigram log
# terms round once to 6-dp micro-integers so every per-doc score is an
# ORDER-INDEPENDENT integer sum (bit-stable at any parallelism).

NB_LM = 4096  # hashed LM buckets (bigram numerator + unigram context)


def _lm_spark_bucket(col: str) -> str:
    return f"cast(conv(substr(md5({col}), 1, 4), 16, 10) as bigint) % {NB_LM}"


def _lm_duck_bucket(col: str) -> str:
    return f"CAST(concat('0x', substr(md5({col}), 1, 4)) AS BIGINT) % {NB_LM}"


PERPLEXITY_SQL = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bgrams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS bg
      FROM w WHERE len(w) >= 2
    ),
    ctx AS (
      SELECT {_lm_duck_bucket("split_part(bg, ' ', 1)")} AS b1, count(*) AS c1
      FROM bgrams GROUP BY 1
    ),
    big AS (
      SELECT {_lm_duck_bucket("bg")} AS b2, count(*) AS c2
      FROM bgrams GROUP BY 1
    ),
    scored AS (
      SELECT g.doc_id,
             CAST(floor((ln(u.c1 + {NB_LM}) - ln(b.c2 + 1.0))
                        * 1000000.0 + 0.5) AS BIGINT) AS nll
      FROM bgrams g
      JOIN big b ON {_lm_duck_bucket("g.bg")} = b.b2
      JOIN ctx u ON {_lm_duck_bucket("split_part(g.bg, ' ', 1)")} = u.b1
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS nll_micro
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(p.nll_micro, 0) AS BIGINT) AS nll_micro
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


def perplexity_of(d: DataFrame, lm: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_bigrams, nll_micro) per document of a (doc_id,
    text) frame: total negative log-likelihood (6-dp micro-integer
    sum) under a hashed add-one bigram LM whose counts come from
    ``lm`` (a reference corpus) or from ``d`` itself. Lower
    nll_micro / n_bigrams = more target-like text (the CCNet filter
    keeps the low-perplexity tail)."""
    lm = lm if lm is not None else d
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    lm_w = lm.select(F.split("text", " ").alias("w"))

    def bgrams(frame: DataFrame, cols: list[str]) -> DataFrame:
        return frame.filter(F.size("w") >= 2).select(
            *cols,
            F.explode(
                F.expr("transform(sequence(1, size(w) - 1), "
                       "i -> concat(w[i-1], ' ', w[i]))")
            ).alias("bg"),
        )

    # both count tables come from the one bigram relation: the
    # denominator is the CONTEXT count (bigrams grouped by first
    # token) — the true bigram-MLE denominator — so no separate
    # token explode is needed.
    g = bgrams(w, ["doc_id"]).select(
        "doc_id",
        F.expr(_lm_spark_bucket("bg")).alias("b2"),
        F.expr(_lm_spark_bucket("substring_index(bg, ' ', 1)")).alias("b1"),
    )
    if lm is d:
        # self-LM: the scoring relation IS the count source, so the
        # bucketed (doc_id, b1, b2) bigram relation — ints only,
        # ~shuffle-sized, never the text — is materialized ONCE
        # (lazily; the first broadcast build runs the explode) and
        # feeds both count aggregates and the scoring join. One corpus
        # explode instead of three. (An earlier driver-collected
        # single-pass variant measured slower: blocking collects
        # serialize stages that lazy branches run concurrently —
        # stored-partition reads keep the fan-out lazy.)
        from environmental_stac_generator_spark.operators.lineage import (
            cut_lineage,
        )

        g = cut_lineage(g, eager=False)
        uni = g.groupBy("b1").agg(F.count(F.lit(1)).alias("c1"))
        big = g.groupBy("b2").agg(F.count(F.lit(1)).alias("c2"))
    else:
        # held-out reference LM: counts come from the lm corpus, the
        # scores from d — two distinct relations, two lazy branches
        # whose scans run as concurrent stages
        lm_bg = bgrams(lm_w, [])
        uni = (
            lm_bg.select(
                F.expr(_lm_spark_bucket("substring_index(bg, ' ', 1)")).alias("b1")
            )
            .groupBy("b1")
            .agg(F.count(F.lit(1)).alias("c1"))
        )
        big = (
            lm_bg.select(F.expr(_lm_spark_bucket("bg")).alias("b2"))
            .groupBy("b2")
            .agg(F.count(F.lit(1)).alias("c2"))
        )
    # LEFT joins + coalesce-to-0: under a held-out reference LM a
    # scored bigram's bucket may not occur in the reference corpus at
    # all — an inner join would DROP exactly those highest-NLL
    # (unseen) terms, making out-of-domain text score as MORE fluent,
    # the opposite of the CCNet filter's purpose. Add-one smoothing
    # handles the zeros: nll = ln(0 + NB_LM) - ln(0 + 1) for a fully
    # unseen bucket. On the self-LM path the joins are total, so the
    # coalesce never fires and values are unchanged.
    nll = (
        F.floor(
            (
                F.log(F.coalesce(F.col("c1"), F.lit(0)) + NB_LM)
                - F.log(F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
            )
            * 1e6
            + F.lit(0.5)
        )
    ).cast("bigint")
    per_doc = (
        g.join(F.broadcast(big), "b2", "left")
        .join(F.broadcast(uni), "b1", "left")
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("nll").alias("nll_micro"))
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("bigint").alias("nll_micro"),
        )
    )


@register(
    "perplexity_score",
    PERPLEXITY_SQL,
    doc="CCNet-style perplexity scoring: per-doc negative "
    f"log-likelihood under a hashed ({NB_LM}-bucket) add-one bigram "
    "LM of the corpus — the classic fluency filter for pretraining "
    "data (keep the low-perplexity tail). Both count tables are "
    "constant-size and broadcast; per-bigram log terms are "
    "micro-integer rounded so the per-doc sum is order-independent.",
)
def perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return perplexity_of(load(spark, sf_dir, "documents", fan_out=True))
