"""Deduplication operators (SURVEY §2.11 north-star extensions).

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard dedup over the
``documents`` table. All variants are expressed relationally (explode
shingles → hash → min-aggregate → bucket-join) so they are one or two
shuffles regardless of corpus size; the only per-doc state is a
constant-size signature. The hash family is md5 (identical in every
engine) so the DuckDB oracles verify values bit-for-bit.

Scale notes (100 TB corpus):
- signatures are O(docs × k) rows, tiny next to the corpus;
- the LSH bucket join only pairs docs sharing a band, so candidate
  pairs stay near-linear instead of O(n²);
- the shingle explode is a generated column, never materialized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd
from environmental_stac_generator_spark.registry import register
from environmental_stac_generator_spark.tables import load

N_HASHES = 8  # minhash signature length
BAND_SIZE = 2  # LSH band = 2 hashes -> 4 bands

# Spark-side shingle expression: word 3-grams from a whitespace split.
_SPARK_SHINGLES = (
    "transform(sequence(0, size(words) - 3),"
    " i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"
)
# DuckDB equivalent (1-based lists, range() end-exclusive).
_DUCK_SHINGLES = (
    "list_transform(range(1, len(words) - 1),"
    " i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])"
)


def shingles_of(d: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded word 3-grams of a (doc_id, text)
    frame — the ONE shingle projection (decontamination and the
    Jaccard probes both consume it; previously re-implemented
    locally in three places)."""
    return (
        d.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle"))
    )


def _spark_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + exploded distinct 3-gram shingles."""
    return shingles_of(load(spark, sf_dir, "documents", fan_out=True)).distinct()


_DUCK_SHINGLED = f"""
    shingled AS (
      SELECT DISTINCT doc_id, unnest({_DUCK_SHINGLES}) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
    )
"""


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS survivor_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content, deterministic survivor "
    "= min(doc_id). One shuffle on the hash.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash")).agg(
        F.min("doc_id").alias("survivor_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# MinHash universal-hash family h_k(x) = (a_k·x + b_k) mod P over a
# single 32-bit base hash per shingle. One md5 per shingle instead of
# one per (shingle, k) — measured 2.3x faster at sf0.1, and the ratio
# grows with k. a_k < 2^31 and x < 2^32 (32-bit md5 prefix; the % P
# is a formality since x < P always) keep a_k·x + b_k inside int64 in
# both engines (no overflow, bit-identical arithmetic); see
# tests/test_properties.py for the machine-checked bound.
MINHASH_P = 4294967311  # smallest prime > 2^32
_M31 = 2147483647
A_COEF = [((2 * k + 1) * 1103515245 + 12345) % _M31 for k in range(N_HASHES)]
B_COEF = [(k * 40503 + 17) % MINHASH_P for k in range(N_HASHES)]

_SPARK_BASE_HASH = (
    "transform(shingles, s -> "
    "cast(conv(substr(md5(cast(s as binary)), 1, 8), 16, 10) as bigint)"
    f" % {MINHASH_P})"
)
_DUCK_BASE_HASH = (
    "list_transform(shingles, s -> "
    "CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)"
    f" % {MINHASH_P})"
)
# Shared CTE prefix: doc_id + base-hash array per doc (map-side only).
_DUCK_HASHED = f"""
    shingled AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
    ),
    hashed AS (SELECT doc_id, {_DUCK_BASE_HASH} AS hv FROM shingled)
"""


def _duck_min(k: int) -> str:
    return (
        f"list_min(list_transform(hv, x -> "
        f"({A_COEF[k]} * x + {B_COEF[k]}) % {MINHASH_P}))"
    )


def signatures_of(d: DataFrame) -> DataFrame:
    """doc_id, h0..h{k-1} for a (doc_id, text) frame: ZERO-shuffle
    minhash signature — ONE aggregate pass over the in-row shingle
    array carries a k-wide running-minimum accumulator (zip_with +
    least), a pure map stage that scans the shingles once, not once
    per permutation. The naive explode × k × groupBy version shuffles
    k × corpus rows; this shuffles nothing, which is the difference
    between feasible and not at 100 TB."""
    docs = (
        d.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .withColumn("shingles", F.expr(_SPARK_SHINGLES))
        .withColumn("hv", F.expr(_SPARK_BASE_HASH))
    )
    a_arr = ", ".join(f"{a}L" for a in A_COEF)
    b_arr = ", ".join(f"{b}L" for b in B_COEF)
    agg = F.expr(
        f"aggregate(hv, array_repeat(9223372036854775807L, {N_HASHES}), "
        f"(acc, x) -> zip_with(acc, transform(sequence(0, {N_HASHES - 1}), "
        f"k -> (element_at(array({a_arr}), k + 1) * x "
        f"+ element_at(array({b_arr}), k + 1)) % {MINHASH_P}L), "
        "(m, v) -> least(m, v)))"
    )
    return docs.withColumn("mh", agg).select(
        "doc_id", *[F.col("mh")[k].alias(f"h{k}") for k in range(N_HASHES)]
    )


def _signature_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return signatures_of(load(spark, sf_dir, "documents", fan_out=True))


@register(
    "minhash_signatures",
    f"""
    WITH {_DUCK_HASHED},
    wide AS (
      SELECT doc_id,
             {", ".join(f"{_duck_min(k)} AS h{k}" for k in range(N_HASHES))}
      FROM hashed
    )
    SELECT doc_id, CAST(k AS INT) AS k,
           CASE k {" ".join(f"WHEN {k} THEN h{k}" for k in range(N_HASHES))} END AS minhash
    FROM wide CROSS JOIN range({N_HASHES}) r(k)
    """,
    doc="MinHash signatures: universal hash family (a_k·md5_32 + b_k) "
    "mod P; signature = per-doc min of each permutation. One md5 per "
    "shingle, k cheap affine transforms — map-side only.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _signature_wide(spark, sf_dir)
    stack_args = ", ".join(f"{k}, h{k}" for k in range(N_HASHES))
    return wide.select(
        "doc_id", F.expr(f"stack({N_HASHES}, {stack_args}) AS (k, minhash)")
    ).select("doc_id", F.col("k").cast("int").alias("k"), "minhash")


N_BANDS = N_HASHES // BAND_SIZE


def _band_cols(k0: int) -> tuple[str, str]:
    """(spark_expr, duck_expr) for the md5 band hash over
    h{k0}..h{k0+BAND_SIZE-1}, '|'-joined in k order."""
    hs = [f"h{k}" for k in range(k0, k0 + BAND_SIZE)]
    spark = (
        "md5(cast(concat_ws('|', "
        + ", ".join(f"cast({h} as string)" for h in hs)
        + ") as binary))"
    )
    duck = "md5(" + " || '|' || ".join(f"CAST({h} AS VARCHAR)" for h in hs) + ")"
    return spark, duck


def bucket_pairs(
    members: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    max_bucket: int = 100_000,
    bound_rows: int | None = None,
) -> DataFrame:
    """Ordered id pairs per bucket, skew-safe.

    Routing is by a COUNTED size, not a collected array: a cheap
    per-bucket ``count(*)`` (single-phase, map-side combine — the
    shuffle carries one partial row per bucket per task) finds the
    over-cap keys before any bucket is ever materialized as one
    in-memory object. The pre-r7 shape filtered
    ``size(collect_set(...))`` AFTER the collect, so a viral bucket's
    full member array was still built in a single aggregation buffer
    — the exact executor-memory blow-up ``max_bucket`` exists to
    prevent (caught by the r7 natural-regime soak work). ``count(*)``
    is an UPPER BOUND on the distinct size (callers feed one row per
    (bucket, id)); over-routing a duplicate-heavy bucket to the
    blocked path only changes the plan, never the pair set, because
    that path dedups first.

    - Small buckets (the near-dup common case) anti-join away the
      over-cap keys — a relation bounded by rows/``max_bucket``, so
      AQE broadcasts it (and with zero mega keys, empty-relation
      propagation collapses the anti-join entirely, leaving the same
      single collect-shuffle plan as before the routing existed) —
      then collect into an in-row sorted array bounded by
      ``max_bucket`` and generate pairs MAP-SIDE, no join.
    - Mega buckets take :func:`operators.skew.blocked_self_pairs`:
      the bucket is hash-split into ~``max_bucket``-row blocks and
      pairs are enumerated per block-pair reducer, so one viral
      bucket's O(n²) work runs at S² task width instead of on the one
      reducer that owns its key (which is where a plain
      bucket-keyed self-join — the previous fallback — puts it).

    The persisted relation is the (bucket, id) projection (ids only,
    never text), consumed by the count pass and both routed sides;
    the pin is TRACKED (``lineage.persist_tracked``) so the curate
    chain / engine release it once downstream materializes — no
    unbounded per-input-frame accumulation (ADVICE r4).

    ``bound_rows`` is a driver-known upper bound on the rows of
    ``members`` PER DISTINCT BUCKET (callers pass the source row
    count: each source row contributes at most one member row per
    bucket key). When stats PROVE it at or under ``max_bucket``
    (:func:`tables.provably_small` — the shared CBO gate, honoring
    ``force_scale_plans``), no bucket can be mega, so the whole
    routing apparatus — the tracked persist, the count pass, the
    anti-join, the empty blocked-path union — is provably dead plan
    weight and the collect path runs alone as a single-consumer
    pipeline (r16; measured ~2x fewer stages on the LSH family).
    Unknown bounds keep the full skew-safe routing, as always."""
    from environmental_stac_generator_spark.operators.lineage import (
        persist_tracked,
    )
    from environmental_stac_generator_spark.operators.skew import (
        blocked_self_pairs,
    )
    from environmental_stac_generator_spark.tables import provably_small

    if provably_small(bound_rows, max_bucket):
        return (
            members.select(*bucket_cols, id_col)
            .groupBy(*bucket_cols)
            .agg(F.sort_array(F.collect_set(id_col)).alias("ds"))
            .filter(F.size("ds") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ds, (a, i) -> "
                        "transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))"
                    )
                ).alias("p")
            )
            .select(
                F.col("p.doc_a").alias("doc_a"),
                F.col("p.doc_b").alias("doc_b"),
            )
            .distinct()
        )

    ids = persist_tracked(members.select(*bucket_cols, id_col))
    mega_keys = (
        ids.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
    )
    small_pairs = (
        ids.join(
            mega_keys.select(*bucket_cols), list(bucket_cols), "left_anti"
        )
        .groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (a, i) -> "
                    "transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))"
                )
            ).alias("p")
        )
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )
    mega = ids.join(mega_keys, list(bucket_cols)).dropDuplicates(
        [*bucket_cols, id_col]
    )
    big_pairs = blocked_self_pairs(
        mega, list(bucket_cols), id_col, "_n", max_bucket
    ).select(
        F.col(f"a_{id_col}").alias("doc_a"), F.col(f"b_{id_col}").alias("doc_b")
    )
    return small_pairs.unionByName(big_pairs).distinct()


@register(
    "lsh_candidate_pairs",
    f"""
    WITH {_DUCK_HASHED},
    wide AS (
      SELECT doc_id,
             {", ".join(f"{_duck_min(k)} AS h{k}" for k in range(N_HASHES))}
      FROM hashed
    ),
    bands AS (
      SELECT doc_id, CAST(b AS INT) AS band,
             CASE b {" ".join(f"WHEN {b} THEN {_band_cols(b * BAND_SIZE)[1]}" for b in range(N_BANDS))} END AS band_hash
      FROM wide CROSS JOIN range({N_BANDS}) r(b)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
    doc="MinHash-LSH banding: band hash = md5 of the band's minhashes, "
    "computed MAP-SIDE from the wide signature; docs sharing any "
    "(band, band_hash) bucket become candidate pairs, generated "
    "map-side from grouped buckets — ONE shuffle total over the "
    "signatures (a self-join would scan the corpus twice).",
)
def lsh_candidate_pairs(
    spark: SparkSession, sf_dir: str, max_bucket: int = 100_000
) -> DataFrame:
    bands = _bands_df(spark, sf_dir)
    # ONE shuffle: bucket members per (band, band_hash), ordered pairs
    # generated map-side (a self-join would recompute the signature
    # scan for each side — no exchange reuse across projections);
    # mega-buckets fall back to the skew-safe join path (bucket_pairs).
    # Per-bucket bound: a doc holds ONE band_hash per band, so no
    # (band, band_hash) bucket can exceed the document count — footer
    # stats let bucket_pairs drop the mega routing when that bound is
    # proven under the cap.
    from environmental_stac_generator_spark.tables import table_rows

    return bucket_pairs(
        bands, ["band", "band_hash"], "doc_id", max_bucket,
        bound_rows=table_rows(sf_dir, "documents"),
    )


def bands_of(d: DataFrame) -> DataFrame:
    """(doc_id, band, band_hash) for a (doc_id, text) frame — the
    map-side LSH banding of the zero-shuffle wide signatures."""
    wide = signatures_of(d)
    stack_args = ", ".join(
        f"{b}, {_band_cols(b * BAND_SIZE)[0]}" for b in range(N_BANDS)
    )
    return wide.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, band_hash)")
    ).select("doc_id", F.col("band").cast("int").alias("band"), "band_hash")


def _bands_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bands_of(load(spark, sf_dir, "documents", fan_out=True))


# doc_id boundary between the "historical corpus" and the "new daily
# batch" in the incremental-dedup demonstration.
HIST_SPLIT = 250

_DUCK_BANDS_FULL = f"""
    wide AS (
      SELECT doc_id,
             {", ".join(f"{_duck_min(k)} AS h{k}" for k in range(N_HASHES))}
      FROM hashed
    ),
    bands AS (
      SELECT doc_id, CAST(b AS INT) AS band,
             CASE b {" ".join(f"WHEN {b} THEN {_band_cols(b * BAND_SIZE)[1]}" for b in range(N_BANDS))} END AS band_hash
      FROM wide CROSS JOIN range({N_BANDS}) r(b)
    )"""


@register(
    "incremental_lsh_dedup",
    f"""
    WITH {_DUCK_HASHED},
    {_DUCK_BANDS_FULL},
    cands AS (
      SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS old_doc
      FROM bands n JOIN bands o
        ON n.band = o.band AND n.band_hash = o.band_hash
      WHERE n.doc_id >= {HIST_SPLIT} AND o.doc_id < {HIST_SPLIT}
    )
    SELECT new_doc, CAST(count(*) AS BIGINT) AS n_dup_candidates,
           min(old_doc) AS first_dup
    FROM cands GROUP BY new_doc
    """,
    doc="Incremental cross-batch dedup — the daily-ingest pattern: "
    "the new batch's LSH bands join against the historical corpus's "
    "band table to flag likely duplicates of already-stored "
    "documents. The NEW batch is broadcast (days are small, the "
    "corpus is huge), so the stored signature/band table is NEVER "
    "shuffled — in production it is a bucketed table written once "
    "per ingest (sinks/bucketed.py) and each day's check is one "
    "map-side scan of it.",
)
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _bands_df(spark, sf_dir)
    new_b = bands.filter(F.col("doc_id") >= HIST_SPLIT).select(
        F.col("doc_id").alias("new_doc"), "band", "band_hash"
    )
    old_b = bands.filter(F.col("doc_id") < HIST_SPLIT).select(
        F.col("doc_id").alias("old_doc"), "band", "band_hash"
    )
    cands = (
        old_b.join(F.broadcast(new_b), ["band", "band_hash"])
        .select("new_doc", "old_doc")
        .distinct()
    )
    return cands.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("n_dup_candidates"),
        F.min("old_doc").alias("first_dup"),
    )


@register(
    "ngram_jaccard_vs_probe",
    f"""
    WITH {_DUCK_SHINGLED},
    probe AS (SELECT shingle FROM shingled WHERE doc_id = 0),
    probe_n AS (SELECT count(*) AS n FROM probe),
    doc_n AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    inter AS (
      SELECT s.doc_id, count(*) AS i
      FROM shingled s JOIN probe p ON s.shingle = p.shingle
      WHERE s.doc_id <> 0
      GROUP BY s.doc_id
    )
    SELECT i.doc_id,
           floor((CAST(i.i AS DOUBLE) / (d.n + (SELECT n FROM probe_n) - i.i)) * 10000.0 + 0.5) / 10000.0
             AS jaccard
    FROM inter i JOIN doc_n d ON i.doc_id = d.doc_id
    ORDER BY jaccard DESC, i.doc_id
    LIMIT 20
    """,
    doc="n-gram Jaccard near-dup: 3-gram shingle-set Jaccard of every "
    "doc against probe doc 0, top-20. The shingle equi-join replaces "
    "the O(n²) pairwise scan.",
)
def ngram_jaccard_vs_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from environmental_stac_generator_spark.operators.lineage import (
        persist_tracked,
    )

    # pin the multi-consumed shingle relation: doc_n (unfiltered) and
    # inter (doc_id != 0) push DIFFERENT filters below the distinct
    # aggregate, so no exchange reuse applies and the corpus
    # tokenize+explode+distinct — the dominant cost — would execute
    # twice; tracked-persist (releasable, same pattern as
    # bucket_pairs) runs it once
    sh = persist_tracked(_spark_shingled(spark, sf_dir))
    probe = sh.filter(F.col("doc_id") == 0).select("shingle")
    # the probe size joins in as a broadcast 1-row aggregate (the SQL
    # scalar subquery's plan shape) — no eager .count() job at build
    # time, the whole query stays one lazy plan
    probe_n = probe.agg(F.count(F.lit(1)).alias("pn"))
    doc_n = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.filter(F.col("doc_id") != 0)
        .join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(doc_n, "doc_id")
        .crossJoin(F.broadcast(probe_n))
        .select(
            "doc_id",
            rnd(F.col("i").cast("double") / (F.col("n") + F.col("pn") - F.col("i")), 4).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "doc_id")
        .limit(20)
    )


@register(
    "simhash",
    """
    WITH tokens AS (
      SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
      FROM documents
    ),
    bits AS (
      SELECT doc_id,
    """
    + ",\n".join(
        f"        CASE WHEN sum(CASE WHEN substr(h, {b + 1}, 1) IN "
        "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0 "
        f"THEN '1' ELSE '0' END AS b{b:02d}"
        for b in range(16)
    )
    + """
      FROM tokens GROUP BY doc_id
    )
    SELECT doc_id, """
    + " || ".join(f"b{b:02d}" for b in range(16))
    + """ AS simhash
    FROM bits
    """,
    doc="SimHash: 16-bit signature — per bit, sign of the sum of ±1 "
    "votes from each token's md5 bit. Near-dups differ in few bits "
    "(compare via hamming distance on the bitstring).",
)
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Map-side only: hash each token once (one transform), then ONE
    # aggregate pass carries a 16-wide vote counter (zip_with into the
    # accumulator array) — no explode, no shuffle, and the token list
    # is scanned once, not once per bit.
    d = load(spark, sf_dir, "documents", fan_out=True)
    hashed = d.select(
        "doc_id",
        F.transform(
            F.split("text", " "), lambda t: F.md5(t.cast("binary"))
        ).alias("hs"),
    )
    hexset = "('8','9','a','b','c','d','e','f')"
    votes = F.expr(
        "aggregate(hs, array_repeat(0, 16), (acc, h) -> "
        "zip_with(acc, transform(sequence(1, 16), i -> "
        f"CASE WHEN substr(h, i, 1) IN {hexset} THEN 1 ELSE -1 END), "
        "(a, v) -> a + v))"
    )
    return hashed.withColumn("votes", votes).select(
        "doc_id",
        F.expr(
            "concat_ws('', transform(votes, v -> "
            "CASE WHEN v >= 0 THEN '1' ELSE '0' END))"
        ).alias("simhash"),
    )


def _duck_bands_cte() -> str:
    """Shared CTE chain producing the bands table (doc_id, band,
    band_hash) — mirrors _signature_wide + map-side banding."""
    wide_cols = ", ".join(f"{_duck_min(k)} AS h{k}" for k in range(N_HASHES))
    band_case = " ".join(
        f"WHEN {b} THEN {_band_cols(b * BAND_SIZE)[1]}" for b in range(N_BANDS)
    )
    return f"""{_DUCK_HASHED},
    wide AS (SELECT doc_id, {wide_cols} FROM hashed),
    bands AS (
      SELECT doc_id, CAST(b AS INT) AS band,
             CASE b {band_case} END AS band_hash
      FROM wide CROSS JOIN range({N_BANDS}) r(b)
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )"""


def _cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage between fixpoint rounds (VERDICT r1 'what's
    wrong' 4); reliable-vs-local storage decision lives in
    :mod:`operators.lineage`. ``eager=False`` when the caller's very
    next step is an action (the convergence aggregate): that action
    materializes the checkpoint, so each fixpoint round costs one job
    instead of two."""
    from environmental_stac_generator_spark.operators.lineage import cut_lineage

    return cut_lineage(df, eager=eager)


@register(
    "duplicate_clusters",
    f"""
    WITH RECURSIVE {_duck_bands_cte()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM reach GROUP BY node
    ORDER BY doc_id
    """,
    doc="Duplicate clustering: connected components over the LSH "
    "candidate-pair graph via iterative min-label propagation "
    "(Pregel-lite: each round joins labels across edges and keeps the "
    "min; converges in O(graph diameter) rounds — near-dup graphs are "
    "shallow). The survivor set is min(doc_id) per cluster. Oracle: "
    "recursive-CTE reachability in DuckDB.",
)
def duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return components_of(lsh_candidate_pairs(spark, sf_dir)).orderBy("doc_id")


def components_of(pairs: DataFrame, algorithm: str = "label") -> DataFrame:
    """(doc_id, cluster_id) connected components of a (doc_a, doc_b)
    pair relation; ``cluster_id`` is the component's min doc_id.

    ``algorithm="label"`` (default): min-label propagation to
    fixpoint — O(diameter) rounds. Near-dup graphs are shallow
    (diameter 2-4), so this is the fewest-jobs plan for the dedup
    pipelines that feed it.

    ``algorithm="star"``: alternating large-star/small-star
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — O(log²) rounds, the scale path for
    chain-shaped or high-diameter graphs where label propagation
    degrades to one round per hop. Both produce identical labels
    (property-tested, including on a chain fixture where star takes
    measurably fewer rounds).

    The label path additionally short-circuits provably small pair
    relations (≤ :data:`DRIVER_CC_PAIRS` rows after materialization)
    to an exact driver-side union-find — identical labels,
    property-tested, zero fixpoint rounds."""
    df, _ = (
        _components_star(pairs)
        if algorithm == "star"
        else _components_label(pairs)
    )
    return df


# Pair relations at or under this row count take the driver-side
# union-find path: two longs per pair (~1.6 MB at the cap) collect in
# one read of the already-materialized checkpoint, and the whole
# fixpoint — which the distributed path spreads over O(diameter)
# driver-coordinated rounds of scheduling-bound micro-jobs — runs in
# microseconds. The same stats-gated CBO pattern as the prefix sum's
# SMALL_INPUT_ROWS; past the cap the distributed rounds are the only
# plan that scales.
DRIVER_CC_PAIRS = 100_000


def _normalize_null_pairs(pairs: DataFrame) -> DataFrame:
    """Half-null pairs become self-pairs of the non-null id, so a
    document that appeared in the pair relation keeps its singleton
    label; all-null pairs drop. Without this, null ids make the
    component paths diverge: the driver union-find TypeErrors sorting
    None against ids, while the distributed joins emit a spurious
    null node AND would lose the non-null partner's label if nulls
    were simply filtered. Self-pairs are already handled by every
    path (driver: node added; label: self-edge; star: self-loops
    dropped but the node survives via the distinct node set)."""
    return pairs.select(
        F.coalesce("doc_a", "doc_b").alias("doc_a"),
        F.coalesce("doc_b", "doc_a").alias("doc_b"),
    ).filter(F.col("doc_a").isNotNull())


def _components_driver(pairs: DataFrame) -> DataFrame:
    """Exact min-label components via driver union-find over a
    SMALL, already-materialized pair relation. Union-by-min + path
    compression keeps every root the component minimum, so labels are
    identical to the distributed fixpoint by construction
    (property-tested equal)."""
    rows = pairs.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for r in rows:
        a, b = r["doc_a"], r["doc_b"]
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # min stays root → root == component min
    id_type = pairs.schema["doc_a"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("doc_id", id_type), StructField("cluster_id", id_type)]
    )
    data = [(x, find(x)) for x in sorted(nodes)]
    spark = pairs.sparkSession
    # bounded slice count: the default parallelize spreads a
    # <=DRIVER_CC_PAIRS-row result over defaultParallelism slices, so
    # every downstream job (the orderBy's range sample, the sort, the
    # sink) schedules a full task wave for a few thousand rows; ~64k
    # rows per slice keeps task count proportional to the data (r16)
    slices = max(1, min(spark.sparkContext.defaultParallelism,
                        len(data) // 65_536 + 1))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, slices), schema
    )


def _components_label(
    pairs: DataFrame, driver_max_pairs: int = DRIVER_CC_PAIRS
) -> tuple[DataFrame, int]:
    """Min-label propagation; returns (labels, rounds). cut_lineage
    keeps each round's plan constant-size (reliable checkpoint when a
    dir is configured). Convergence check: labels only ever decrease,
    so the label sum strictly decreases until the fixpoint — one
    cheap aggregate per round instead of a join + count. Pair
    relations proven small by the materialization count take
    :func:`_components_driver` instead (rounds = 0)."""
    # materialize the PAIR relation, not the union: both union
    # branches scan `pairs`, so cutting after the union executes the
    # upstream pair pipeline (LSH bands / cosine buckets) twice —
    # storing the pairs first runs it once and the symmetric closure
    # is a projection over stored partitions, cheap to re-read each
    # round without a second materialization job. Lazy: the count
    # below (the small-path gate) is the materializing action.
    pairs = _cut_lineage(_normalize_null_pairs(pairs), eager=False)
    from environmental_stac_generator_spark.tables import provably_small

    if provably_small(pairs.count(), driver_max_pairs):
        return _components_driver(pairs), 0
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )

    def _label_fp(lb: DataFrame):
        # overflow-proof convergence fingerprint: bit_xor over the
        # (node, label) hashes plus the count — order-free, exact at
        # any row count and id magnitude. A raw F.sum("label") would
        # exceed int64 for large ids x large corpora: ANSI aborts the
        # fixpoint mid-flight, non-ANSI wraps and could (in principle)
        # alias two different label states. Labels only ever decrease,
        # so fixpoint <=> no change <=> equal fingerprints.
        return tuple(
            lb.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("node", "label"))
            ).first()
        )

    prev_fp = _label_fp(labels)
    rounds = 0
    while True:
        labels = _cut_lineage(
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label")),
            eager=False,  # the convergence aggregate materializes it
        )
        rounds += 1
        cur_fp = _label_fp(labels)
        if cur_fp == prev_fp:
            break
        prev_fp = cur_fp
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ), rounds


def _components_star(pairs: DataFrame) -> tuple[DataFrame, int]:
    """Large-star/small-star alternation; returns (labels, rounds).

    Each round: large-star hangs every node's larger neighbors off
    the neighborhood minimum, small-star re-hangs the smaller ones —
    components contract toward their minimum at a doubling rate, so
    a diameter-D chain resolves in O(log D) alternations instead of
    D label hops. Edges stay (larger, smaller)-oriented and distinct;
    each round shuffles the edge relation twice and runs one
    constant-size checksum aggregate for the fixpoint test."""
    # store the pair relation once: bidir scans it twice and feeds
    # two separately-materialized frames (nodes, edges) — without the
    # cut the upstream pair pipeline would execute four times.
    pairs = _cut_lineage(_normalize_null_pairs(pairs))
    bidir = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    nodes = _cut_lineage(
        bidir.select(F.col("u").alias("node")).distinct()
    )  # keeps self-paired/isolated nodes in the output
    # oriented (big, small) edge set, self-loops dropped
    edges = _cut_lineage(
        bidir.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    def _checksum(e: DataFrame) -> tuple:
        # order-free fingerprint of the DISTINCT edge set: count +
        # bit_xor of per-edge hashes. bit_xor cannot overflow at any
        # row count or id magnitude — the previous raw id sums would
        # exceed int64 at large-id x large-edge scale (ANSI aborts the
        # fixpoint, non-ANSI wraps and weakens the equality test); xor
        # is safe here because the edge relation is kept distinct.
        return tuple(
            e.agg(
                F.count(F.lit(1)),
                F.bit_xor(F.xxhash64("u", "v")),
            ).first()
        )

    rounds = 0
    prev = _checksum(edges)
    while True:
        # large-star: group both orientations by u; every neighbor
        # v > u re-attaches to m = min(N(u) ∪ {u})
        both = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = both.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            both.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("mn"), F.col("u")).alias("v"),
            )
            .distinct()
        )
        # small-star: edges are (big, small); every smaller neighbor
        # (and u itself) re-attaches to the neighborhood minimum
        smin = large.groupBy("u").agg(F.min("v").alias("mn"))
        small = _cut_lineage(
            large.join(smin, "u")
            .filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .unionByName(smin.select("u", F.col("mn").alias("v")))
            .distinct(),
            eager=False,  # the checksum aggregate materializes it
        )
        rounds += 1
        chk = _checksum(small)
        edges = small
        if chk == prev:
            break
        prev = chk
    # at the fixpoint edges form stars on component minima: every
    # node's label is min(neighbors ∪ self); nodes without surviving
    # edges (self-pairs) label themselves
    both = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    labels = both.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("label")
    )
    return nodes.join(
        labels, nodes.node == labels.u, "left"
    ).select(
        F.col("node").alias("doc_id"),
        F.coalesce("label", "node").alias("cluster_id"),
    ), rounds


@register(
    "lsh_verified_pairs",
    f"""
    WITH {_duck_bands_cte()},
    sets AS (
      SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shingled
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
    inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS i
      FROM pairs p
      JOIN sets a ON a.doc_id = p.doc_a
      JOIN sets b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           floor((CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i)) * 10000.0 + 0.5) / 10000.0
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    doc="Verified near-dup pairs: LSH candidates confirmed by exact "
    "shingle-set Jaccard >= 0.5. The tiny candidate set is broadcast "
    "against the per-doc shingle arrays, and the set algebra "
    "(array_intersect/union) runs map-side — the full-precision "
    "verify step costs O(candidates), never O(n^2).",
)
def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from environmental_stac_generator_spark.tables import table_rows

    return verified_pairs_of(
        load(spark, sf_dir, "documents", fan_out=True),
        bound_rows=table_rows(sf_dir, "documents"),
    ).orderBy(
        "doc_a", "doc_b"
    )


def verified_pairs_of(
    d: DataFrame,
    threshold: float = 0.5,
    max_bucket: int = 100_000,
    bound_rows: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs of a (doc_id, text)
    frame: LSH candidates confirmed by exact shingle-set Jaccard >=
    ``threshold``. The set algebra runs map-side — O(candidates),
    never O(n²). The candidate-pair joins are unhinted: candidates
    are corpus-scale in a duplicate-heavy corpus, so AQE runtime-sizes
    the strategy (broadcast when actually small). ``bound_rows`` — a
    driver-known upper bound on the rows of ``d`` — feeds
    :func:`bucket_pairs`' provably-no-mega gate (a doc holds one
    band_hash per band, so no LSH bucket can exceed the doc count)."""
    sets = (
        d.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .select("doc_id", F.array_distinct(F.expr(_SPARK_SHINGLES)).alias("sh"))
    )
    # fan the BANDS input when the frame is under-split (r17): the
    # minhash band map is the heavy stage of this operator, and a
    # 1-partition staged chain checkpoint single-threads it (measured
    # 1.95 -> 1.21 s on the chain's near-dup stage; fanning the
    # shingle-set sides as well measured SLOWER — their joins are
    # candidate-narrowed). Already-fanned scans pass through the
    # partition-count gate unchanged, as does any corpus-scale frame.
    from environmental_stac_generator_spark.tables import fan_out_frame

    pairs = bucket_pairs(
        bands_of(fan_out_frame(d)), ["band", "band_hash"], "doc_id",
        max_bucket, bound_rows=bound_rows,
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    joined = a.join(pairs, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # explode(array(inter)) is a SINGLE-EVALUATION barrier (r16, see
    # semantic_pairs_of): the intersection size otherwise appears in
    # both the numerator and denominator of the Jaccard, and the
    # pushed-down threshold filter duplicates the whole quotient —
    # the O(|shingles|) array_intersect ran FOUR times per candidate
    # pair. A filter cannot cross a Generate's output attribute, so
    # the set intersection runs exactly once; the remaining quotient
    # arithmetic over the attribute is scalar-cheap. Values and the
    # surviving pair set are bit-identical.
    sized = joined.select(
        "doc_a",
        "doc_b",
        F.size("sh_a").alias("_na"),
        F.size("sh_b").alias("_nb"),
        F.explode(F.array(inter)).alias("_i"),
    )
    jac = F.col("_i").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_i")
    )
    return sized.filter(jac >= threshold).select(
        "doc_a", "doc_b", rnd(jac, 4).alias("jaccard")
    )
