"""Materialized IVF/IVFPQ index — the 100 TB scan-pruning layer.

VERDICT r8 #1: every on-the-fly IVF/IVFPQ probe recomputes the coarse
cell assignment over the FULL corpus at query time, so the "~1/K scan"
claim in the probe docstrings never materialized as I/O — cell was a
computed column, not a partition column. This module closes that gap
with the FAISS inverted-list layout (Jégou et al. 2011) re-expressed
as a hive-partitioned parquet table:

- :func:`build_ann_index` pays the full corpus scan ONCE (FAISS
  ``add()`` in spirit): one map pass computes each vector's cell, its
  norm, and its residual PQ codes (vs its OWN cell centroid — the
  IndexIVFPQ residual convention), then writes
  ``(vec_id, norm, embedding, codes)`` with ``partitionBy("cell")``.
- probe entries read the INDEX table; the cell filter lands in the
  scan's ``PartitionFilters``, so a probe LISTS AND READS only its
  nprobe cell directories (~nprobe/K of the corpus files — asserted
  on ``inputFiles()`` in tests/test_ann_index.py, not claimed in
  prose).
- the ADC probe selects only ``(vec_id, codes)``: column pruning
  keeps the float embeddings unread — the scan's ``ReadSchema`` is
  codes-only, which is the "ranking reads 8-byte codes, never
  floats" property as a plan fact.

Correctness: both probes are registered with the SAME DuckDB oracle
as their on-the-fly twins (``ivf_ann_probe`` / ``ivfpq_residual_probe``
— parity by construction: the build runs the identical assignment /
residual / code kernels, and parquet round-trips doubles exactly).

Reference: none (north-star §2.11 extension; the reference engine has
no ANN surface at all).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from environmental_stac_generator_spark.functions.rounding import rnd
from environmental_stac_generator_spark.queries import similarity as S
from environmental_stac_generator_spark.registry import REGISTRY, register
from environmental_stac_generator_spark.tables import load

# One index per (corpus path, corpus mtime/size fingerprint) per
# process: the driver/bench/test loops call the registered probes
# repeatedly, and the build is the expensive full-scan half they
# should NOT re-pay. A changed corpus (tests synthesize fresh dirs;
# make_testdata rewrites in place) changes the fingerprint and
# triggers a rebuild instead of serving stale cells.
_INDEX_CACHE: dict[tuple[str, tuple], str] = {}
_SCRATCH: list[str] = []


@atexit.register
def _sweep() -> None:
    for d in _SCRATCH:
        shutil.rmtree(d, ignore_errors=True)


def _fingerprint(sf_dir: str) -> tuple:
    p = Path(sf_dir) / "embeddings.parquet"
    if p.is_dir():
        stats = sorted(
            (f.name, f.stat().st_mtime_ns, f.stat().st_size)
            for f in p.iterdir()
        )
        return tuple(stats)
    st = os.stat(p)
    return (st.st_mtime_ns, st.st_size)


def _residual_codebook(cents, cb_rows) -> list[list[float]]:
    """Shared residual codebook — each sample row coded against its
    OWN cell's centroid, the exact driver arithmetic of
    ``ivfpq_residual_probe`` (similarity.py)."""
    cent_by_id = {int(r.vec_id): [float(v) for v in r.embedding] for r in cents}
    return [
        [
            float(x) - y
            for x, y in zip(
                r.embedding, cent_by_id[S._ivf_cell_py(r.embedding, cents)]
            )
        ]
        for r in cb_rows
    ]


def build_ann_index(spark: SparkSession, sf_dir: str, out_dir: str) -> dict | None:
    """ONE full-corpus map pass -> the inverted-file table.

    Per row: coarse cell (argmax cosine over the N_CENTROIDS
    bootstrap centroids — `_ivf_cells_of`, the bit-exact kernel the
    on-the-fly probes use), the hoisted norm, and PQ_M residual codes
    (vs the row's own cell centroid, shared fixed-sample residual
    codebook). `repartition("cell")` routes each cell to one writer
    task so the layout lands as ~one file per cell directory instead
    of tasks x cells small files; `maxRecordsPerFile` re-splits
    genuinely large cells at scale.

    Returns {"cells": n, "codes": bool} or None on a corpus with no
    centroid rows (nothing to index)."""
    e = load(spark, sf_dir, "embeddings")
    cents = sorted(
        e.filter(F.col("vec_id") < S.N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cents:
        return None
    cb_rows = sorted(
        e.filter(
            (F.col("vec_id") >= S.N_CENTROIDS)
            & (F.col("vec_id") < S.N_CENTROIDS + S.PQ_K)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    cells = S._ivf_cells_of(e, cents)  # vec_id, embedding, _norm, cell
    if cb_rows:
        cbres = _residual_codebook(cents, cb_rows)
        dsub = S._pq_dsub(len(cbres[0]))
        cent_by_id = {
            int(r.vec_id): [float(v) for v in r.embedding] for r in cents
        }
        cmap = ", ".join(
            f"{cid}L, {S._vec_sql(vec)}" for cid, vec in cent_by_id.items()
        )
        # residual vs the row's OWN centroid: one literal cell->centroid
        # map lookup + zip_with, map-side
        res = cells.withColumn(
            "_res",
            F.expr(
                f"zip_with(embedding, element_at(map({cmap}), cell), "
                "(x, y) -> cast(x as double) - y)"
            ),
        )
        coded = S._pq_with_subvectors(res, dsub, col="_res").withColumn(
            "codes",
            F.array(
                *[
                    F.expr(S._pq_code_sql(m, dsub, cbres)).cast("int")
                    for m in range(S.PQ_M)
                ]
            ),
        )
    else:
        # corpus too small for the offset codebook sample: index is
        # still probe-able exactly; the ADC probe degrades to empty
        coded = cells.withColumn("codes", F.lit(None).cast("array<int>"))
    (
        coded.select(
            "vec_id", F.col("_norm").alias("norm"), "embedding", "codes", "cell"
        )
        .repartition("cell")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy("cell")
        .parquet(out_dir)
    )
    return {"cells": len(cents), "codes": bool(cb_rows)}


def index_dir_for(spark: SparkSession, sf_dir: str) -> str | None:
    """The materialized index for ``sf_dir`` — built on first use,
    cached per corpus fingerprint for the life of the process."""
    key = (str(Path(sf_dir).resolve()), _fingerprint(sf_dir))
    hit = _INDEX_CACHE.get(key)
    if hit is not None:
        return hit or None
    out = tempfile.mkdtemp(prefix="envstac_annidx_")
    _SCRATCH.append(out)
    idx = str(Path(out) / "index")
    meta = build_ann_index(spark, sf_dir, idx)
    # cache the no-centroids outcome too ("" sentinel) — rebuilding an
    # unbuildable index on every probe would re-scan for nothing
    _INDEX_CACHE[key] = idx if meta is not None else ""
    return idx if meta is not None else None


def _read_index(spark: SparkSession, idx_dir: str) -> DataFrame:
    return spark.read.parquet(idx_dir)


def index_probe_exact(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """Exact cosine ranking over the probe's ``nprobe`` nearest cells,
    read from the MATERIALIZED index: the ``cell isin(...)`` filter is
    on the partition column, so only those directories are listed and
    scanned (IVF-Flat semantics: the inverted lists store the float
    vectors for exact in-cell ranking; the stored norm skips the
    norm recompute the on-the-fly path pays)."""
    e = load(spark, sf_dir, "embeddings")
    empty = spark.createDataFrame([], "vec_id bigint, cosine double")
    idx_dir = index_dir_for(spark, sf_dir)
    if idx_dir is None:
        return empty
    cents = sorted(
        e.filter(F.col("vec_id") < S.N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    probe = S._ivf_probe_cell(cents)
    if probe is None:
        return empty
    probe_vec, p_norm, _cell = probe
    top_cells = S._ivf_top_cells_py(probe_vec, cents, nprobe)
    cos = F.expr(S._dot_sql("embedding", S._vec_sql(probe_vec))) / (
        F.col("norm") * F.lit(p_norm)
    )
    out = (
        _read_index(spark, idx_dir)
        .filter(F.col("cell").isin(top_cells) & (F.col("vec_id") != 0))
        .select("vec_id", rnd(cos, 5).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
    )
    # single-cell: the full ranked cell (the ivf_ann_probe contract);
    # multi-cell: top-10 of the union (the ivf_ann_nprobe contract)
    return out if nprobe == 1 else out.limit(10)


def index_probe_adc(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """Residual-ADC ranking over STORED codes: per probed cell, a
    driver-computed distance table (the probe's residual differs per
    cell) indexed by the row's stored codes — PQ_M array lookups +
    adds per row. The scan projects only (vec_id, codes): the float
    embeddings are never read (codes-only ReadSchema), and the cell
    filter prunes to the probed partitions."""
    e = load(spark, sf_dir, "embeddings")
    empty = spark.createDataFrame([], "vec_id bigint, adc double")
    idx_dir = index_dir_for(spark, sf_dir)
    if idx_dir is None:
        return empty
    cents = sorted(
        e.filter(F.col("vec_id") < S.N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    probe = S._ivf_probe_cell(cents)
    if probe is None:
        return empty
    cb_rows = sorted(
        e.filter(
            (F.col("vec_id") >= S.N_CENTROIDS)
            & (F.col("vec_id") < S.N_CENTROIDS + S.PQ_K)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not cb_rows:
        return empty
    probe_vec, _p_norm, _cell = probe
    cbres = _residual_codebook(cents, cb_rows)
    S._assert_driver_dim(cbres)
    dsub = S._pq_dsub(len(cbres[0]))
    cent_by_id = {int(r.vec_id): [float(v) for v in r.embedding] for r in cents}
    top_cells = S._ivf_top_cells_py(probe_vec, cents, nprobe)

    def _sq(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            t = x - y
            acc += t * t
        return acc

    # per-cell ADC tables over the probe's per-cell residual — PQ_M x
    # PQ_K doubles per probed cell, driver-computed (same sequential
    # IEEE arithmetic as the oracle's presid/t CTEs)
    tables = {}
    for cell in top_cells:
        pres = [float(x) - y for x, y in zip(probe_vec, cent_by_id[cell])]
        tables[cell] = [
            [
                _sq(pres[m * dsub:(m + 1) * dsub], c[m * dsub:(m + 1) * dsub])
                for c in cbres
            ]
            for m in range(S.PQ_M)
        ]
    if nprobe == 1:
        cell = top_cells[0]
        adc = " + ".join(
            f"element_at({S._vec_sql(tables[cell][m])}, "
            f"element_at(codes, {m + 1}) + 1)"
            for m in range(S.PQ_M)
        )
    else:
        adc = " + ".join(
            "element_at(element_at(map("
            + ", ".join(
                f"{cid}L, {S._vec_sql(tables[cid][m])}" for cid in top_cells
            )
            + f"), cast(cell as bigint)), element_at(codes, {m + 1}) + 1)"
            for m in range(S.PQ_M)
        )
    return (
        _read_index(spark, idx_dir)
        .filter(F.col("cell").isin(top_cells) & (F.col("vec_id") != 0))
        .select("vec_id", "codes", "cell")
        .select("vec_id", rnd(F.expr(adc), 5).alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(10)
    )


def executed_scan_metrics(df: DataFrame) -> list[dict]:
    """Execute ``df`` and return per-FileSourceScan facts from the
    EXECUTED plan: files/partitions actually read plus the scan line
    (PartitionFilters / ReadSchema included) — the pruning claims as
    runtime evidence, not docstrings. AQE stages are traversed into
    their final plans; the scan line is rendered untruncated."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        out: list[dict] = []

        def walk(node) -> None:
            cname = node.getClass().getSimpleName()
            if cname == "AdaptiveSparkPlanExec":
                walk(node.executedPlan())
            if cname.endswith("QueryStageExec"):
                walk(node.plan())
            if "FileSourceScan" in cname:
                m = node.metrics()
                rec = {
                    "num_files": int(m.apply("numFiles").value()),
                    "scan": node.toString().splitlines()[0],
                }
                if m.contains("numPartitions"):
                    rec["num_partitions"] = int(
                        m.apply("numPartitions").value()
                    )
                out.append(rec)
            it = node.children().iterator()
            while it.hasNext():
                walk(it.next())

        walk(plan)
        return out
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)


# Registered with the on-the-fly twins' EXACT oracle SQL: the index
# stores what those kernels compute, so the materialized probe must
# hash-match the same DuckDB derivation — any build/probe divergence
# (stale cells, wrong residual convention, float drift through
# parquet) flips the driver's hash.

@register(
    "ivf_index_probe",
    REGISTRY["ivf_ann_probe"].sql,
    doc="IVF probe against the MATERIALIZED partitionBy(cell) index "
    "(VERDICT r8 #1): identical ranking contract to ivf_ann_probe, "
    "but the corpus scan is replaced by a partition-pruned read of "
    "ONE cell directory (~1/K of the index files; PartitionFilters, "
    "asserted on inputFiles() in tests). Build pays the full scan "
    "once; probes after it never touch the other cells' files.",
)
def ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_probe_exact(spark, sf_dir, nprobe=1)


@register(
    "ivfpq_index_probe",
    REGISTRY["ivfpq_residual_probe"].sql,
    doc="Residual-ADC probe against the materialized index: reads "
    "ONLY (vec_id, codes) from the probe's cell partition — "
    "codes-only ReadSchema (the floats are never read at query time) "
    "+ partition pruning, the full FAISS IndexIVFPQ I/O story. Same "
    "oracle as ivfpq_residual_probe: stored codes are the identical "
    "residual-code kernel, persisted.",
)
def ivfpq_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return index_probe_adc(spark, sf_dir, nprobe=1)
