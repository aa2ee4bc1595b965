"""CLI twin of the reference's ``envstacgen`` entry points
(ref ``cli.py:13-52`` preprocess, ``cli.py:55-66`` ingest).

stdlib argparse over the :class:`EnvStacEngine` facade:

- ``envstacgen-spark preprocess <forecast_frequency> <input>...``
  scans NetCDF landing files, encodes COGs / sliced NetCDFs /
  thumbnails, and writes the static STAC JSON catalog
  (ref ``preprocess.py`` via ``STACGenerator.process``).
- ``envstacgen-spark ingest <catalog_dir>`` loads the JSON catalog
  back and upserts collections-then-items into a pgSTAC-style
  database (ref ``ingest.py`` via ``ingest_stac_catalog``);
  ``--dry-run`` plans the anti-joins and prints row counts without a
  database (useful in CI and for sizing).

Run as ``python -m environmental_stac_generator_spark.cli ...``.
"""

from __future__ import annotations

import argparse
import json
import sys

import pyspark.sql.functions as F


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="envstacgen-spark",
        description="PySpark environmental-forecast STAC pipeline",
    )
    p.add_argument("--master", default="local[*]", help="Spark master URL")
    sub = p.add_subparsers(dest="command", required=True)

    pre = sub.add_parser(
        "preprocess", help="Generate COGs and static JSON STAC catalog."
    )
    pre.add_argument(
        "forecast_frequency", help="The forecast frequency (e.g., 6hours, 1days)"
    )
    pre.add_argument("input", nargs="+", help="Input file, directory or wildcard")
    pre.add_argument("-n", "--name", default="default", help="Collection name")
    pre.add_argument(
        "-o", "--overwrite", action="store_true", help="Overwrite existing COGs"
    )
    pre.add_argument(
        "-s",
        "--stac-only",
        action="store_true",
        help="Output only the STAC files, not COGs/thumbnails",
    )
    pre.add_argument("--output-dir", default="data", help="Output directory")
    pre.add_argument(
        "--file-server-url", default=None, help="Base URL for ./-relative hrefs"
    )
    pre.add_argument(
        "--fake-decoder",
        action="store_true",
        help="Use the deterministic stand-in NetCDF decoder (for "
        "environments without xarray/h5netcdf)",
    )

    ing = sub.add_parser(
        "ingest", help="Ingest generated JSON STAC catalog into pgSTAC database."
    )
    ing.add_argument("catalog", help="Path to the STAC catalog directory")
    ing.add_argument(
        "-o",
        "--overwrite",
        action="store_true",
        help="Overwrite any matching collections/items",
    )
    ing.add_argument("--jdbc-url", default=None, help="JDBC URL of the pgSTAC DB")
    ing.add_argument("--dsn", default=None, help="psycopg DSN for upserts")
    ing.add_argument(
        "--dry-run",
        action="store_true",
        help="Plan the ingest and print counts without touching a database",
    )

    cur = sub.add_parser(
        "curate",
        help="Run the training-corpus curation chain (dedup -> "
        "decontaminate -> quality -> mix -> budget -> pack) over a "
        "documents parquet table.",
    )
    cur.add_argument("documents", help="Parquet path with (doc_id, text, source)")
    cur.add_argument(
        "--probes", default=None, help="Parquet path of eval docs to decontaminate against"
    )
    cur.add_argument("--output", default=None, help="Write selected docs here (parquet)")
    cur.add_argument("--jaccard", type=float, default=0.5, help="Near-dup threshold (negative disables)")
    cur.add_argument(
        "--dedup-keep",
        choices=["first", "best_quality"],
        default="first",
        help="Near-dup survivor policy: lowest doc_id or highest quality",
    )
    cur.add_argument("--quality-min", type=float, default=None, help="Minimum quality score")
    cur.add_argument(
        "--perplexity-max",
        type=float,
        default=None,
        help="CCNet-style fluency cut: max mean bigram NLL "
        "(nats/bigram) under the corpus's hashed bigram LM",
    )
    cur.add_argument("--token-budget", type=int, default=None, help="Global token budget")
    cur.add_argument(
        "--importance-target",
        default=None,
        help="DSIR data selection: keep only documents whose hashed-"
        "unigram importance log-weight vs this target source domain "
        "is positive",
    )
    cur.add_argument("--seq-len", type=int, default=2048, help="Packed sequence length")
    cur.add_argument(
        "--embeddings",
        default=None,
        help="Parquet path with (doc_id|vec_id, embedding) enabling semantic dedup",
    )
    cur.add_argument(
        "--semantic-cosine",
        type=float,
        default=None,
        help="SemDeDup cosine threshold (requires --embeddings)",
    )
    cur.add_argument(
        "--redact-pii",
        action="store_true",
        help="Redact PII shapes and sensitive terms before selection",
    )
    cur.add_argument(
        "--shards",
        type=int,
        default=None,
        help="Also export the selected docs as this many deterministic "
        "globally-shuffled shard directories under <output>_shards",
    )
    cur.add_argument(
        "--shard-seed", type=int, default=0, help="Shard shuffle seed"
    )

    val = sub.add_parser(
        "validate",
        help="Run declarative single-pass quality checks over a "
        "parquet table and report per-rule pass/fail.",
    )
    val.add_argument("table", help="Parquet path to validate")
    val.add_argument(
        "--rules",
        required=True,
        help="JSON rules file: a list of {kind, column, lo, hi, "
        "allowed, pattern, min_rows, tolerance} objects (kinds: "
        "not_null unique in_range in_set matches row_count_min)",
    )
    val.add_argument(
        "--exact-unique",
        action="store_true",
        help="Exact distinct counts for unique rules (default HLL)",
    )
    return p


def _preprocess(spark, args) -> dict:
    from environmental_stac_generator_spark.engine import EnvStacEngine
    from environmental_stac_generator_spark.sources import netcdf

    engine = EnvStacEngine(
        spark,
        catalog_name=args.name,
        output_dir=args.output_dir,
        file_server_url=args.file_server_url,
        decoder=netcdf.fake_decoder() if args.fake_decoder else None,
    )
    summary: dict = {"command": "preprocess", "collection": args.name}
    for path in args.input:
        results = engine.process(
            path,
            forecast_frequency=args.forecast_frequency,
            stac_only=args.stac_only,
            overwrite=args.overwrite,
        )
        engine.save_catalog(results)
        summary.setdefault("inputs", []).append(
            {
                "input": path,
                "items": results["items"].count(),
                "collections": results["collections"].count(),
                "cogs": (
                    results["cog_results"].count() if "cog_results" in results else 0
                ),
            }
        )
        # catalog saved + counts read: free the per-input caches
        engine.release()
    return summary


def _ingest(spark, args) -> dict:
    from environmental_stac_generator_spark.sinks import stac_json
    from environmental_stac_generator_spark.sinks.jdbc_upsert import ingest_catalog

    # fail fast on half-configured connections, BEFORE any Spark work:
    # the two live branches need DIFFERENT settings (overwrite upserts
    # exclusively through the DB-API dsn, append anti-joins + writes
    # exclusively through the JDBC url). Conflating "no database
    # configured" with one of the two previously made `--overwrite
    # --dsn ...` silently dry-run (writing nothing, exit 0) and
    # `--overwrite --jdbc-url ...` die in psycopg.connect('') on
    # executors.
    have_db = args.dsn if args.overwrite else args.jdbc_url
    if not args.dry_run and not have_db and (args.dsn or args.jdbc_url):
        raise SystemExit(
            "ingest --overwrite writes through --dsn; the append path "
            "writes through --jdbc-url — the one this invocation needs "
            "is missing"
        )

    tree = stac_json.load_catalog_tree(spark, args.catalog)
    collections = tree.filter(F.col("type") == "Collection").select(
        "id", F.to_json(F.struct("*")).alias("json")
    )
    items = tree.filter(F.col("type") == "Feature").select(
        "id", "collection", F.to_json(F.struct("*")).alias("json")
    )
    if args.dry_run or not have_db:
        # plan only: the counts the ingest would write (overwrite mode
        # replaces everything; append mode would anti-join against the
        # DB key scans, which need a live database)
        return {
            "command": "ingest",
            "dry_run": True,
            "collections": collections.count(),
            "items": items.count(),
        }
    counts = ingest_catalog(
        spark,
        collections,
        items,
        jdbc_url=args.jdbc_url or "",
        dsn=args.dsn or "",
        overwrite=args.overwrite,
    )
    return {"command": "ingest", "dry_run": False, **counts}


def _curate(spark, args) -> dict:
    from environmental_stac_generator_spark.plans.curation_pipeline import (
        CurationConfig,
        curate,
    )

    docs = spark.read.parquet(args.documents).select("doc_id", "text", "source")
    probes = (
        spark.read.parquet(args.probes).select("doc_id", "text")
        if args.probes
        else None
    )
    cfg = CurationConfig(
        near_dup_jaccard=None if args.jaccard < 0 else args.jaccard,
        dedup_keep=args.dedup_keep,
        semantic_cosine=args.semantic_cosine,
        redact_pii=args.redact_pii,
        quality_min=args.quality_min,
        perplexity_max=args.perplexity_max,
        importance_target=args.importance_target,
        token_budget=args.token_budget,
        seq_len=args.seq_len,
    )
    embeddings = None
    if args.embeddings:
        emb = spark.read.parquet(args.embeddings)
        id_col = "doc_id" if "doc_id" in emb.columns else "vec_id"
        embeddings = emb.select(F.col(id_col).alias("doc_id"), "embedding")
    res = curate(docs, probes=probes, config=cfg, embeddings=embeddings)
    if args.output:
        res.selected.write.mode("overwrite").parquet(args.output)
        if args.shards:
            from environmental_stac_generator_spark.sinks.shards import (
                write_training_shards,
            )

            write_training_shards(
                res.selected,
                f"{args.output}_shards",
                key="doc_id",
                n_shards=args.shards,
                seed=args.shard_seed,
            )
    return {"command": "curate", "stats": res.stats}


def _validate(spark, args) -> dict:
    from environmental_stac_generator_spark.operators import validate as V

    with open(args.rules) as fh:
        raw = json.load(fh)
    rules = []
    for r in raw:
        kind = r["kind"]
        tol = float(r.get("tolerance", 0.0))
        if kind == "not_null":
            rules.append(V.not_null(r["column"], tol))
        elif kind == "unique":
            rules.append(V.unique(r["column"], tol))
        elif kind == "in_range":
            rules.append(V.in_range(r["column"], r["lo"], r["hi"], tol))
        elif kind == "in_set":
            rules.append(V.in_set(r["column"], r["allowed"], tol))
        elif kind == "matches":
            rules.append(V.matches(r["column"], r["pattern"], tol))
        elif kind == "row_count_min":
            rules.append(V.row_count_min(int(r["min_rows"])))
        else:
            raise SystemExit(f"unknown rule kind: {kind}")
    report = V.validate(
        spark.read.parquet(args.table), rules, exact_unique=args.exact_unique
    ).collect()
    return {
        "command": "validate",
        "ok": all(r["ok"] for r in report),
        "rules": [
            {
                "rule": r["rule"],
                "column": r["column"],
                "metric": r["metric"],
                "threshold": r["threshold"],
                "ok": r["ok"],
            }
            for r in report
        ],
    }


def main(argv: list[str] | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "shards", None) and not args.output:
        # --shards is a write mode of --output; silently running the
        # whole chain and producing neither would look like success
        parser.error("--shards requires --output")
    from pyspark.sql import SparkSession

    from environmental_stac_generator_spark.session import get_spark

    # only stop a session this invocation created — when embedded in a
    # host application (or a test harness) getOrCreate returns the
    # host's session, which is not ours to kill. getActiveSession is
    # THREAD-local while getOrCreate falls back to the process-GLOBAL
    # default session, so a host session created on another thread
    # must also count as "not ours" — otherwise the finally below
    # stops it out from under the host. _instantiatedSession is
    # internal PySpark API; tests/test_cli.py pins its existence so a
    # rename in a future release fails loudly rather than silently
    # flipping ownership.
    owns_session = (
        SparkSession.getActiveSession() is None
        and getattr(SparkSession, "_instantiatedSession", None) is None
    )
    spark = get_spark(app_name=f"envstacgen-{args.command}", master=args.master)
    try:
        if args.command == "preprocess":
            summary = _preprocess(spark, args)
        elif args.command == "curate":
            summary = _curate(spark, args)
        elif args.command == "validate":
            summary = _validate(spark, args)
        else:
            summary = _ingest(spark, args)
    finally:
        if owns_session:
            spark.stop()
    print(json.dumps(summary, sort_keys=True))
    return 0 if summary.get("ok", True) else 1


if __name__ == "__main__":
    sys.exit(main())
