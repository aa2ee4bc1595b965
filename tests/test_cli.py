"""CLI twin of envstacgen preprocess|ingest (ref cli.py:13-66),
driven end-to-end over a fake landing dir — mirrors the reference's
tests/stac/test_generator.py usage."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from tests.conftest import SF_DIR

from environmental_stac_generator_spark.cli import _build_parser, _ingest, _preprocess

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "icenet_demo"
    d.mkdir()
    for i in range(2):
        (d / f"fc{i}.nc").write_bytes(bytes([i]))
    return d


def test_preprocess_then_ingest_in_process(spark, landing, tmp_path):
    out = tmp_path / "out"
    p = _build_parser()
    pre = p.parse_args(
        ["preprocess", "1days", str(landing), "-n", "icenet_demo",
         "--output-dir", str(out), "--fake-decoder", "-o"]
    )
    summary = _preprocess(spark, pre)
    assert summary["inputs"][0]["items"] > 0
    assert summary["inputs"][0]["cogs"] > 0
    catalog_dir = out / "stac" / "icenet_demo"
    assert (catalog_dir / "catalog.json").exists()

    ing = p.parse_args(["ingest", str(catalog_dir), "--dry-run"])
    result = _ingest(spark, ing)
    assert result["dry_run"] is True
    assert result["collections"] >= 1
    assert result["items"] == summary["inputs"][0]["items"]


def test_cli_subprocess_smoke(landing, tmp_path):
    """Real `python -m ...cli` invocations: preprocess then ingest in
    one fresh interpreter (own SparkSession lifecycle)."""
    out = tmp_path / "out"
    script = (
        "import sys\n"
        "from environmental_stac_generator_spark.cli import main\n"
        f"assert main(['--master', 'local[2]', 'preprocess', '1days', {str(landing)!r},"
        f" '-n', 'icenet_demo', '--output-dir', {str(out)!r}, '--fake-decoder']) == 0\n"
        f"assert main(['--master', 'local[2]', 'ingest', {str(out / 'stac' / 'icenet_demo')!r}, '--dry-run']) == 0\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    pre, ing = (json.loads(l) for l in lines)
    assert pre["command"] == "preprocess" and ing["command"] == "ingest"
    assert ing["items"] == pre["inputs"][0]["items"] > 0


def test_cli_curate(tmp_path, capsys):
    """curate subcommand: runs the curation chain over a documents
    parquet and reports per-stage survivor counts."""
    from environmental_stac_generator_spark.cli import main

    out = tmp_path / "curated"
    rc = main(
        [
            "--master", "local[4]",
            "curate", f"{SF_DIR}/documents.parquet",
            "--token-budget", "15000",
            "--quality-min", "0.2",
            "--output", str(out),
        ]
    )
    assert rc == 0
    report = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    s = report["stats"]
    assert s["input"] == 500
    assert 0 < s["budget"] <= s["exact_dedup"] <= s["input"]
    assert s["sequences"] > 0
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    assert n == s["budget"]


def test_cli_curate_shard_export(tmp_path, capsys):
    """--shards N also exports <output>_shards with every selected
    doc exactly once across N shard directories."""
    from environmental_stac_generator_spark.cli import main

    out = tmp_path / "curated"
    rc = main(
        [
            "--master", "local[4]",
            "curate", f"{SF_DIR}/documents.parquet",
            "--jaccard", "-1",
            "--output", str(out),
            "--shards", "4",
        ]
    )
    assert rc == 0
    import duckdb

    con = duckdb.connect()
    sel = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    shard_rows = con.execute(
        "SELECT shard, count(*) AS n, count(DISTINCT doc_id) AS d "
        f"FROM read_parquet('{out}_shards/*/*.parquet', hive_partitioning=1) "
        "GROUP BY shard ORDER BY shard"
    ).fetchall()
    assert [r[0] for r in shard_rows] == [0, 1, 2, 3]
    assert sum(r[1] for r in shard_rows) == sel
    assert all(r[1] == r[2] for r in shard_rows)


def test_cli_validate(tmp_path, capsys):
    """validate subcommand: JSON rules file -> per-rule report; exit
    code 1 when any rule fails."""
    from environmental_stac_generator_spark.cli import main

    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"kind": "not_null", "column": "doc_id"},
        {"kind": "unique", "column": "doc_id"},
        {"kind": "matches", "column": "source", "pattern": "^src\\d+$"},
        {"kind": "row_count_min", "min_rows": 100},
    ]))
    rc = main([
        "--master", "local[4]",
        "validate", f"{SF_DIR}/documents.parquet",
        "--rules", str(rules),
    ])
    assert rc == 0
    report = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert report["ok"] and len(report["rules"]) == 4

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"kind": "row_count_min", "min_rows": 10**9}]))
    rc = main([
        "--master", "local[4]",
        "validate", f"{SF_DIR}/documents.parquet",
        "--rules", str(bad),
    ])
    assert rc == 1


def test_cli_shards_requires_output(tmp_path):
    """--shards with no --output would run the whole chain and write
    neither output nor shards; reject at parse time."""
    import pytest

    from environmental_stac_generator_spark.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["curate", str(tmp_path / "docs.parquet"), "--shards", "4"])
    assert exc.value.code == 2  # argparse parser.error


def test_cli_ingest_overwrite_needs_dsn(spark, landing, tmp_path):
    """ingest --overwrite writes through --dsn only; --jdbc-url alone
    must fail loudly instead of dying in psycopg.connect('') on
    executors — and --dsn without --overwrite must not silently
    dry-run."""
    import pytest

    from environmental_stac_generator_spark.cli import main

    cat = tmp_path / "nocat"
    cat.mkdir()
    (cat / "catalog.json").write_text('{"type": "Catalog", "id": "c", "links": []}')
    with pytest.raises(SystemExit, match="dsn"):
        main(
            ["--master", "local[2]", "ingest", str(cat), "--overwrite",
             "--jdbc-url", "jdbc:sqlite:x"]
        )
    with pytest.raises(SystemExit, match="jdbc-url"):
        main(["--master", "local[2]", "ingest", str(cat), "--dsn", "x.db"])


def test_instantiated_session_attr_still_exists(spark):
    """cli.main's ownership probe reads the private
    ``SparkSession._instantiatedSession`` (the process-GLOBAL default
    that ``getActiveSession`` — thread-local — cannot see). It is
    internal PySpark API: if a future release renames it, the getattr
    fallback would silently report "not ours" ... for sessions the CLI
    DID create, leaking a JVM per invocation. Pin it here so a rename
    fails loudly instead."""
    from pyspark.sql import SparkSession

    assert hasattr(SparkSession, "_instantiatedSession"), (
        "PySpark renamed SparkSession._instantiatedSession — update "
        "cli.main's owns_session probe to the new global-default probe"
    )
    # with a live session (the test fixture), the attr must reflect it
    assert SparkSession._instantiatedSession is spark
