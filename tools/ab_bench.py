#!/usr/bin/env python
"""A/B a set of bench rows between two git revisions, interleaved.

Round-7's lesson: per-row bench deltas on this host can be
measurement artifacts (cache-pin protocol, CPU-steal bursts), so a
suspected regression is adjudicated by running OLD and NEW code in
the SAME process, alternating samples, on the same warm session —
host drift then hits both sides equally.

Usage:
    python tools/ab_bench.py <old_rev> <query> [<query> ...]

Checks out <old_rev>'s package into a temp dir, imports both
registries under distinct module names, and reports per-query
min-of-3 alternating samples for old vs new.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "environmental_stac_generator_spark"
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _load_registry_from(tree: Path, alias: str | None):
    """Import the package rooted at ``tree`` and return its full
    registry. With ``alias``, the loaded modules are renamed out of
    sys.modules afterwards (their function objects keep working via
    closures) so a subsequent load can import the same package from a
    different tree; ``alias=None`` leaves them installed (use for the
    final/current tree)."""
    import importlib

    sys.path.insert(0, str(tree))
    try:
        for name in list(sys.modules):
            if name == PKG or name.startswith(PKG + "."):
                del sys.modules[name]
        mod = importlib.import_module(f"{PKG}.registry")
        reg = dict(mod.load_full_registry())
        if alias is not None:
            for name in list(sys.modules):
                if name == PKG or name.startswith(PKG + "."):
                    sys.modules[f"{alias}:{name}"] = sys.modules.pop(name)
        return reg
    finally:
        sys.path.remove(str(tree))


def main() -> None:
    old_rev, queries = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = Path(tempfile.mkdtemp(prefix="envstac_ab_"))
    subprocess.run(
        f"git archive {old_rev} {PKG} | tar -x -C {tmp}",
        shell=True, check=True, cwd=REPO,
    )
    old_reg = _load_registry_from(tmp, "old")
    new_reg = _load_registry_from(REPO, None)

    from environmental_stac_generator_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="envstac-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus), driver_memory="8g",
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(reg, name) -> float:
        from environmental_stac_generator_spark.operators.lineage import (
            release_tracked,
        )

        t0 = time.perf_counter()
        reg[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sec = time.perf_counter() - t0
        release_tracked()
        return sec

    out = {}
    for name in queries:
        if name not in old_reg or name not in new_reg:
            out[name] = "absent in one side"
            continue
        run_once(new_reg, name)  # shared warmup
        olds, news = [], []
        for _ in range(3):  # interleaved: host drift hits both sides
            olds.append(run_once(old_reg, name))
            news.append(run_once(new_reg, name))
        out[name] = {
            "old_min": round(min(olds), 3),
            "new_min": round(min(news), 3),
            "ratio": round(min(news) / min(olds), 3),
            "old_samples": [round(x, 3) for x in olds],
            "new_samples": [round(x, 3) for x in news],
        }
    print(json.dumps({"old_rev": old_rev, "sf_dir": sf_dir, "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
