"""Invariants of the soak's synthesized corpora (bench.py).

The natural-regime fixture's whole point is statistical shape: the
10x fixture replicates the corpus wholesale, which makes every
duplicate group grow with the factor (a 250x run would turn each
group into a 250-clique and explode pair counts quadratically — no
real corpus does that). The natural fixture must instead keep the
dup share constant with bounded multiplicity, plus one viral
document for the mega-bucket fallback. These checks run at a tiny
factor; the recorded SOAK artifact uses the defaults.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def test_natural_fixture_shape(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    base = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(6)],
            "lang": "en",
            "source": ["s0", "s1"] * 3,
            "n_chars": 0,
        }
    )
    base.to_parquet(src / "documents.parquet")

    nat_dir, n_rows = bench._synthesize_natural_dir(str(src), factor=22, viral=9)
    try:
        out = pd.read_parquet(Path(nat_dir) / "documents.parquet")
        assert len(out) == n_rows == 22 * 6 + 9
        assert out["doc_id"].is_unique

        # viral block: 9 identical texts, none shared with the corpus
        viral = out[out["source"] == "srcviral"]
        assert len(viral) == 9
        assert viral["text"].nunique() == 1
        assert not out.loc[out["source"] != "srcviral", "text"].isin(
            [viral["text"].iloc[0]]
        ).any()

        # dup multiplicity is BOUNDED at 2 (every 10th replica copies
        # its predecessor) — the fixture must never grow cliques with
        # the factor the way the 10x replication fixture does
        corpus = out[out["source"] != "srcviral"]
        counts = corpus.groupby("text")["doc_id"].count()
        assert counts.max() == 2
        # dup share ~2/10 of replicas beyond r=0: factor 22 has dup
        # replica pairs at r=(8,9) and r=(18,19)
        assert (counts == 2).sum() == 2 * 6

        # replicas are DISTINCT documents: distinct text count equals
        # total minus the duplicated copies
        assert corpus["text"].nunique() == len(corpus) - 2 * 6

        # per-replica token tagging preserves token counts (span/
        # token-budget work scales with docs, not with factor × len)
        tok0 = len(base["text"].iloc[0].split())
        tagged = corpus[corpus["doc_id"] == 6 * 3]["text"].iloc[0]  # r=3, doc 0
        assert len(tagged.split()) == tok0

        # n_chars recomputed to match the tagged text
        assert (out["n_chars"] == out["text"].str.len()).all()
    finally:
        shutil.rmtree(nat_dir, ignore_errors=True)
