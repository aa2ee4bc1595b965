#!/usr/bin/env python
"""Synthesize a driver-shaped test corpus (ADVICE r7: CI runs pytest
on ubuntu-latest, where /root/testdata does not exist).

Emits the same ten-table star schema as the driver's TESTDATA.md
(`region nation customer supplier part orders lineitem events
documents embeddings`, one parquet each) with matching schemas, key
ranges, and the data properties the test suite exercises: referential
integrity across the TPC-H-ish keys, exact- and near-duplicate
documents (the dedup family needs non-empty results), L2-normalized
64-d float32 embeddings (the ANN family's cosine/L2 equivalence), and
`n_chars == length(text)`. Values are deterministic (numpy
default_rng(42)) but NOT identical to the driver's — every test
compares Spark against DuckDB over the same files, so any
schema-faithful corpus verifies the engine.

Usage:
    python tools/make_testdata.py --sf 0.001 --out testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "de", "fr"]
ADJ = ["cold", "small", "large", "hot", "dim", "shiny", "plain", "round"]
NOUN = ["widget", "bolt", "gear", "cog", "pin", "plate", "rod", "clip"]
BRANDS = [f"Brand#{b}" for b in range(1, 26)]
PTYPES = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "MEDIUM"]
VOCAB = (
    "the a spark table scan join merge sort hash key order part window "
    "small big fast slow batch stream filter group agg query row column "
    "data value line customer vector dup"
).split()
EMB_DIM = 64


def _write(df: pd.DataFrame, out: Path, name: str) -> None:
    # the driver ships timestamp[us]; pandas defaults to [ns], which
    # Spark's vectorized reader handles differently (tables.load has a
    # nanos branch) — write the canonical layout
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df.to_parquet(out / f"{name}.parquet", index=False)


def make(sf: float, out: Path, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    out.mkdir(parents=True, exist_ok=True)

    n_cust = max(int(150_000 * sf), 30)
    n_supp = max(int(10_000 * sf), 5)
    n_part = max(int(200_000 * sf), 40)
    n_ord = max(int(1_500_000 * sf), 300)
    n_li = max(int(6_000_000 * sf), 1200)
    n_ev = max(int(1_000_000 * sf), 200)
    n_doc = max(int(500_000 * sf), 100)
    n_emb = max(int(500_000 * sf), 100)

    _write(
        pd.DataFrame(
            {"r_regionkey": np.arange(5, dtype="int32"), "r_name": REGIONS}
        ),
        out, "region",
    )
    _write(
        pd.DataFrame(
            {
                "n_nationkey": np.arange(25, dtype="int32"),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": (np.arange(25) % 5).astype("int32"),
            }
        ),
        out, "nation",
    )
    _write(
        pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype="int64"),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust).astype("int32"),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": rng.choice(
                    ["FURNITURE", "AUTOMOBILE", "BUILDING", "MACHINERY",
                     "HOUSEHOLD"], n_cust),
            }
        ),
        out, "customer",
    )
    _write(
        pd.DataFrame(
            {
                "s_suppkey": np.arange(n_supp, dtype="int64"),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": rng.integers(0, 25, n_supp).astype("int32"),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
        out, "supplier",
    )
    _write(
        pd.DataFrame(
            {
                "p_partkey": np.arange(n_part, dtype="int64"),
                "p_name": [
                    f"{rng.choice(ADJ)} {rng.choice(NOUN)}" for _ in range(n_part)
                ],
                "p_brand": rng.choice(BRANDS, n_part),
                "p_type": rng.choice(PTYPES, n_part),
                "p_size": rng.integers(1, 51, n_part).astype("int32"),
                "p_retailprice": np.round(900 + 0.1 * np.arange(n_part), 2),
            }
        ),
        out, "part",
    )
    odate = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2400, n_ord), unit="D"
    )
    _write(
        pd.DataFrame(
            {
                "o_orderkey": np.arange(n_ord, dtype="int64"),
                "o_custkey": rng.integers(0, n_cust, n_ord).astype("int64"),
                "o_orderstatus": rng.choice(STATUSES, n_ord, p=[0.48, 0.48, 0.04]),
                "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
                "o_orderdate": odate,
                "o_orderpriority": rng.choice(PRIORITIES, n_ord),
            }
        ),
        out, "orders",
    )
    sdate = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2800, n_li), unit="D"
    )
    _write(
        pd.DataFrame(
            {
                "l_orderkey": rng.integers(0, n_ord, n_li).astype("int64"),
                "l_partkey": rng.integers(0, n_part, n_li).astype("int64"),
                "l_suppkey": rng.integers(0, n_supp, n_li).astype("int64"),
                "l_linenumber": rng.integers(1, 8, n_li).astype("int32"),
                "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                "l_linestatus": rng.choice(["F", "O"], n_li),
                "l_shipdate": sdate,
            }
        ),
        out, "lineitem",
    )
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev)), unit="us"
    )
    _write(
        pd.DataFrame(
            {
                "event_id": np.arange(n_ev, dtype="int64"),
                "ts": ts,
                "user_id": rng.integers(0, max(n_ev // 40, 5), n_ev).astype("int64"),
                "event_type": rng.choice(EVENT_TYPES, n_ev),
                "value": np.round(rng.uniform(0, 200, n_ev), 2),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
            }
        ),
        out, "events",
    )

    # documents: 10-99 tokens from the fixed vocab; every 10th doc is
    # an EXACT copy of its predecessor and every 7th a near-dup (one
    # token changed) so the dedup/minhash/cluster family has non-empty
    # results, like the driver corpus
    texts: list[str] = []
    for i in range(n_doc):
        if i and i % 10 == 0:
            texts.append(texts[i - 1])
            continue
        n_tok = int(rng.integers(10, 100))
        toks = list(rng.choice(VOCAB, n_tok))
        if i and i % 7 == 0:
            prev = texts[i - 1].split(" ")
            prev[len(prev) // 2] = str(rng.choice(VOCAB))
            toks = prev
        texts.append(" ".join(toks))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_doc, dtype="int64"),
            "text": texts,
            "lang": rng.choice(LANGS, n_doc, p=[0.4, 0.2, 0.15, 0.15, 0.1]),
            "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    _write(docs, out, "documents")

    emb = rng.normal(size=(n_emb, EMB_DIM)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(
        pd.DataFrame(
            {
                "vec_id": np.arange(n_emb, dtype="int64"),
                "embedding": [row.astype("float32") for row in emb],
                "label": (np.arange(n_emb) % 10).astype("int32"),
            }
        ),
        out, "embeddings",
    )
    print(f"wrote sf={sf} corpus to {out} "
          f"(lineitem={n_li}, docs={n_doc}, embeddings={n_emb})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    make(a.sf, a.out, a.seed)
