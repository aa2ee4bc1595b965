"""Tests for the PII scan, vocabulary heavy hitters, and SemDeDup
semantic dedup operators (SURVEY §2.11 round-2 additions)."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from environmental_stac_generator_spark.queries.curation import (
    VOCAB_TOP_K,
    vocab_top_tokens,
)
from environmental_stac_generator_spark.queries.similarity import (
    K_CLUSTERS,
    SEM_THRESHOLD,
    semdedup_pairs,
)
from environmental_stac_generator_spark.queries.text import pii_scan, with_pii
from environmental_stac_generator_spark.tables import load


def test_pii_redaction_on_synthetic_pii(spark):
    rows = [
        (1, "contact me at alice@example.com or 10.0.0.1 today"),
        (2, "call 555-123-4567 about the customer account"),
        (3, "no sensitive content here"),
        (4, "supplier and customer met the supplier"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in with_pii(df).collect()}
    assert got[1].n_pii == 2  # email + IP
    assert got[1].n_entities == 0
    assert got[2].n_pii == 1  # phone
    assert got[2].n_entities == 1
    assert got[3].n_pii == 0 and got[3].n_entities == 0
    assert got[4].n_entities == 3
    # redaction changes the fingerprint only when something matched
    import hashlib

    assert got[3].redacted_fp == hashlib.md5(rows[2][1].encode()).hexdigest()
    assert got[1].redacted_fp == hashlib.md5(
        b"contact me at <PII> or <PII> today"
    ).hexdigest()
    assert got[4].redacted_fp == hashlib.md5(
        b"<ENT> and <ENT> met the <ENT>"
    ).hexdigest()


def test_pii_scan_runs_on_corpus(spark, sf_dir):
    out = pii_scan(spark, sf_dir)
    assert out.columns == ["doc_id", "n_pii", "n_entities", "redacted_fp"]
    stats = out.agg(
        F.sum("n_pii").alias("pii"), F.sum("n_entities").alias("ents")
    ).first()
    # synthetic corpus has no emails/IPs but does contain the terms
    assert stats.pii == 0
    assert stats.ents > 0


def test_vocab_top_tokens_matches_pandas(spark, sf_dir):
    got = vocab_top_tokens(spark, sf_dir).collect()
    assert len(got) == VOCAB_TOP_K
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    from collections import Counter, defaultdict

    occ: Counter = Counter()
    dfreq = defaultdict(set)
    for _, r in docs.iterrows():
        for t in r.text.split(" "):
            occ[t] += 1
            dfreq[t].add(r.doc_id)
    expect = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP_K]
    assert [(r.tok, r.n_occ) for r in got] == expect
    for r in got:
        assert r.n_docs == len(dfreq[r.tok])


def test_semdedup_pairs_match_numpy(spark, sf_dir):
    got = {(r.vec_a, r.vec_b): r.cosine for r in semdedup_pairs(spark, sf_dir).collect()}
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    E = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for _, r in emb.iterrows()}

    # replicate the fixed-iteration Lloyd's assignment
    cents = {cid: E[cid].copy() for cid in sorted(E) if cid < K_CLUSTERS}
    assign = {}
    for it in range(2):
        for vid, v in E.items():
            best = min(
                (float(((v - c) ** 2).sum()), cid) for cid, c in sorted(cents.items())
            )
            assign[vid] = best[1]
        if it == 0:
            for cid in sorted(cents):
                members = [E[v] for v, a in assign.items() if a == cid]
                if members:
                    m = np.mean(members, axis=0)
                    cents[cid] = np.floor(m * 1e6 + 0.5) / 1e6

    expect = {}
    by_cluster: dict[int, list[int]] = {}
    for vid, cid in assign.items():
        by_cluster.setdefault(cid, []).append(vid)
    for cid, vids in by_cluster.items():
        vids.sort()
        for i, a in enumerate(vids):
            for b in vids[i + 1:]:
                cos = float(E[a] @ E[b]) / (
                    math.sqrt(float(E[a] @ E[a])) * math.sqrt(float(E[b] @ E[b]))
                )
                cos = math.floor(cos * 1e5 + 0.5) / 1e5
                if cos >= SEM_THRESHOLD:
                    expect[(a, b)] = cos
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9, k


def test_span_dedup_flags_known_shared_span(spark, tmp_path):
    from environmental_stac_generator_spark.queries.curation import SPAN_W, span_dedup

    shared = " ".join(f"tok{i}" for i in range(SPAN_W))  # exactly one window
    rows = [
        (1, f"{shared} tail one", "web"),        # shares `shared` with doc 2
        (2, f"lead two {shared}", "web"),
        (3, " ".join(f"uniq{i}" for i in range(SPAN_W + 4)), "web"),
        (4, "too short to window", "books"),     # < SPAN_W tokens: excluded
        (5, " ".join(f"b{i}" for i in range(SPAN_W)), "books"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.source: r for r in span_dedup(spark, str(tmp_path)).collect()}

    web = got["web"]
    # docs 1/2: 3 windows each (SPAN_W+2 tokens); doc 3: 5 windows
    assert web.n_windows == 3 + 3 + 5
    assert web.n_docs_flagged == 2
    assert web.n_dup_windows == 2  # the shared window, once per doc
    assert web.doc_id_sum == 1 + 2

    books = got["books"]  # doc 5 windows alone, doc 4 too short
    assert (books.n_windows, books.n_docs_flagged, books.n_dup_windows,
            books.doc_id_sum) == (1, 0, 0, 0)


def test_span_dedup_matches_python_recompute(spark, sf_dir):
    import hashlib
    from collections import Counter, defaultdict

    from environmental_stac_generator_spark.queries.curation import SPAN_W, span_dedup

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    occ = Counter()  # (hash, doc) -> occurrences
    meta = {}
    totals = Counter()
    for r in docs:
        w = r.text.split(" ")
        if len(w) < SPAN_W:
            continue
        meta[r.doc_id] = r.source
        totals[r.source] += len(w) - SPAN_W + 1
        for s in range(len(w) - SPAN_W + 1):
            h = hashlib.md5(" ".join(w[s : s + SPAN_W]).encode()).hexdigest()
            occ[(h, r.doc_id)] += 1
    docs_per_h = Counter(h for (h, _) in occ)
    flagged = defaultdict(int)
    for (h, d), c in occ.items():
        if docs_per_h[h] >= 2:
            flagged[d] += c
    exp = {}
    for src in totals:
        ids = [d for d in flagged if meta[d] == src]
        exp[src] = (
            len(ids),
            sum(flagged[d] for d in ids),
            totals[src],
            sum(ids),
        )
    got = {
        r.source: (r.n_docs_flagged, r.n_dup_windows, r.n_windows, r.doc_id_sum)
        for r in span_dedup(spark, sf_dir).collect()
    }
    assert got == exp


def _py_importance(rows):
    """Reference recompute of importance_weights: same hashed-bucket
    unigram LLR model, plain Python floats (IEEE doubles, like both
    engines)."""
    import hashlib
    from collections import Counter, defaultdict

    from environmental_stac_generator_spark.queries.curation import (
        IMP_TARGET_DEFAULT,
        N_IMP_BUCKETS,
    )

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % N_IMP_BUCKETS

    rc, tc = Counter(), Counter()
    for _, text, source in rows:
        for tok in text.split(" "):
            b = bucket(tok)
            rc[b] += 1
            if source == IMP_TARGET_DEFAULT:
                tc[b] += 1
    r_tot, t_tot = sum(rc.values()), sum(tc.values())
    lr = {
        b: math.floor(
            (
                math.log((tc.get(b, 0) + 1.0) / (t_tot + N_IMP_BUCKETS))
                - math.log((rc[b] + 1.0) / (r_tot + N_IMP_BUCKETS))
            )
            * 1e6
            + 0.5
        )
        for b in rc
    }
    per_doc = Counter()
    meta = {}
    for doc_id, text, source in rows:
        meta[doc_id] = source
        for tok in text.split(" "):
            per_doc[doc_id] += lr[bucket(tok)]
    exp = defaultdict(lambda: [0, 0, 0, 0])  # n_docs, n_pos, logw_sum, id_sum
    for doc_id, logw in per_doc.items():
        e = exp[meta[doc_id]]
        e[0] += 1
        e[2] += logw
        if logw > 0:
            e[1] += 1
            e[3] += doc_id
    return {s: tuple(v) for s, v in exp.items()}


def test_importance_weights_matches_python_recompute(spark, sf_dir):
    from environmental_stac_generator_spark.queries.curation import (
        importance_weights,
    )

    rows = [
        (r.doc_id, r.text, r.source)
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    exp = _py_importance(rows)
    got = {
        r.source: (r.n_docs, r.n_target_like, r.logw_sum_micro, r.doc_id_sum)
        for r in importance_weights(spark, sf_dir).collect()
    }
    assert got == exp and len(got) > 1


def test_importance_weights_upweights_target_domain(spark, tmp_path):
    """Hand corpus: target-domain docs reuse target vocabulary, the
    other domain's vocabulary is disjoint — DSIR must upweight the
    target-like doc and downweight the off-domain ones."""
    from environmental_stac_generator_spark.queries.curation import (
        IMP_TARGET_DEFAULT,
        importance_weights,
    )

    # each token repeated 5x so the domain likelihood ratio dominates
    # the add-one smoothing term (tiny corpora are smoothing-bound)
    t_text = " ".join(f"tgt{i}" for i in range(10) for _ in range(5))
    w_text = " ".join(f"web{i}" for i in range(10) for _ in range(5))
    rows = [
        (1, t_text, IMP_TARGET_DEFAULT),
        (2, t_text, IMP_TARGET_DEFAULT),
        (3, t_text, "web"),   # target-like doc in the other domain
        (4, w_text, "web"),
        (5, w_text, "web"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.source: (r.n_docs, r.n_target_like, r.logw_sum_micro, r.doc_id_sum)
        for r in importance_weights(spark, str(tmp_path)).collect()
    }
    assert got == _py_importance(rows)
    # the target-vocab doc in the web domain is the one upweighted doc
    assert got["web"][1] == 1 and got["web"][3] == 3
    assert got[IMP_TARGET_DEFAULT][1] == 2


def test_perplexity_matches_python_recompute(spark, sf_dir):
    """perplexity_score == a plain-Python hashed bigram-LM recompute
    (independent of both engines)."""
    import hashlib
    from collections import Counter

    from environmental_stac_generator_spark.queries.text import (
        NB_LM,
        perplexity_score,
    )

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % NB_LM

    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    uni, big = Counter(), Counter()  # uni = CONTEXT counts (bigram firsts)
    docs = {}
    for r in rows:
        w = r.text.split(" ")
        docs[r.doc_id] = w
        for a, b in zip(w, w[1:]):
            uni[bucket(a)] += 1
            big[bucket(f"{a} {b}")] += 1
    exp = {}
    for did, w in docs.items():
        nll = 0
        nb = 0
        for a, b in zip(w, w[1:]):
            nb += 1
            nll += math.floor(
                (math.log(uni[bucket(a)] + NB_LM) - math.log(big[bucket(f"{a} {b}")] + 1.0))
                * 1e6
                + 0.5
            )
        exp[did] = (nb, nll)
    got = {
        r.doc_id: (r.n_bigrams, r.nll_micro)
        for r in perplexity_score(spark, sf_dir).collect()
    }
    assert got == exp and len(got) > 0


def test_perplexity_flags_disfluent_text(spark, tmp_path):
    """A doc of common fluent bigrams must score lower (per bigram)
    than a doc of one-off shuffled bigrams."""
    from environmental_stac_generator_spark.queries.text import perplexity_of

    fluent = "the cat sat on the mat"
    rows = [(i, fluent, "web") for i in range(20)]
    rows.append((100, "mat the on sat cat the", "web"))  # unseen bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r.doc_id: r for r in perplexity_of(df).collect()}
    fluent_rate = got[0].nll_micro / got[0].n_bigrams
    odd_rate = got[100].nll_micro / got[100].n_bigrams
    assert odd_rate > fluent_rate


def test_int8_quantize_matches_numpy(spark, sf_dir):
    """int8_quantize == a numpy absmax-scale recompute; codes bounded
    to [-127, 127] and exact zeros stay zero."""
    from environmental_stac_generator_spark.queries.similarity import int8_quantize

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    exp = {}
    for r in emb:
        v = np.array(r.embedding, dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        s = scale if scale != 0.0 else 1.0
        for i, x in enumerate(v):
            exp[(r.vec_id, i)] = math.floor(float(x) / s + 0.5)
    got = {(r.vec_id, r.idx): r.q for r in int8_quantize(spark, sf_dir).collect()}
    assert got == exp and len(got) > 0
    assert all(-127 <= q <= 127 for q in got.values())


def test_perplexity_reference_lm_scores_unseen_bigrams(spark):
    """Held-out reference LM: a scored bigram whose hash bucket never
    occurs in the reference must still contribute its (maximal)
    smoothed NLL — the old inner joins dropped exactly those terms,
    making out-of-domain text look MORE fluent."""
    from environmental_stac_generator_spark.queries.text import perplexity_of

    ref = spark.createDataFrame(
        [(1, "aa bb aa bb aa bb")], "doc_id long, text string"
    )
    # in-domain doc + a doc of tokens the reference never saw
    scored = spark.createDataFrame(
        [(10, "aa bb aa bb"), (11, "zz qq zz qq")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in perplexity_of(scored, lm=ref).collect()}
    # every bigram of BOTH docs is counted (3 each), none dropped
    assert rows[10]["n_bigrams"] == 3 and rows[11]["n_bigrams"] == 3
    # and the out-of-domain doc is LESS fluent (higher mean NLL)
    assert (
        rows[11]["nll_micro"] / rows[11]["n_bigrams"]
        > rows[10]["nll_micro"] / rows[10]["n_bigrams"]
    )
