#!/usr/bin/env python
"""Regenerate the PLANS.md physical-plan audit table.

Prints one markdown row per audited query: shuffle count (Exchange
hash/range partitioning nodes), join strategies, whether any scan
carries PushedFilters, and whether a Python/Arrow node appears.

    python tools/plan_audit.py [sf_dir]          # default sf0.1
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from environmental_stac_generator_spark.registry import (  # noqa: E402
    load_full_registry,
    load_registry,
)
from environmental_stac_generator_spark.session import get_spark  # noqa: E402

# the bench HEADLINE surface plus the remaining SQL-oracle queries
AUDIT = [
    "q1_pricing_summary", "orders_lineitem_join", "star_join_enrich",
    "band_stats", "overview_pyramid", "skip_existing_items",
    "first_per_group", "band_pivot", "freq_parse", "minhash_signatures",
    "lsh_candidate_pairs", "embedding_near_dup", "cosine_topk",
    "ivf_ann_probe", "quality_score", "salted_agg", "salted_join",
    "tumbling_window_agg", "session_window_agg", "dedup_exact", "simhash",
    "extent_merge", "upsert_merge", "json_props_extract",
    "asof_join_events", "range_join_tiers", "time_rollup", "event_cube",
    "exact_percentiles", "hll_cardinality", "zorder_spatial",
    "lsh_verified_pairs", "stratified_sample", "decontaminate",
    "token_budget_select", "sequence_pack", "repetition_profile",
    "kmeans_clusters", "chunk_documents", "incremental_lsh_dedup",
    "vocab_top_tokens", "pii_scan", "semdedup_pairs", "span_dedup",
    "importance_weights", "perplexity_score", "int8_quantize",
    "pq_encode", "pq_ann_probe", "ivfpq_ann_probe",
    # r8 additions
    "ivfpq_residual_probe", "ivfpq_residual_nprobe", "ivf_ann_nprobe",
    "ann_lsh_multiprobe",
    # r9: materialized-index probes (partition-pruned scans)
    "ivf_index_probe", "ivfpq_index_probe",
]
# consolidated (driver-facing) merged entries worth auditing explicitly
MERGED = [
    "collection_extent", "agg_counts", "skip_existing", "fact_dim_join",
    "datetime_scalars", "classifier_scalars", "row_scalars", "minhash_lsh",
    "text_near_dup", "ann_lsh", "text_profile", "ordered_select",
    "windowed_aggs", "curation_suite",
]

PY_NODES = ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas", "MapInPandas")


def _final_only(plan: str) -> str:
    """Keep only the '== Final Plan ==' segments of an executed
    adaptive plan string: toString prints the final plan AND the
    initial plan below it, so counting over the raw text would
    double-count every operator."""
    out, keep = [], True
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            keep = False
        elif "== Final Plan ==" in line:
            keep = True
        if keep:
            out.append(line)
    return "\n".join(out)


def audit(reg, spark, sf_dir, name):
    # EXECUTE the query first, then read the plan: with AQE on, an
    # unexecuted DataFrame prints the initial AdaptiveSparkPlan
    # (isFinalPlan=false), not the runtime plan — join strategies AQE
    # flips (SMJ -> broadcast) and coalesced exchanges would be
    # misreported, so the audit must look at the FINAL adaptive plan
    # (the same toRdd-then-read pattern the soak's join detector uses)
    qe = reg[name].fn(spark, sf_dir)._jdf.queryExecution()
    qe.toRdd().count()
    plan = _final_only(qe.executedPlan().toString())
    shuffles = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    join_counts = {}
    for j in re.findall(r"(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|ShuffledHashJoin|CartesianProduct)", plan):
        join_counts[j] = join_counts.get(j, 0) + 1
    join_str = " ".join(
        f"{j}x{n}" if n > 1 else j for j, n in sorted(join_counts.items())
    ) or "—"
    # "any scan carries pushed filters": look for a NON-empty list —
    # requiring that no scan prints an empty one mislabeled every
    # multi-scan query whose second side is unfiltered
    pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "none"
    python = "yes" if any(p in plan for p in PY_NODES) else "no"
    return shuffles, join_str, pushed, python


SOAK_BEGIN = "<!-- SOAK-SPAN:BEGIN"
SOAK_END = "<!-- SOAK-SPAN:END -->"


def latest_soak_path() -> Path:
    return sorted(REPO.glob("SOAK_r*.json"))[-1]


def render_soak_block(soak_path: Path | None = None) -> str:
    """The span-gate numbers PLANS.md cites, rendered FROM the
    committed SOAK artifact (VERDICT r7 #1 and r8 #2: two consecutive
    rounds of hand-transcribed soak numbers drifting from the
    committed JSON — so the numeric claims are now generated, and
    tests/test_plans_render.py fails the suite on any drift)."""
    import json

    soak_path = soak_path or latest_soak_path()
    doc = json.loads(soak_path.read_text())
    ns = doc["natural_scale"]
    mach = doc.get("machine", {})
    unv_win = ns["span_dedup_unviral_window_sec"]
    unv_safe = ns["span_dedup_unviral_skewsafe_sec"]
    new_fmt = "span_dedup_skewsafe_sec" in ns  # r13 gate recalibration
    ctx = ""
    if "span_dedup_samples" in ns:
        sam = ns["span_dedup_samples"]
        usam = ns.get("span_dedup_unviral_samples", {})
        pair = (
            f"gated {sam.get('gated')} / skew-safe {sam.get('skew_safe')}"
            if new_fmt
            else f"skew-safe {sam.get('skew_safe')} / window "
            f"{sam.get('window')}"
        )
        ctx += (
            "\n- protocol: min of 2 INTERLEAVED samples per twin "
            "(alternating plans, the ab_bench adjudication shape — "
            "single-shot twin timings on this host flipped sign "
            "between earlier soak runs); viral samples "
            f"{pair}, unviral window "
            f"{usam.get('window')} / skew-safe {usam.get('skew_safe')}"
        )
    if mach:
        ctx += (
            f"\n- run context (from the artifact's `machine` block): "
            f"calibration probe **{mach.get('probe_sec_start')} s → "
            f"{mach.get('probe_sec_end')} s** across the run, steal "
            f"**{mach.get('steal_pct')}%** — single-run timings on this "
            "host carry that contention envelope; the gate BOUNDS "
            "(deterministic) and plan CHOICES are the stable signal, "
            "the twin timings the noisy one"
        )
    head = f"""{SOAK_BEGIN} generated by `python tools/plan_audit.py --render-soak`
from {soak_path.name}; do NOT hand-edit — tests/test_plans_render.py
fails on drift -->
**Span-gate measured numbers** (committed artifact `{soak_path.name}`,
`natural_scale` block):"""
    if new_fmt:
        viral, safe_tw = ns["span_dedup_sec"], ns["span_dedup_skewsafe_sec"]
        body = (
            f"\n- kilo-viral corpus ({ns.get('viral_copies')}-copy span): "
            f"sampled bound **{ns['span_gate_bound_viral']}** ≤ cap → "
            f"gated WINDOW plan **{viral:.2f} s**; forced skew-safe twin "
            f"**{safe_tw:.2f} s** (premium avoided "
            f"**{safe_tw / viral:.2f}x** — the r13 recalibration's win)"
            f"\n- mega-viral corpus ({ns.get('megaviral_copies')}-copy "
            f"span): bound **{ns['span_gate_bound_megaviral']}** > cap → "
            f"skew-safe plan, gated run "
            f"**{ns['span_dedup_megaviral_sec']:.2f} s** (the insurance "
            "flip, executed end-to-end)"
        )
        cliff = doc.get("span_window_cliff") or {}
        if cliff.get("sweep"):
            rows = "; ".join(
                f"{r['hot_group_rows']}: window **{r['window_sec']:.2f} s**"
                f" vs skew-safe **{r['skew_safe_sec']:.2f} s** "
                f"(**{r['premium']:.2f}x**)"
                for r in cliff["sweep"]
            )
            body += (
                f"\n- buffer-cliff sweep (one hot span-hash group, both "
                f"plans, parity asserted; cap "
                f"**{cliff.get('threshold')}**): {rows}"
            )
    else:
        viral, viral_win = ns["span_dedup_sec"], ns["span_dedup_window_sec"]
        body = (
            f"\n- viral corpus: sampled largest-group bound "
            f"**{ns['span_gate_bound_viral']}**"
            f"\n  → skew-safe plan **{viral:.2f} s**; forced window twin"
            f"\n  **{viral_win:.2f} s** (skew-safe/window ratio "
            f"**{viral / viral_win:.2f}x**)"
        )
    return f"""{head}{body}
- unviral corpus: bound **{ns["span_gate_bound_unviral"]}** → window plan
  **{unv_win:.2f} s**; forced skew-safe twin **{unv_safe:.2f} s**
  (ratio **{unv_safe / unv_win:.2f}x**)
- gate estimator cost **{ns["span_gate_sec"]:.2f} s**{ctx}
{SOAK_END}"""


ANN_BEGIN = "<!-- ANN-INDEX:BEGIN"
ANN_END = "<!-- ANN-INDEX:END -->"


def render_ann_block(soak_path: Path | None = None) -> str:
    """The materialized-index numbers PLANS.md cites (files-read
    pruning facts, build cost, trained-K recall), rendered FROM the
    committed SOAK artifact — the same drift-proofing as the span
    block (VERDICT r9 #8: anything numeric quoted from a committed
    JSON gets rendered, the drift class recurred twice as prose)."""
    import json

    soak_path = soak_path or latest_soak_path()
    doc = json.loads(soak_path.read_text())
    scale = doc.get("ann_index_scale", {})
    lines = [
        f"{ANN_BEGIN} generated by `python tools/plan_audit.py --render-soak`",
        f"from {soak_path.name}; do NOT hand-edit — tests/test_plans_render.py",
        "fails on drift -->",
        f"**Materialized-index measured numbers** (committed artifact "
        f"`{soak_path.name}`, `ann_index_scale` block):",
    ]
    for label in ("base", "10x"):
        b = scale.get(label) or {}
        pe, pa = b.get("probe_exact_nprobe4"), b.get("probe_adc_nprobe4")
        if not pe:
            continue
        lines.append(
            f"- {label} (K={b['cells']} bootstrap cells): build "
            f"**{b['build_sec']} s** once; warm exact probe reads "
            f"**{pe['files_read']}/{pe['files_total']}** files in "
            f"**{pe['sec']} s**, ADC probe "
            f"**{pa['files_read']}/{pa['files_total']}** files in "
            f"**{pa['sec']} s**"
        )
    t = scale.get("trained_k256_10x") or {}
    if t.get("probe_adc"):
        r = t.get("recall_at_10", {})
        cat = t.get("catalog_table_probe", {})
        frac = t["probe_adc"]["files_read"] / t["probe_adc"]["files_total"]
        lines.append(
            f"- trained K={t['cells_trained']} (of {t['cells_requested']} "
            f"requested) on the 10x corpus ({t['corpus_rows']} rows): "
            f"spherical-k-means **{t['train_sec']} s** + OPQ "
            # r12.5 split: sample materialization (driver numpy
            # kernel) vs trainer core; pre-split artifacts fold both
            # into opq_train_sec
            + (
                f"sample **{t['opq_sample_sec']} s** + OPQ train "
                f"**{t['opq_train_sec']} s**"
                if t.get("opq_sample_sec") is not None
                else f"**{t['opq_train_sec']} s**"
            )
            + f" + build **{t['build_sec']} s**; "
            f"cell balance max/mean **{t['balance']['max_over_mean']}**; "
            f"probes read **{t['probe_adc']['files_read']}/"
            f"{t['probe_adc']['files_total']}** files (**{frac:.1%}** of "
            f"the index — the K~sqrt(N) prune regime), warm ADC probe "
            # pre-r12 artifacts carry the old key names (fresh-path
            # was the unlabeled headline then)
            f"**{t.get('probe_adc_sec_catalog', t.get('catalog_table_probe_adc_sec'))} s**"
            f" (catalog route — the headline; fresh-path "
            f"**{t.get('probe_adc_sec_fresh_listing', t.get('probe_adc_sec'))} s**"
            f" pays an all-K dir listing per call no catalog deployment "
            f"pays)"
        )
        if t.get("probe_refine_sec_catalog") is not None:
            lines.append(
                f"- refine stage at this K (catalog route): ADC probe + "
                f"bounded candidate handoff + pruned float re-read in "
                f"**{t['probe_refine_sec_catalog']} s** warm"
            )
        if r:
            ref = r.get("refine_at_r", {})
            ref_txt = (
                "; refine recall@10 at R = "
                + ", ".join(
                    f"{k}: **{v['mean']} ± {v['sd']}**"
                    for k, v in sorted(ref.items(), key=lambda kv: int(kv[0]))
                )
                if ref
                else ""
            )
            lines.append(
                f"- trained-K recall@10 (nprobe={r['nprobe']}, "
                f"{r['n_probes']} probes): index-served ADC "
                f"**{r['index_adc_mean']} ± {r['index_adc_sd']}** vs the "
                f"same-cells exact ceiling "
                f"**{r['same_cells_exact_ceiling_mean']} ± "
                f"{r['same_cells_exact_ceiling_sd']}** — the gap is pure "
                "code-quantization loss; the routing loss is the "
                f"ceiling's distance from 1{ref_txt}. (Caveat: the 10× "
                "soak corpus is 10 noisy replicas per base vector, so "
                "each probe's true neighbors are near-copies sharing its "
                "cell and codes — recall here reflects the replica "
                "regime; the uniform-corpus quality number is the sf0.1 "
                "bench ladder.)"
            )
        wc = (r or {}).get("ceiling_at_nprobe")
        if wc:
            lines.append(
                "- routing dial at this K (exact-in-cells ceiling vs "
                "I/O): "
                + "; ".join(
                    f"nprobe={w_} (**{v['files_frac']:.1%}** of files) "
                    f"→ **{v['mean']} ± {v['sd']}**"
                    for w_, v in sorted(
                        wc.items(), key=lambda kv: int(kv[0])
                    )
                )
            )
        fr = t.get("recall_cost_frontier")
        if fr:
            lines.append(
                "- recall-vs-cost frontier (r13: each (nprobe, R) "
                "grid point joins its recall to the measured probe "
                "latency and files read; R=10 is the unrefined ADC "
                "probe, catalog route):"
            )
            lines.append(
                "  | nprobe | R | recall@10 | probe s | files |"
            )
            lines.append("  |---|---|---|---|---|")
            for row in fr:
                # files_total is recorded in the row since r14
                # (ADVICE r13 #5); inverting the 4-dp-rounded fraction
                # is the pre-r14 fallback only
                total = row.get("files_total") or round(
                    row["files_read"] / max(row["files_frac"], 1e-9)
                )
                lines.append(
                    f"  | {row['nprobe']} | {row['refine_r']} | "
                    f"{row['recall_mean']} ± {row['recall_sd']} | "
                    f"{row['probe_sec']} | {row['files_read']}/{total} |"
                )
        u = scale.get("trained_k256_uniform10x") or {}
        ur = u.get("recall_at_10")
        if ur:
            uref = ur.get("refine_at_r", {})
            uref_txt = (
                "; refine recall@10 at R = "
                + ", ".join(
                    f"{k_}: **{v['mean']} ± {v['sd']}**"
                    for k_, v in sorted(
                        uref.items(), key=lambda kv: int(kv[0])
                    )
                )
                if uref
                else ""
            )
            uwc = ur.get("ceiling_at_nprobe") or {}
            uwc_txt = (
                "; widened ceilings: "
                + "; ".join(
                    f"nprobe={w_} (**{v['files_frac']:.1%}** of files) "
                    f"→ **{v['mean']} ± {v['sd']}**"
                    for w_, v in sorted(
                        uwc.items(), key=lambda kv: int(kv[0])
                    )
                )
                if uwc
                else ""
            )
            lines.append(
                f"- uniform-regime twin (fresh-seed isotropic corpus, "
                f"same 10x size: {u['corpus_rows']} rows, "
                f"K={u['cells_trained']}): index-served ADC "
                f"**{ur['index_adc_mean']} ± {ur['index_adc_sd']}** vs "
                f"the same-cells exact ceiling "
                f"**{ur['same_cells_exact_ceiling_mean']} ± "
                f"{ur['same_cells_exact_ceiling_sd']}**{uref_txt}"
                f"{uwc_txt} — the no-near-copy regime the caveat above "
                "flags, same full lifecycle at K~sqrt(N)"
            )
        if cat:
            route = t.get("catalog_route") or {}
            route_txt = (
                f" (since r14 the headline catalog numbers take the "
                f"MANIFEST-BACKED view — `register_index_view`, pinned "
                f"epoch {route.get('epoch')}, snapshot-isolated through "
                f"maintenance; raw metastore-table comparison probe "
                f"**{t.get('probe_adc_sec_metastore_table')} s**)"
                if route.get("kind") == "manifest_view"
                else ""
            )
            lines.append(
                f"- catalog-table (metastore) route: same probe through "
                f"`CREATE TABLE ... LOCATION` + `recoverPartitions` reads "
                f"**{cat['files_read']}/{cat['files_total']}** files of "
                f"**{t.get('catalog_table_partitions')}** registered "
                f"partitions — pruning survives the metastore listing "
                f"path{route_txt}"
            )
        cmc = t.get("compact_many_cells")
        if cmc:
            epochs_txt = (
                f", committing **{cmc['epochs_committed']}** epoch"
                f" (measured delta {cmc['epoch_delta']}; r15 "
                f"single-epoch apply — the per-cell commit cost is "
                f"gone by construction)"
                if "epochs_committed" in cmc
                else ""
            )
            lines.append(
                f"- many-cell compaction at this K (r14 batched rewrite "
                f"VERDICT r13 #4; r15 single-epoch commit VERDICT r14 "
                f"#1): 2 appends inflate every cell, then ONE Spark job "
                f"+ ONE epoch commit compact "
                f"**{cmc['cells_compacted']}** cells in "
                f"**{cmc['compact_sec']} s** (appends took "
                f"{cmc['append_sec_2_batches']} s){epochs_txt}"
            )
        bt = t.get("balance_tail")
        if bt:
            scans = bt.get("per_probed_cell_scan_sec", {})
            spread = (
                f", per-probed-cell pruned-scan latency "
                f"**{min(scans.values())}–{max(scans.values())} s**"
                if scans
                else ""
            )
            lines.append(
                f"- balance tail at this K: probed cells hold "
                f"**{bt['probed_rows_sum']}** rows vs a worst-case "
                f"nprobe-largest-cells bound of "
                f"**{bt['worst_nprobe_rows_sum']}** "
                f"(**{bt['worst_over_probed']}×**); cell populations "
                f"max/p99/mean **{bt['cell_rows_max']}/"
                f"{bt['cell_rows_p99']}/{bt['cell_rows_mean']}**{spread}"
            )
        ab = t.get("encode_kernel_ab")
        if ab:
            # a sub-ms numpy build on a tiny corpus rounds to 0.0 —
            # emit an explicit n/a line instead of dividing by it
            # (ADVICE r10/r11: the section must not silently vanish)
            ratio = (
                f"(**{ab['hof_build_sec'] / ab['numpy_build_sec']:.1f}x**)"
                if ab.get("numpy_build_sec")
                else "(ratio n/a: sub-ms BLAS build at this corpus size)"
            )
            lines.append(
                f"- encode-kernel A/B at this K: Arrow/BLAS build "
                f"**{ab['numpy_build_sec']} s** vs HOF build "
                f"**{ab['hof_build_sec']} s** "
                f"{ratio} "
                f"over {ab['rows']} rows — cell mismatches "
                f"**{ab['cell_mismatch']}**, code mismatches "
                f"**{ab['code_mismatch']}** (hairline float ties only)"
            )
    ci = doc.get("ann_compaction_ingest") or {}
    if ci.get("probe_adc_sec_fresh") is not None:
        lines.append(
            f"- compaction + 2PC ingest at 10x ({ci['n_batches']} "
            f"stream micro-batches of {ci['batch_rows']} rows): "
            f"files/cell max **{ci['files_per_cell_fresh']['max']} → "
            f"{ci['files_per_cell_inflated']['max']} → "
            f"{ci['files_per_cell_compacted']['max']}** "
            f"(fresh → ingested → compacted), ADC probe "
            f"**{ci['probe_adc_sec_fresh']} → "
            f"{ci['probe_adc_sec_inflated']} → "
            f"{ci['probe_adc_sec_compacted']} s** with executed "
            f"numFiles **{ci['probe_files_fresh']} → "
            f"{ci['probe_files_inflated']} → "
            f"{ci['probe_files_compacted']}**; guards fired: in-flight "
            f"staging **{ci.get('guard_fired_inflight')}**, pending "
            f"ledger **{ci.get('guard_fired_pending')}**, writer under "
            f"maintenance lock **{ci.get('writer_refused_under_lock')}**; "
            f"ledger replay **{ci.get('ledger_replay_sec')} s**; "
            f"exactly-once: **{ci.get('rows_total')}/"
            f"{ci.get('rows_expected')}** rows, "
            f"**{ci.get('duplicate_vec_ids')}** duplicate ids"
        )
    mc = (doc.get("manifest_commit_curve") or {}).get("rows")
    if mc:
        curve = "; ".join(
            f"{row['files']:,} files → **{row['commit_sec']} s**, "
            f"{row['manifest_bytes'] / 1e6:.2f} MB"
            for row in mc
        )
        big = mc[-1]
        lines.append(
            f"- manifest-commit cost curve (VERDICT r13 #6, synthetic "
            f"~1 file/cell): {curve}. At {big['files']:,} entries a "
            f"commit costs {big['commit_sec']} s of JSON I/O — fine at "
            f"micro-batch/maintenance cadence (seconds apart). The K × "
            f"{big['commit_sec']} s per-cell-apply exposure this curve "
            f"named is CLOSED in r15: compaction commits ONE epoch for "
            f"the whole run (single pending manifest naming every "
            f"cell's adds/deletes, one swap — same isolation, fewer "
            f"crash sites; `compact_many_cells` above measures the "
            f"epoch delta). Go/no-go on Iceberg's manifest-list split: "
            f"only if single-manifest SIZE ever dominates "
            f"({big['manifest_bytes'] / 1e6:.0f} MB at 1e5 entries — "
            f"not yet at any measured scope)"
        )
    lines.append(ANN_END)
    return "\n".join(lines)


def render_soak_into_plans() -> None:
    plans = REPO / "PLANS.md"
    text = plans.read_text()
    block = render_soak_block()
    start = text.index(SOAK_BEGIN)
    end = text.index(SOAK_END) + len(SOAK_END)
    text = text[:start] + block + text[end:]
    if ANN_BEGIN in text:
        block = render_ann_block()
        start = text.index(ANN_BEGIN)
        end = text.index(ANN_END) + len(ANN_END)
        text = text[:start] + block + text[end:]
    plans.write_text(text)
    print(f"rendered soak + ann blocks from {latest_soak_path().name} into PLANS.md")


def main() -> None:
    if "--render-soak" in sys.argv:
        render_soak_into_plans()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    if not sf_dir.startswith("/"):  # 'sf0.1' shorthand, like driver_sweep
        sf_dir = f"/root/testdata/{sf_dir}"
    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    full = load_full_registry()
    cons = load_registry()
    print("| query | shuffles | joins | pushed filters | python in plan |")
    print("|---|---|---|---|---|")
    for name in AUDIT:
        s, j, p, py = audit(full, spark, sf_dir, name)
        print(f"| {name} | {s} | {j} | {p} | {py} |")
    print()
    print("| consolidated entry | shuffles | joins | python in plan |")
    print("|---|---|---|---|")
    for name in MERGED:
        s, j, p, py = audit(cons, spark, sf_dir, name)
        print(f"| {name} | {s} | {j} | {py} |")
    spark.stop()


if __name__ == "__main__":
    main()
