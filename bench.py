#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed with a ``noop``-format write as the terminal
action: every output column is fully materialized on the executors (unlike
``count()``, under which Catalyst prunes unreferenced projections — a
map-only query would time little more than the scan) with zero driver
materialization. A warmup run of the flagship query absorbs JVM/codegen
startup so per-query numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_saas_etl_spark import registry
from aws_saas_etl_spark.session import get_spark

# Headline queries: one per operator family (scan-agg, join-topk, multi-join,
# window, semi-join, set-op, dedup, similarity, text, events).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_orders_per_customer",
    "customer_order_running_totals",
    "order_priority_counts",
    "revenue_rollup",
    "supplier_diversity_per_brand",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # stream_* entries are availableNow drains of Structured Streaming
    # pipelines — dominated by fixed micro-batch/sink overhead, not query
    # execution, so they are correctness-gated (driver + pytest) but not
    # part of the latency benchmark.
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE and not n.startswith("stream_")
    ]

    # Warmup: run the flagship once to absorb JVM + codegen startup cost.
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    # SESSION CONTROL (VERDICT r9 #4): the same fixed reference query
    # timed at session start / middle / end. The r8→r9 comparison showed
    # a uniform ~10-40% cold drift on untouched queries — a long bench
    # session ages (JVM heap, code cache, accumulated shuffle dirs), and
    # without a control that aging is indistinguishable from real
    # regressions in round-over-round tables. Normalize cross-round
    # comparisons by the control ratio before believing a per-query delta.
    def control_run() -> float:
        t0 = time.perf_counter()
        qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 4)

    session_control = {"start": control_run()}

    # Best of 2 runs per query: the first execution of a plan shape pays
    # whole-stage-codegen compilation (measured ±3-7s run-to-run noise on
    # the wide-aggregate queries); the second run reflects steady-state
    # execution, which is what a long-lived cluster session sees.
    from aws_saas_etl_spark import memo

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # Queries that touch any session memo (stored-artifact model) have a
    # deliberate two-regime cold/warm cost; DERIVE the set by tracing memo
    # reads/writes during plan construction instead of hand-curating it
    # (the r7 list missed ann_index_staleness_report; VERDICT r7 #4).
    memo_backed: set[str] = set()
    # queries whose CONSTRUCTION reads an untraced sizing cache (table row
    # counts, append cuts — r13's catalog-statistic memos): reported under
    # a separate key (VERDICT r13 #6) so the best-of-2 flattering (rep 2
    # skips the one metadata job rep 1 paid) is visible in the bench line
    # without flooding the stored-artifact cold/warm table.
    sizing_touched: set[str] = set()
    for name in names:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            with memo.track() as touched:
                df = qs[name](spark, sf_dir)
            if touched:
                memo_backed.add(name)
            if getattr(touched, "sizing", None):
                sizing_touched.add(name)
            # noop sink: full evaluation of every output column, nothing
            # shipped to the driver.
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)
        # run-to-run spread (max-min over the 2 runs) — the variance signal
        # that tells a regression from this box's measured drift (same-commit
        # totals have swung 137s→198s across sessions)
        spreads[name] = round(max(runs) - min(runs), 4)

    total = round(sum(timings.values()), 4)

    # CANARY: a third measurement of a fixed cross-family subset, so every
    # BENCH_r{N}.json carries an intra-session variance estimate alongside
    # the best-of-2 table. [best_of_3, spread_of_3] per canary query.
    canary_names = [
        n
        for n in (
            "q1_pricing_summary",
            "promo_revenue_share",
            "table_profile",
            "doc_tfidf_neighbors",
            "supplier_pagerank",
            "minhash_lsh_pairs",
            "dedup_canonical_keep_best",
            # r5: the two remaining expensive queries tuning claims will
            # be made about (per r4 verdict) — bankable best-of-3 numbers
            "ann_ivf_topk",
            "events_resample_locf",
            # r6: the two new gram-heavy additions — bankable numbers for
            # round-over-round comparison of the DSIR explode and the
            # composed manifest chain
            "dsir_importance_weights",
            "training_manifest",
            # r6b: the two manifest-maintenance queries — their cost is
            # the repair path (CC merge rounds, sub-pair verify, touched-
            # shard re-ranks) on top of memoized stored state
            "training_manifest_incremental",
            "training_manifest_deletion_repair",
            # r12: the composed full-pipeline manifest (a top-12-class
            # composite whose round-over-round number claims will be made
            # against the additivity of its parts) and the new
            # three-chain Gopher repetition scan
            "training_manifest_full_pipeline",
            "doc_gopher_repetition",
        )
        if n in timings
    ]
    canary: dict[str, list[float]] = {}
    for name in canary_names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        third = time.perf_counter() - t0
        best3 = min(timings[name], third)
        worst3 = max(timings[name] + spreads[name], third)
        canary[name] = [round(best3, 4), round(worst3 - best3, 4)]

    # COLD/WARM: the memo-backed queries (stored-artifact model: content
    # clusters, manifest, fitted IVF index) have a deliberate two-regime
    # cost — rep 1 BUILDS the stored state, reps 2+ consume it — which
    # otherwise masquerades as canary spread. Measure both explicitly:
    # memos cleared, one cold run, one warm run. The set is DERIVED from
    # the memo trace above, so every present and future memo-backed query
    # gets a cold/warm row automatically.
    from aws_saas_etl_spark.session import clear_session_memos

    session_control["mid"] = control_run()

    # COLD_WARM CONTROL (VERDICT r12 #3): the r12 driver block showed the
    # manifest family 3-8× slower than every independent re-measurement —
    # external load during the (late-session) cold/warm sweep, invisible
    # because the only controls ran before/after the whole block. Fix:
    # interleave the fixed control query every few pairs, keyed by how many
    # pairs preceded it, so a contaminated stretch is self-evident (its
    # neighboring control readings balloon with it) without anyone having
    # to re-measure.
    _CW_CONTROL_EVERY = 5
    cold_warm: dict[str, dict[str, float]] = {}
    cold_warm_control: dict[str, float] = {"after_0": control_run()}
    for i, name in enumerate(sorted(memo_backed), start=1):
        clear_session_memos()
        pair = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            pair.append(round(time.perf_counter() - t0, 4))
        cold_warm[name] = {"cold": pair[0], "warm": pair[1]}
        if i % _CW_CONTROL_EVERY == 0:
            cold_warm_control[f"after_{i}"] = control_run()
    cold_warm_control["after_all"] = control_run()

    # STREAM_BENCH: the stream_* drains are excluded from the latency table
    # (fixed micro-batch/checkpoint overhead would swamp query cost), but
    # their end-to-end throughput IS a regression signal for the
    # streaming pipelines: input rows per second through a full
    # availableNow drain (file source → watermark → stateful op → sink),
    # normalized by what each pipeline ACTUALLY ingests (r12 — dividing
    # every stream by the events count overstated the document streams'
    # throughput ~20×: documents is 5k rows at sf0.1, events 100k).
    from pyspark.sql import functions as F

    from aws_saas_etl_spark.catalog import load_table
    from aws_saas_etl_spark.operators.dedup import DELTA_DOC_FRACTION
    from aws_saas_etl_spark.sources.custom import STREAM_TOTAL_ROWS

    n_events = load_table(spark, sf_dir, "events").count()
    docs = load_table(spark, sf_dir, "documents")
    n_documents = docs.count()
    n_embeddings = load_table(spark, sf_dir, "embeddings").count()
    # the manifest-delta stream stages only the arriving slice (same
    # shingle-percentile cut as the batch incremental merge)
    delta_cut = docs.agg(
        F.percentile("doc_id", 1.0 - DELTA_DOC_FRACTION)
    ).first()[0]
    n_docs_delta = docs.where(F.col("doc_id") > F.lit(delta_cut)).count()
    stream_inputs = {
        "events": n_events,
        "documents": n_documents,
        "embeddings": n_embeddings,
        "documents_delta": n_docs_delta,
        "custom_source": STREAM_TOTAL_ROWS,
    }
    # EXHAUSTIVE stream→input mapping (ADVICE r12): the old helper fell
    # back to "events" for unknown names, which is exactly how the r11
    # minhash figure got mis-normalized ~20×. Every registered stream_*
    # query must appear here; the assertion below makes adding a stream
    # without classifying its input a hard startup failure, not a silent
    # wrong denominator.
    STREAM_INPUT_KIND = {
        "stream_bq_signature_ingest": "embeddings",
        "stream_click_attribution": "events",
        "stream_click_unmatched": "events",
        "stream_custom_sink_ingest": "custom_source",
        "stream_custom_source_ingest": "custom_source",
        "stream_dedup_within_watermark": "events",
        "stream_hourly_stats": "events",
        "stream_hourly_to_parquet": "events",
        "stream_lexical_postings_ingest": "documents",
        "stream_logreg_score_ingest": "documents",
        "stream_manifest_delta_ingest": "documents_delta",
        "stream_minhash_signature_ingest": "documents",
        "stream_running_user_totals": "events",
        "stream_session_stats": "events",
        "stream_sliding_windows": "events",
        "stream_sq8_code_ingest": "embeddings",
        "stream_static_enrichment": "events",
        "stream_topk_trending": "events",
        "stream_upsert_state": "events",
    }
    stream_names = sorted(n for n in qs if n.startswith("stream_"))
    unmapped = [n for n in stream_names if n not in STREAM_INPUT_KIND]
    assert not unmapped, (
        f"stream queries missing from STREAM_INPUT_KIND: {unmapped} — "
        "classify each stream's actual input table before benching it"
    )

    stream_bench: dict[str, dict[str, float]] = {}
    for name in stream_names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        kind = STREAM_INPUT_KIND[name]
        stream_bench[name] = {
            "drain_seconds": round(secs, 4),
            "input_rows_per_sec": round(stream_inputs[kind] / secs, 1),
        }

    session_control["end"] = control_run()

    side_effecting = sorted(
        n for n in qs if getattr(qs[n], "side_effecting", False)
    )
    line = render_line(
        timings, spreads, sf, stream_bench, stream_inputs, canary, cold_warm,
        session_control, side_effecting, cold_warm_control,
        sorted(sizing_touched),
    )
    # Persist the FULL json beside the stdout line (VERDICT r13 #7): the
    # driver preserves only the 2,000-char tail of stdout in
    # BENCH_r{N}.json — r12's round-over-round table was emptied by exactly
    # that truncation — so the complete run also lands in a repo file the
    # next round's comparison can always read.
    write_last_run(line)
    print(line)
    spark.stop()


def write_last_run(line: str, path: str | None = None) -> str:
    """Write the full bench JSON (pretty-printed, one key per line) to
    ``bench_last_run.json`` next to this file; returns the path."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_last_run.json"
        )
    with open(path, "w") as f:
        json.dump(json.loads(line), f, indent=1)
        f.write("\n")
    return path


def render_line(
    timings, spreads, sf, stream_bench, stream_inputs, canary, cold_warm,
    session_control, side_effecting, cold_warm_control=None,
    sizing_cache_touched=None,
) -> str:
    """Assemble the single JSON output line. Key ORDER is load-bearing:
    the driver preserves only the TAIL of this line in BENCH_r{N}.json,
    so everything that must survive cross-round comparison sits LAST,
    and every list that grows with fleet size sits BEFORE the fixed-size
    tail keys (tests/test_functions.py pins the tail at current registry
    size — VERDICT r11 #3: side_effecting grew between session_control
    and top_12_slowest and was one spurt from pushing the control out)."""
    total = round(sum(timings.values()), 4)
    return json.dumps(
        {
            "metric": "total_query_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            # context: totals grow with operator coverage; per-query
            # cost is the comparable number across rounds
            "n_queries": len(timings),
            "mean_query_seconds": round(total / max(len(timings), 1), 4),
            "stream_bench": stream_bench,
            # per-kind input sizes the stream throughputs are normalized
            # by (r12: each stream divides by what it actually ingests)
            "stream_input_rows": stream_inputs,
            # LAST keys on purpose: the driver preserves only the TAIL of
            # this line, and `queries` is alphabetical — without this the
            # slowest a–l queries would be invisible in BENCH_r{N}.json.
            "canary_best3_spread": canary,
            # store-roundtrip queries execute a real storage write at
            # DataFrame construction (the leg they exist to prove):
            # BOTH their cold and warm figures include that rewrite
            # (ADVICE r7). Input-fixture STAGING writes (stream_*
            # session-cached parquet staging) are exempt by
            # convention — see tools/plan_audit.py (VERDICT r9 #7).
            # Placed BEFORE cold_warm (VERDICT r11 #3): this list grows
            # with the fleet, so it must never sit between the fixed
            # tail keys.
            "side_effecting": side_effecting,
            # queries whose construction reads an untraced SIZING cache
            # (table row counts / append cuts — catalog statistics): their
            # best-of-2 rep 2 skips one metadata job rep 1 paid (VERDICT
            # r13 #6). A growing list, so it sits with the other growing
            # lists, ahead of the fixed tail keys.
            "sizing_cache_touched": sizing_cache_touched or [],
            # two-regime costs of the stored-artifact queries: cold
            # builds the artifact, warm serves from it — the honest
            # split of what best-of-2 + canary spread conflate
            "cold_warm": cold_warm,
            # interleaved control readings taken DURING the cold/warm
            # sweep (every 5 pairs + bookends, keyed by pairs completed):
            # the self-evidence that distinguishes a contaminated block
            # (controls balloon alongside the inflated pairs, as the
            # un-reproducible r12 manifest figures would have shown) from
            # a real regression (controls stay in band). Grows ~1 key per
            # 5 memo-backed queries — kept just ahead of the fixed tail,
            # and the tail unit test pins that it survives the driver's
            # preserved 2,000-char tail at current registry size.
            "cold_warm_control": cold_warm_control or {},
            # fixed reference query at session start/mid/end — the
            # drift normalizer for round-over-round tables. Placed
            # AFTER cold_warm (VERDICT r10 #2): cold_warm grew past
            # the driver's preserved-tail length, so anything before
            # it is cut from BENCH_r{N}.json — the control rows must
            # sit in the surviving tail with top_12_slowest.
            "session_control": session_control,
            "top_12_slowest": [
                [n, timings[n], spreads[n]]
                for n in sorted(timings, key=timings.get, reverse=True)[:12]
            ],
        }
    )


if __name__ == "__main__":
    main()
