#!/usr/bin/env python
"""Regenerate EXPLAINS.md: formatted physical plans of representative
queries with the scale-critical fragments annotated. Run after changing
any plan-shaping code; the committed file is review evidence that
pushdown/broadcast/pruning hold."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SHOWN = [
    ("a4_pricing_summary", "filter pushdown into the parquet scan + partial aggregation"),
    ("j2_broadcast_dim_join", "broadcast hash join — no shuffle of the fact side"),
    ("q3_shipping_priority", "3-way join: filters below joins, top-k via TakeOrdered"),
    ("o4_top_k_orders", "sort+limit compiled to TakeOrderedAndProject"),
    ("e5_multimodal_manifest", "column pruning: payload/metadata only, lang/source never read"),
    ("e3b_lsh_bucket_ann", "ANN as equi-join on bucket id — no cross join"),
    ("e2b_minhash_lsh_pairs", "MinHash-LSH: fused band aggregation, self-equi-join on (band, bucket) — never all-pairs"),
    ("e6_sequence_packing", "shard-local packing: one partitioned window, no global state"),
    ("e7_curation_pipeline", "composed funnel: per-branch column pruning (raw count reads only 'source')"),
    ("e10_decontamination", "eval n-gram set broadcast — train corpus scanned once, no corpus shuffle"),
    ("e13_bm25_retrieval", "term stats broadcast; final top-k is TakeOrderedAndProject"),
    ("q6_forecast_revenue", "every predicate pushed into the lineitem scan (PushedFilters)"),
    ("q9_product_profit", "fact-fact join + three dims: fixed-size nation hinted broadcast, SF-scaled part left to AQE (r7 — the forced part broadcast lost 2.7x at sf10)"),
    ("t7_cohort_retention", "integer-bucket cohort matrix: two keyed aggregates, co-partitioned join"),
    ("e18_cdc_chunking", "content-defined chunking: zero-Exchange narrow HOF plan"),
    ("e20_chunk_dedup", "chunk-hash dedup: narrow chunker into one map-side-combinable groupBy"),
    ("x7_bloom_decontaminate", "bloom bitset broadcast; corpus scanned once, no corpus shuffle"),
    ("o11_weighted_sample", "weighted sample = projection + TakeOrderedAndProject, no shuffle"),
    ("w9_sessionization", "sessionize: user-partitioned windows, no global state"),
    ("e26_quality_classifier", "hashing-trick classifier fully inside whole-stage codegen — zero Python, one bounded-bucket shuffle"),
    ("rrf1_hybrid_retrieval", "hybrid fusion: both modality lists TakeOrderedAndProject-bounded before the 50x50 fused join"),
    ("m4_incremental_agg", "MV refresh: base partials + delta partials merged, base facts never re-read"),
    ("e25_incremental_dedup", "ingest dedup: corpus side reduced to distinct md5 keys before the semi-join"),
    ("f19_minmax_scale", "group stats broadcast back onto the fact scan — no fact shuffle"),
    # --- remaining headline-suite queries (bench.py HEADLINE, VERDICT r2 item 8) ---
    ("flagship_two_level_metrics", "two-level rollup: joins of small aggregates, fact read once per branch"),
    ("a7_ensemble_argmax", "explode + wide groupBy: partial aggregation before the shuffle"),
    ("a9_ema_ordered_fold", "per-key ordered fold: single keyed shuffle, fold inside the aggregate"),
    ("w3_running_total", "running window partitioned by key — no SinglePartition"),
    ("o6_ntile_kfold", "stratified ntile: label-partitioned window only"),
    ("e1_exact_dedup", "exact dedup: one shuffle on md5 key, map-side combine"),
    ("e2g_minhash_lsh_production", "production LSH tier: xxhash64 JVM hashing, banded self-equi-join"),
    ("e2c_simhash", "simhash fingerprints: narrow bit arithmetic, no Python"),
    ("e3_cosine_topk", "brute-force ANN baseline: small query side broadcast (documented baseline only)"),
    ("e4b_token_freq_topk", "token frequency: explode + count + TakeOrderedAndProject"),
    ("e4d_quality_score", "quality scoring: narrow text-feature pass, zero shuffles"),
    ("f8_budget_cascade", "budget cascade: pure HOF projection chain, no shuffle"),
    ("e8_document_chunking", "overlapping chunks: narrow explode, no shuffle"),
    ("x4_map_in_pandas_scoring", "Arrow-batched inference: mapInPandas between scan and sink, no shuffle"),
    ("s9_tumbling_window", "tumbling window agg: keyed by (window, type), partial agg before shuffle"),
    ("s9c_session_windows", "session windows: user-partitioned lag/cumsum windows, no global state"),
    ("q5_local_supplier_volume", "6-way star join: dims broadcast, fact never shuffled for the joins"),
    ("q17_small_quantity_revenue", "decorrelated agg filter: per-part avg joined back, one fact scan per side"),
    ("t1_asof_join", "as-of join: union + per-key window — no range explosion"),
    ("t3_time_rollup", "grouping-sets rollup: one expand + one aggregate"),
    ("m1_upsert_merge", "CDC merge: key-partitioned latest-wins window, co-partitioned union"),
    # --- round-3 additions ---
    ("e31_dsir_importance", "DSIR weights: one token explode feeds target/raw counts + per-doc fold; |vocab| weight join AQE-governed (unbounded table, q9 rule)"),
    ("e32_paragraph_dedup", "segment dedup: map-side-combinable min-struct winner per segment, equi-join back — no windows over segments"),
    ("e33_ngram_novelty", "trigram novelty: distinct-then-count with partial aggregation; gram-keyed equi-join"),
    ("e5d_frame_sample", "frame sampling: single narrow mapInPandas pass over the binary column, zero shuffles"),
    ("f20_robust_scale", "robust scaling: exact disc quantiles from the bounded value histogram, 3-number stats broadcast onto one fact scan"),
    ("i4_bfs_levels", "multi-source BFS: per-round edges equi-join + min groupBy, state O(reached)"),
    # --- round-4 additions (CJK / no-whitespace mode) ---
    ("f7b_char_tokenize", "char-mode tokenizer: broadcast char-vocab map join, narrow HOF encode, no shuffle"),
    ("e2j_char_shingle_lsh_pairs", "char-shingle LSH: 16 min-aggregates of one groupBy(doc_id) — no permutation explode — then banded self-equi-join"),
    ("e4g_char_ngram_stats", "char-trigram stats: narrow shingle explode, partial-aggregated freq/df, TakeOrderedAndProject top-k"),
    # --- round-5 additions ---
    ("e2k_salted_lsh_pairs", "grid-salted LSH: hot-bucket pair production split over (band, key, p, q) cells — no single-reducer hot key"),
    ("e35_hyperplane_semdedup", "centroid-free semantic dedup: hyperplane sign bands, self-equi-join on (band, 16-bit key), MAX prune aggregate"),
    ("e7c_funnel_accounting", "funnel accounting twin: quality gate pushed to the scan, first-occurrence window, three small keyed aggregates"),
    # --- round-8 additions (broadcast sweep + shared partitioning) ---
    ("q16_supplier_part_counts", "swept seat (r8): part + filtered-supplier joins AQE-governed — no forced broadcast of an SF-scaled table; anti join before the distinct expansion"),
    ("e19_unigram_logprob", "window-form vocab stats (r8): per-token count = sum(k) over a tok window of the pairs table — no frequency table materialized, joined, or broadcast; one tok exchange total"),
    ("e35b_hyperplane_semdedup_production", "numpy signature tier (r8): sign bits via one ArrowEvalPython matmul (the flat-SQL form's ~4k-node projection is codegen-declined and interprets); shared banded-join prune tail — plan shows the post-checkpoint join"),
    ("o13_cluster_aware_split", "leakage-safe split (r8): comp labels left-joined onto the corpus, md5 split projection — plan shows the post-closure join (CC rounds run eagerly, audited via eager_seat_curve)"),
    ("e36_substring_span_trim", "ExactSubstr span trim (r8 cont.): duplicate test is one count-over-partition window on the gram key (no df table, no join); coverage explode sits ABOVE the cnt>=2 filter — bounded by duplicated occurrences"),
    ("t10_decay_weighted_value", "half-life decay (r8 cont.): one-row max-day broadcast, decimal weight CASE inside whole-stage codegen, map-side partial decimal sums"),
    ("o15_epoch_repeat_schedule", "multi-epoch schedule (r8 cont.): bounded apportionment table broadcast; per-source md5 rank window — e12's cost shape with quotas allowed to exceed availability"),
    ("e7d_dedup_funnel", "dedup-family funnel (r9 fused): ONE tokenize pass + ONE checkpointed (doc_id,j,g) gram frame feeds BOTH the containment index (distinct view) and the span coverage (positional view); one-pass max-stage accounting replaces the 5-way tagged union"),
    # --- round-9 additions ---
    ("e35_hyperplane_semdedup", "hyperplane signature (r9 codegen fix): 64 plane dots projected as an array column (each dot its own JIT-able generated method), sign/pack in a second projection CollapseProject can't re-inline; pair cosine a flat fixed-DIM chain — zero interpreted ops"),
    ("s9g_salted_sessions", "salted two-level sessions (r9): stage-1 session_window per (user, 6h time salt) — hot-key state spread across salt buckets; stage-2 inclusive-gap lag/cumsum stitch over O(sessions) summary rows; equals s9c bit-for-bit"),
    ("e36c_span_trim_auto", "auto tier (r9): dispatches e36 text-key vs e36b md5-int-key on measured corpus-size rule (180 MiB boundary); plan IS the chosen tier's plan — same oracle either way"),
    ("s5_prediction_sink_roundtrip", "S5/S7 round-trip (r9): ordered CSV sink + JSON manifest written then re-read; returned plan scans the re-parsed CSV (eager materialize before scratch cleanup, s6/s11 discipline)"),
    # --- round-10 additions ---
    ("e35d_semdedup_auto", "auto tier (r10): a sampled saturation probe (md5 1/20 vec_id sample -> banded-pair estimate) dispatches e35b uncapped vs e35c capped on the measured 4.5M-pair budget; plan IS the chosen tier's plan — fixture sits in the uncapped regime, same e35 oracle"),
    ("s6_compaction_manifest", "S6 deterministic compaction manifest (r10): md5-mod shard key + hash repartition + partitionBy write under maxRecordsPerFile; returned plan scans the collected per-shard (rows, files) audit — every cell DuckDB-predicted"),
    # --- round-11 additions ---
    ("e9d_verified_clusters_capped", "capped verified clusters (r11): frequent-bucket window count prunes degenerate buckets BEFORE the band self-join (the exchange is shared — ReusedExchange), count(*) shared-band verify (rows unique per (pair, band) — no distinct expand), min-label CC over localCheckpointed rounds; returned plan scans the final checkpointed labels + one small sizes join"),
]


CBO_NOTE = """\
## CBO / statistics and join ordering (round 5, tools/cbo_experiment.py)

q5/q3/q17 are hand-ordered (early region prune, brand semi-join first)
because Catalyst WITHOUT statistics does not reorder inner joins. The
A/B harness (`python tools/cbo_experiment.py`, sf0.1, median-of-5,
catalog tables + `ANALYZE TABLE … FOR COLUMNS`) verifies both halves:

| variant | join order chosen | median |
|---|---|---|
| naive SQL, no CBO | lineitem→orders→customer→supplier→nation→region (= FROM order) | 0.56 s |
| naive SQL, CBO+stats | **nation→region→customer**→orders→lineitem→supplier | 0.51 s |
| hand-ordered, no CBO | customer→nation→region→orders→lineitem→supplier | 0.74 s |
| hand-ordered, CBO | unchanged (regression-guarded in tests/test_plans.py) | 0.78 s |

Q3 (naive lineitem-first SQL) confirms the same on a 3-way shape: no
CBO keeps lineitem→orders→customer; CBO+stats rewrites to
**orders→customer**→lineitem — the segment-filtered dim join runs before
the fact, which is the engine's hand-written q3 shape (0.42 → 0.38 s,
identical top-10).

With column stats, the cost-based reorderer independently reproduces the
hand ordering (dims pruned onto customer before any fact join) from the
naive spec-order SQL — engine-grade evidence the hand orderings encode
what a stats-equipped optimizer chooses. All four variants return
identical results. At sf0.1 wall-clock differences are muted because AQE
rescues the naive order with runtime broadcasts (every dim fits); at
cluster scale the orders⋈lineitem-first order shuffles the full fact
table, which is exactly what the reorder avoids. Caveats recorded:
(1) Spark 4.1 bug — `FilterEstimation` MatchErrors on TimestampNTZType
columns WITH stats, so NTZ columns are excluded from ANALYZE (default
selectivity suffices for date filters); (2) engine sessions keep CBO off
by default: the testdata path reads bare parquet (no catalog stats), and
a stats-less CBO is a no-op — production catalogs with maintained stats
should enable `spark.sql.cbo.enabled` + `joinReorder.enabled`, and the
plan suite asserts our hand-shaped plans survive that flip.

Q9 added round 7 (the join-heaviest registry shape — lineitem⋈orders
fact-fact plus three dims, naive FROM order joining supplier/nation
BEFORE the selective part LIKE prune). Numbers below are from the FIXED
harness — the first r7 recording ran every q9 variant with CBO on
(`label.endswith("_cbo")` is true for "..._no_cbo" too; caught in the
round's self-review and re-measured with explicit booleans):

| variant | join order (plan leaf-scan order) | median |
|---|---|---|
| q9 naive, no CBO | lineitem→orders→supplier→nation→part (= FROM order; part prune LAST) | 1.26 s |
| q9 naive, CBO+stats | **reordered**: supplier→nation→lineitem→orders→part | 1.25 s |
| q9 hand (engine), no CBO | **lineitem→orders→part**→supplier→nation | 1.21 s |
| q9 hand, CBO | unchanged (regression guard) | 1.14 s |

All four identical results. Unlike the earlier (buggy) recording
claimed, CBO+stats DOES rebuild q9's join tree from the naive SQL —
the evidence dimension this harness exists for — though at sf0.1 the
wall-clocks tie (every dim broadcasts, so join order barely moves the
probe volume). The hand order keeps the part prune immediately after
the fact-fact join and stays fastest; the margin between orders appears
at the SF where the part join outgrows the broadcast threshold (see
SCALE.md "q9 broadcast(part) hint": at sf10 AQE runs that join as
sort-merge, and join order decides how many rows reach it). The part
hint was removed the same round."""


def main() -> None:
    from wx20222_bigdata_spark.plans import formatted_plan
    from wx20222_bigdata_spark.registry import all_queries
    from wx20222_bigdata_spark.session import get_spark

    spark = get_spark(
        app_name="make-explains",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    out = [
        "# EXPLAINS — physical plan snapshots (generated by make_explains.py)",
        "",
        "Static plans at sf0.01 (AQE re-optimizes at runtime on top of these).",
        "Regenerate: `python make_explains.py`.",
        "",
        CBO_NOTE,
        "",
    ]
    for name, why in SHOWN:
        plan = formatted_plan(q[name](spark, "/root/testdata/sf0.01"))
        out += [f"## {name}", "", f"*Why shown:* {why}", "", "```", plan.rstrip(), "```", ""]
    Path("EXPLAINS.md").write_text("\n".join(out))
    print(f"wrote EXPLAINS.md ({len(SHOWN)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
