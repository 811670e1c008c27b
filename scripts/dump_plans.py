"""Dump the executed physical plans of headline queries to PLANS.md —
the scale-posture evidence (pushed filters, pruned schemas, broadcast
vs shuffle joins, window group limits) in reviewable form.

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark import get_spark
from chronobase_spark import queries as q

SF = "/root/testdata/sf0.001"

HEADLINE = [
    ("time_range_scan", "reference O1/O2: pushed ts bounds prune row groups"),
    ("revenue_by_region", "star join: every dimension broadcast"),
    ("shipping_priority_top10", "TPC-H Q3 shape: filter -> join -> agg -> top-k"),
    ("top3_events_per_user", "windowed top-k: WindowGroupLimit before the shuffle"),
    ("minhash_dedup_pairs", "LSH self-join: SHUFFLE_HASH hinted, never broadcast"),
    ("topk_cosine", "brute-force ANN baseline: one pass, TakeOrdered"),
    ("tfidf_top_terms", "explode + partial aggs + vocabulary broadcast"),
    ("dedup_exact", "hash groupBy dedup: partial aggregation map-side"),
    ("gap_fill_locf", "spine explode + left join + LOCF window, one key partitioning"),
    ("large_order_customers", "TPC-H Q18 shape: aggregate-then-join, partials shrink the shuffle"),
    ("cheapest_supplier_per_part", "argmin via min(struct): one shuffle, no distinct, no window sort"),
    ("doc_repetition", "repetition filter: two partial-agg shuffles + pure-expression bigrams"),
    ("ivf_assign_counts", "IVF assign: broadcast centroids, min(struct) argmin, one shuffle"),
    ("decontam_overlap", "decontamination: benchmark shingles broadcast, corpus map-side"),
    ("ohlc_hourly", "OHLC bars: argmin/argmax as min/max(struct), one partial-agg shuffle"),
    ("ewma_user_value", "EWMA: bounded affine-segment folds + summary chain, no full-history state"),
    ("gap_fill_interp", "interpolation gap fill: spine + 4 window exprs over ONE sort"),
    ("counter_rate", "PromQL rate: lag window, hash-partitioned on the key"),
    ("inverted_index_terms", "index build: one exchange; agg reuses the window partitioning"),
    ("sketch_rollup_users", "HLL rollup: partial sketch build + sketch-union merge"),
    ("doc_pack_chunks", "sequence packing: prefix-sum window partitioned by shard, no global sort"),
    ("embedding_quant_int8", "int8 quantization: map-only codegen pass, zero exchanges"),
    ("repeated_spans", "span dedup: token-linear rolling-hash explode, ONE partial-agg shuffle"),
    ("source_mix_weights", "mix weights: partial-agg groupBy + broadcast single-row totals"),
    ("stratified_sample_langs", "hash-threshold sampling: map-only predicate, one count shuffle"),
    ("span_dedup_assign", "span removal: window min on span_hash, per-doc rollup, no joins"),
    ("quality_topq_filter", "histogram quantile: tiny-table window + broadcast threshold join"),
    ("sql_brand_above_avg", "correlated subqueries decorrelated to one aggregate + joins"),
    ("seasonal_outlier_counts", "seasonal fences: quantile table broadcast, map-side fence test"),
    ("ohlc_daily_rollup", "continuous aggregate: daily bars FROM hourly bars, chained partial aggs"),
    ("pivot_daily_event_counts", "PIVOT with declared values: one agg, no distinct-collection pass"),
    ("pq_code_histogram", "product quantization: integer micro-space distances, broadcast codebook"),
    ("downsample_ltob", "LTOB downsampling: bucket partials + broadcast neighbor means + struct argmax"),
    ("value_trend_by_type", "OLS trend: four associative moment sums, one map-side-combinable shuffle"),
    ("nation_revenue_share", "ratio-to-report: dimension broadcasts + 1-row grand-total broadcast"),
    ("levenshtein_near_pairs", "canopy equi-join; when()-guarded DP so self/gap-pruned pairs never run O(n*m)"),
    ("bm25_top_terms", "BM25: tfidf family — explode + partial aggs + vocab broadcast + per-doc window"),
    ("char_entropy", "char entropy: map-only sorted-order fold, zero exchanges"),
    ("rrf_hybrid_topk", "RRF fusion: two distributed top-50 reductions, bounded windows, 50x50 fuse join"),
    ("cms_user_counts", "count-min sketch: explode(depth) partial agg to <=depth*width rows, broadcast estimate join"),
    ("pq_adc_search", "PQ ADC search: codes join broadcast LUT, integer sum, TakeOrdered top-k"),
    ("ivf_pq_search", "IVF-PQ: cell semi-join shuffle_hash (grows with corpus), ADC LUT broadcast"),
    ("user_event_paths", "ordered path agg: rank cap BEFORE collect, agg reuses window partitioning"),
    ("nation_pair_trade", "TPC-H Q7 shape: filtered dims broadcast, ONE fact-fact shuffle, residual pair predicate"),
    ("top_supplier_revenue", "TPC-H Q15 shape: grouped revenue + 1-row MAX broadcast equality join"),
    ("bigram_lm_logprob", "bigram LM: gram-TYPE LM table, gram-keyed shuffle_hash score join, 1-row vocab broadcast"),
    ("quality_weighted_sample", "importance sampling: map-only BIGINT accept test, one partial-agg groupBy"),
    ("token_zipf_slope", "Zipf fit: vocab groupBy -> distributed top-200 head BEFORE any global work"),
    ("quality_signal_corr", "signal correlation: two map-only integer signals, ONE moment groupBy"),
    ("holt_daily_smoothing", "Holt level+trend: one bounded (user, day) sorted fold, no history state"),
    ("cdc_chunk_dedup", "CDC chunker: map-only Generate barriers, md5-keyed partial-agg dedup, no corpus-byte shuffle"),
    ("cdc_incremental_ingest", "incremental chunk store: one chunker pass, md5-keyed left join of distinct-chunk tables"),
    ("hard_negative_mining", "hard negatives: capped-probe broadcast scan, conditional min(struct) argmaxes, no window"),
    ("split_leakage_report", "leakage audit: banded LSH pairs + doc_id-keyed split joins, <=6-row aggregate"),
    ("whitened_topk_overlap", "whitening: 64-row stats broadcast, z-rebuild keyed on vec_id, two probe scans"),
    ("multimodal_wav_features", "WAV decode: JVM payload synthesis + partition-preserving mapInPandas, zero exchanges"),
    ("user_sessions_native", "native session_window: ONE user-keyed shuffle + in-partition session merge, no iteration"),
    ("mad_outliers_approx", "approx MAD: mergeable percentile sketches map-side, type-keyed joins, no per-group sort"),
    ("benford_first_digit", "Benford audit: map-only string digit extraction, <=9*|types| partial-agg rows"),
    ("source_unigram_kl", "unigram KL: vocab-bounded aggregates, tok-keyed shuffle_hash, 1-row total broadcast"),
    ("kn_bigram_logprob", "Kneser-Ney LM: word-keyed shuffle_hash model assembly, gram-keyed score join, 1-row type-total broadcast"),
    ("phash_near_pairs", "perceptual-hash dedup: map-only raster dHash (bytes never shuffle), chunk-LSH self-join, Hamming cut before distinct"),
    ("jm_trigram_logprob", "JM trigram LM: derived marginals (one corpus explode), key-bound shuffle_hash assembly, 1-row N broadcast"),
    ("raster_topk_l1", "raster top-k: map-only grid decode, 8-row probe broadcast, WindowGroupLimit below the shuffle"),
    ("token_budget_select", "budget selection: histogram cumulative on tiny tables, boundary-only sharded prefix, no global sort"),
    ("dsir_select", "DSIR: one corpus gram pass cached, |buckets|-bounded ratio broadcast, persisted weight table feeds max + accept"),
    ("distinct_rollup_users", "exact distinct rollup: one scan dedups to (day, user) pairs, both rollup levels aggregate the reduced persisted table"),
    ("near_dup_admission_report", "admission report: one signature pass split by map-side flags, band join only across the split, verdict via doc-keyed left join"),
    ("semantic_admission_report", "semantic admission: stored-count-scaled cell model, cosine verify only inside cells, vec-keyed verdict left join"),
    ("phash_admission_report", "image admission: ONE persisted decode pass split by flags, chunk join across the split, Hamming cut before the doc-keyed verdict join"),
    ("ngram_containment_pairs", "containment pairs: the Jaccard finder's pruned posting-list self-join unchanged, only the projection is asymmetric"),
    ("seasonal_decompose_hod", "seasonal decomposition: (type, day)-keyed window sort (no task owns a type's full history), exact integer detrend, |types|x24 aggregate"),
    ("doc_novelty_ratio", "novelty curve: linear first-seen attribution — min(doc) per shingle + one shuffle_hash join back, no self-join, no f^2 blowup"),
    ("rolling_median_daily", "rolling daily median: event-grain work is one partial-agg shuffle; the window runs at DAY grain where a type partition is |days| rows"),
]

KEEP = re.compile(
    r"Join|Exchange|Aggregate|Window|Scan parquet|TakeOrdered|Sort |Project|Filter|Expand|Generate|InMemory"
)


def main() -> None:
    spark = get_spark(app_name="plan-dump", shuffle_partitions=8)
    lines = [
        "# PLANS — executed physical plans of headline queries (sf0.001, AQE on)",
        "",
        "Generated by `scripts/dump_plans.py`; asserted properties live in",
        "`tests/test_plans.py`. Lines are filtered to the operators that",
        "matter for scale (joins, exchanges, aggregates, windows, scans).",
        "",
    ]
    for name, why in HEADLINE:
        df = q.queries()[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines.append(f"## {name}")
        lines.append("")
        lines.append(f"_{why}_")
        lines.append("")
        lines.append("```")
        for ln in plan.splitlines():
            if KEEP.search(ln):
                lines.append(ln.rstrip()[:160])
        lines.append("```")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
