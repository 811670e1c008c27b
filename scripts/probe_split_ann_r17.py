"""Stage-component profile of leakage_safe_split and ann_recall_at_10
(r17 session-6 examination): decompose each query's cost into its
pipeline stages with the noop sink (guide §1.4), min-of-N interleaved
rounds so ambient load cannot masquerade as a stage cost.

Question each answers:
- leakage_safe_split: how much is the jaccard-pair preamble (already
  optimized, family B) vs the CC iterations vs the two split joins?
  If the preamble dominates, the query is already riding the optimized
  path and has no independent headroom.
- ann_recall_at_10: exact-truth side vs IVF-PQ side vs the final
  intersection — composed ≈ Σ stages or is there a sharing gap?
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from chronobase_spark import get_spark
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_ROUNDS", "4"))

spark = get_spark(app_name="probe-split-ann", master="local[32]",
                  shuffle_partitions=32)
from chronobase_spark import catalog
from chronobase_spark.dedup import ngram, cluster
from chronobase_spark.functions import similarity
from chronobase_spark.dedup import embedding as emb_dedup
import chronobase_spark.queries as q


def t(label, fn, results):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    results.setdefault(label, []).append(dt)


docs = catalog.table(spark, SF, "documents")
embs = catalog.table(spark, SF, "embeddings")

res = {}
for rnd in range(N):
    # --- leakage_safe_split decomposition ---
    t("split:pairs_only",
      lambda: ngram.jaccard_pairs(docs, threshold=0.5, max_df=50)
              .select("doc_a", "doc_b"), res)
    t("split:full",
      lambda: q.queries()["leakage_safe_split"](spark, SF), res)
    # --- ann_recall_at_10 decomposition ---
    t("ann:exact_side",
      lambda: similarity.topk_cosine(
          embs.filter(F.col("vec_id") == 0), embs, k=10).select("n_id"), res)
    t("ann:ivfpq_side",
      lambda: emb_dedup.ivf_pq_topk(embs, probe_id=0, num_planes=6, m=8, k=10),
      res)
    t("ann:full",
      lambda: q.queries()["ann_recall_at_10"](spark, SF), res)
    print(f"round {rnd + 1}/{N} done", flush=True)

print("\n=== min / median over", N, "rounds ===")
for k, v in res.items():
    sv = sorted(v)
    med = sv[len(sv) // 2]
    print(f"{k:22s} min {sv[0]:6.2f}s  med {med:6.2f}s  all {[round(x,2) for x in v]}")
