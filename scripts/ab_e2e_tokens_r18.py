"""r18 families K/L/N end-to-end A/B: time the heavy affected queries
with the OLD tokenizer/gram/filter implementations monkeypatched in
(arm "old") vs the repo's new code (arm "new"), alternating arms in ONE
session (interleaved min-of-N — the bench-ambient methodology) with the
noop sink and clearCache() between executions.

Usage: python scripts/ab_e2e_tokens_r18.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column
from pyspark.sql import functions as F

from chronobase_spark import get_spark
from chronobase_spark import queries as q
from chronobase_spark.catalog import spread
from chronobase_spark.dedup import minhash, ngram, simhash, winnow
from chronobase_spark.functions import text

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

QUERIES = [
    "minhash_md5_pairs",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "winnow_dup_pairs",
    "simhash_md5_pairs",
    "bigram_lm_logprob",
    "tfidf_top_terms",
    "minhash_lsh_recall",
]


# ---- the r17 (pre-K/L/N) implementations, verbatim ----

def old_tokens(text_col: Column) -> Column:
    cleaned = F.regexp_replace(F.lower(text_col), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != F.lit(""))


def old_shingles(text_col: Column, n: int = 3) -> Column:
    def grams_of(tk: Column) -> Column:
        count = F.greatest(F.size(tk) - (n - 1), F.lit(0))
        grams = F.transform(
            F.sequence(F.lit(0), count - 1),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        )
        return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))

    return F.get(F.transform(F.array(old_tokens(text_col)), grams_of), 0)


def old_shingle_table(df, text_col="text", id_col="doc_id", n=3):
    return (
        spread(df, key=id_col)
        .select(F.col(id_col).alias("doc"), old_shingles(F.col(text_col), n).alias("sh"))
        .filter(F.size("sh") > 0)
    )


def old_selected_fingerprints(text_col, k=winnow.K, w=winnow.W):
    empty = F.array().cast("array<bigint>")

    def windows_of(hh):
        return F.when(
            F.size(hh) >= w,
            F.transform(
                F.sequence(F.lit(1), F.size(hh) - w + 1),
                lambda i: F.array_min(F.slice(hh, i, w)),
            ),
        ).otherwise(empty)

    def fps_of(tk):
        grams = F.when(
            F.size(tk) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - k),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice(tk, i + 1, k), " ")), 1, 8
                    ),
                    16,
                    10,
                ).cast("bigint"),
            ),
        ).otherwise(empty)
        return F.get(F.transform(F.array(grams), windows_of), 0)

    return F.array_distinct(
        F.get(F.transform(F.array(old_tokens(text_col)), fps_of), 0)
    )


def old_winnow_fingerprints(df, text_col="text", id_col="doc_id", k=winnow.K, w=winnow.W):
    fps = old_selected_fingerprints(F.col(text_col), k, w)
    return (
        spread(df, key=id_col)
        .select(F.col(id_col).alias("doc"), fps.alias("_fps"))
        .filter(F.size("_fps") > 0)
        .select("doc", F.explode("_fps").alias("fp"))
    )


NEW = {
    "text.tokens": text.tokens,
    "ngram.tokens": ngram.tokens,
    "simhash.tokens": simhash.tokens,
    "winnow.tokens": winnow.tokens,
    "ngram.shingles": ngram.shingles,
    "minhash.shingles": minhash.shingles,
    "minhash.shingle_table": minhash.shingle_table,
    "winnow.selected_fingerprints": winnow.selected_fingerprints,
    "winnow.winnow_fingerprints": winnow.winnow_fingerprints,
}


def set_arm(arm: str) -> None:
    if arm == "old":
        text.tokens = old_tokens
        ngram.tokens = old_tokens
        simhash.tokens = old_tokens
        winnow.tokens = old_tokens
        ngram.shingles = old_shingles
        minhash.shingles = old_shingles
        minhash.shingle_table = old_shingle_table
        winnow.selected_fingerprints = old_selected_fingerprints
        winnow.winnow_fingerprints = old_winnow_fingerprints
    else:
        text.tokens = NEW["text.tokens"]
        ngram.tokens = NEW["ngram.tokens"]
        simhash.tokens = NEW["simhash.tokens"]
        winnow.tokens = NEW["winnow.tokens"]
        ngram.shingles = NEW["ngram.shingles"]
        minhash.shingles = NEW["minhash.shingles"]
        minhash.shingle_table = NEW["minhash.shingle_table"]
        winnow.selected_fingerprints = NEW["winnow.selected_fingerprints"]
        winnow.winnow_fingerprints = NEW["winnow.winnow_fingerprints"]


def main():
    spark = get_spark(
        app_name="ab_e2e_tokens_r18", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.queries()
    results: dict[tuple[str, str], list[float]] = {}

    def run_one(name: str, arm: str) -> float:
        set_arm(arm)
        spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
        t0 = time.perf_counter()
        reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warm both arms once (JIT/codegen caches), discard
    for name in QUERIES:
        for arm in ("old", "new"):
            run_one(name, arm)
    for r in range(REPS):
        for name in QUERIES:
            for arm in ("old", "new"):
                results.setdefault((name, arm), []).append(run_one(name, arm))
        print(f"-- rep {r + 1}/{REPS} done", flush=True)
    print(f"\n== {SF_DIR} reps={REPS} (min / median, seconds) ==")
    tot = {"old": 0.0, "new": 0.0}
    for name in QUERIES:
        row = []
        for arm in ("old", "new"):
            v = sorted(results[(name, arm)])
            tot[arm] += v[0]
            row.append(f"{arm} min={v[0]:.3f} med={v[len(v) // 2]:.3f}")
        ratio = results[(name, "new")] and min(results[(name, "new")]) / min(
            results[(name, "old")]
        )
        print(f"{name:28s} {row[0]}   {row[1]}   new/old={ratio:.2f}")
    print(f"sum-of-mins: old={tot['old']:.2f} new={tot['new']:.2f} "
          f"ratio={tot['new'] / tot['old']:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
