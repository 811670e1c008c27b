"""r18 family K/L: tokenizer + shingle-gram expression A/B.

Phase 1 (--check): prove bit-identical outputs of the rewritten
expressions against the current ones over the REAL documents table
(every sf dir given) plus an adversarial literal frame (NULL, empty,
punctuation-only, unicode whitespace, tabs/newlines, digits).

Phase 2 (--time): interleaved min-of-N timing of the heavy consumers
(shingle_table noop / simhash agg noop) old vs new, alternating
old,new,old,new... in ONE session so ambient drift hits both arms.

Usage:
  python scripts/ab_tokens_r18.py --check /root/testdata/sf0.01 /root/testdata/sf0.1
  python scripts/ab_tokens_r18.py --time /root/testdata/sf0.1 5
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from chronobase_spark import get_spark  # noqa: E402


def tokens_old(text: Column) -> Column:
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != F.lit(""))


def tokens_new(text: Column) -> Column:
    # ONE regex pass: split on runs of non-alphanumerics. Maximal
    # [a-z0-9] runs are identical to replace-punct-then-split-\s+.
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit(""))


def grams_old(tk: Column, n: int) -> Column:
    count = F.greatest(F.size(tk) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
    )
    return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))


def grams_new(tk: Column, n: int) -> Column:
    count = F.greatest(F.size(tk) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(" ", *[F.get(tk, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(count > 0, grams).otherwise(F.array()))


def shingles_old(text: Column, n: int = 3) -> Column:
    return F.get(F.transform(F.array(tokens_old(text)), lambda tk: grams_old(tk, n)), 0)


def shingles_new(text: Column, n: int = 3) -> Column:
    return F.get(F.transform(F.array(tokens_new(text)), lambda tk: grams_new(tk, n)), 0)


ADVERSARIAL = [
    (None,),
    ("",),
    ("   ",),
    ("...!!!###",),
    ("a",),
    ("a b",),
    ("a b c",),
    ("a b c d e",),
    ("Hello, World! 123",),
    ("tab\tsep\nnewline\rcr",),
    ("unicode nbsp emsp end",),
    ("UPPER lower MiXeD 42x7",),
    ("trailing space ",),
    (" leading",),
    ("a  b   c",),
    ("héllo wörld çafé",),
    ("a-b c_d e.f",),
    ("0 00 000 0a a0",),
]


def check(spark, dirs):
    bad = 0
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        for label, old_c, new_c in [
            ("tokens", tokens_old(F.col("text")), tokens_new(F.col("text"))),
            ("shingles3", shingles_old(F.col("text"), 3), shingles_new(F.col("text"), 3)),
            ("shingles5", shingles_old(F.col("text"), 5), shingles_new(F.col("text"), 5)),
        ]:
            n = docs.select(old_c.alias("o"), new_c.alias("n")).filter(
                ~F.col("o").eqNullSafe(F.col("n"))
            ).count()
            print(f"{d} {label}: mismatches={n}")
            bad += n
    adv = spark.createDataFrame(ADVERSARIAL, "text string")
    for label, old_c, new_c in [
        ("tokens", tokens_old(F.col("text")), tokens_new(F.col("text"))),
        ("shingles2", shingles_old(F.col("text"), 2), shingles_new(F.col("text"), 2)),
        ("shingles3", shingles_old(F.col("text"), 3), shingles_new(F.col("text"), 3)),
    ]:
        rows = adv.select("text", old_c.alias("o"), new_c.alias("n")).collect()
        for r in rows:
            if r.o != r.n:
                print(f"ADV MISMATCH {label}: {r.text!r}: {r.o} != {r.n}")
                bad += 1
    print("NULL-handling:", adv.filter(F.col("text").isNull()).select(
        tokens_old(F.col("text")).alias("o"), tokens_new(F.col("text")).alias("n")
    ).collect())
    print("TOTAL mismatches:", bad)
    return bad


def time_arms(spark, sf_dir, reps):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from chronobase_spark.catalog import spread

    def shingle_noop(sh_fn):
        def run():
            (
                spread(docs, key="doc_id")
                .select(F.col("doc_id").alias("doc"), sh_fn(F.col("text"), 3).alias("sh"))
                .filter(F.size("sh") > 0)
                .write.format("noop").mode("overwrite").save()
            )
        return run

    def tok_explode_noop(tok_fn):
        # simhash-ish consumer: explode tokens + hash + agg
        def run():
            (
                spread(docs, key="doc_id")
                .select(F.col("doc_id").alias("doc"), F.explode(tok_fn(F.col("text"))).alias("tok"))
                .groupBy("doc").agg(F.count(F.lit(1)).alias("n"), F.min(F.xxhash64("tok")).alias("h"))
                .write.format("noop").mode("overwrite").save()
            )
        return run

    arms = {
        "shingle_old": shingle_noop(shingles_old),
        "shingle_new": shingle_noop(shingles_new),
        "tok_old": tok_explode_noop(tokens_old),
        "tok_new": tok_explode_noop(tokens_new),
    }
    results = {k: [] for k in arms}
    # warm
    for k in arms:
        arms[k]()
        spark.catalog.clearCache()
    for r in range(reps):
        for k in arms:
            t0 = time.perf_counter()
            arms[k]()
            results[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for k, v in results.items():
        v = sorted(v)
        print(f"{k}: min={v[0]:.3f} med={v[len(v)//2]:.3f} all={[round(x,3) for x in v]}")


def main():
    mode = sys.argv[1]
    spark = get_spark(app_name="ab_tokens_r18", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "--check":
        rc = check(spark, sys.argv[2:])
        sys.exit(1 if rc else 0)
    else:
        time_arms(spark, sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 5)


if __name__ == "__main__":
    main()
