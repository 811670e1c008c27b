"""r18 family O A/B: time the barrier/outer-explode-affected queries in
ONE process rooted at a given repo checkout (old = worktree at the
family-O parent commit, new = /root/repo), noop sink, clearCache
between. The driver script alternates old/new process invocations in
one time window (interleaved across processes — each rep pair is
adjacent in time, same ambient regime).

Usage: python ab_barrier_r18.py <repo_root> <sf_dir> <reps> <out.json>
"""

from __future__ import annotations

import json
import sys
import time

ROOT = sys.argv[1]
SF_DIR = sys.argv[2]
REPS = int(sys.argv[3])
OUT = sys.argv[4]

sys.path.insert(0, ROOT)

from chronobase_spark import get_spark  # noqa: E402
from chronobase_spark import queries as q  # noqa: E402

QUERIES = [
    "cdc_chunk_dedup",
    "cdc_incremental_ingest",
    "dedup_strategy_compare",
    "boilerplate_templates",
    "quality_signal_corr",
    "bigram_lm_logprob",
    "jm_trigram_logprob",
    "kn_bigram_logprob",
]


def main():
    spark = get_spark(
        app_name="ab_barrier_r18", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.queries()
    results: dict[str, list[float]] = {n: [] for n in QUERIES}

    def run_one(name: str) -> float:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.perf_counter()
        reg[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for name in QUERIES:  # warm, discard
        run_one(name)
    for _ in range(REPS):
        for name in QUERIES:
            results[name].append(run_one(name))
    with open(OUT, "w") as fh:
        json.dump(results, fh)
    print(json.dumps({k: round(min(v), 3) for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
