"""End-to-end streaming RECOVERY probe — the restart story composed.

scripts/restart_reattach_probe.py proves the model half: bucketed
admission tables re-attach in a fresh session via the on-disk manifest
(one DDL, no rebuild). This probe proves the rest of the production
recovery path: a streaming admission JOB that dies mid-stream resumes
from its CHECKPOINT in a new session, with the re-attached model as
its static side, and the combined sink is exactly what an uninterrupted
run would have produced:

  Session A: build the bucketed minhash admission model; drain arrival
             batch 1 (availableNow, its own flush row) into a sink with
             a checkpoint; stop() — catalog metadata dies, checkpoint +
             sink + model files + manifest survive.
  Session B: reattach_bucketed both model tables (NO rebuild — the
             probe asserts the tables are absent from the fresh catalog
             first); drop arrival batch 2 into the SAME source dir
             (later event times — the checkpointed watermark already
             passed batch 1's flush); resume the SAME checkpoint with
             availableNow. The file-source offset log makes the resumed
             query process ONLY the new files.
  Verdict: the union sink equals the batch admission expectation over
           BOTH arrival batches, and batch-1 rows were not re-emitted
           (exactly-once across the restart).

Emits one JSON line; tests/test_streaming.py runs it as a subprocess.

Usage:
    python scripts/restart_stream_recovery_probe.py [--rows 80]
        [--buckets 4] [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PREFIX = "probe_recovery_model"

# Batch-1 rows sit at T0; batch-1's flush pushes the watermark past
# T0's windows. Batch-2 rows must arrive ABOVE the checkpointed
# watermark or the resumed query would (correctly) late-drop them.
T0 = 1_700_000_000
FLUSH1 = T0 + 10_000_000
T1 = FLUSH1 + 10_000_000
FLUSH2 = T1 + 10_000_000


def _mk_arrivals(spark, docs_pd, ids, ts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [r for r in docs_pd if r["doc_id"] in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return df.withColumn("ingest_ts", F.timestamp_seconds(F.lit(ts)))


def _flush_row(spark, doc_id, ts):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(doc_id, "flush row", "xx", "synthetic", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(ts)))


def _drain(spark, src, sink, ckpt, bands, sh):
    from chronobase_spark.streaming import docs as docstream

    q = (
        docstream.minhash_admit_stage(
            docstream.read_document_stream(spark, src, max_files=8),
            bands,
            sh,
        )
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=80)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = args.cpus

    from chronobase_spark import catalog, get_spark
    from chronobase_spark.dedup import minhash
    from chronobase_spark.sources import writers

    root = tempfile.mkdtemp(prefix="recovery_")
    wh = f"{root}/wh"
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"
    conf = {"spark.sql.warehouse.dir": wh}

    # ---- Session A ----
    spark = get_spark(app_name="recovery-A", extra_conf=conf)
    docs = (
        catalog.table(spark, args.sf_dir, "documents")
        .filter("text IS NOT NULL")
        .limit(args.rows)
    )
    frozen_rows = docs.collect()
    all_ids = [r["doc_id"] for r in frozen_rows]
    half = len(all_ids) // 2
    b1_ids, b2_ids = set(all_ids[:half]), set(all_ids[half:])

    bands, sh = minhash.minhash_band_model_bucketed(
        docs, table_prefix=PREFIX, buckets=args.buckets
    )
    # expected: every arrival is a re-fetch of stored content with a
    # shifted id -> dup verdict, canonical = its stored copy (plus any
    # same-content partners; min of the set still includes the copy)
    arr_pd = [
        {
            "doc_id": r["doc_id"] + 900_000_000,
            "text": r["text"],
            "lang": r["lang"],
            "source": r["source"],
            "n_chars": r["n_chars"],
        }
        for r in frozen_rows
    ]
    b1 = _mk_arrivals(spark, arr_pd, {i + 900_000_000 for i in b1_ids}, T0)
    b1.unionByName(_flush_row(spark, 999_999_901, FLUSH1)).coalesce(2).write.parquet(src)
    _drain(spark, src, sink, ckpt, bands, sh)
    sink_after_a = {
        (r["doc_id"], r["dup_of_corpus"], r["canonical_id"])
        for r in spark.read.parquet(sink).collect()
    }
    spark.stop()

    # ---- Session B: fresh catalog, SAME checkpoint ----
    spark = get_spark(app_name="recovery-B", extra_conf=conf)
    assert not spark.catalog.tableExists(f"{PREFIX}_bands"), (
        "restart simulation failed: catalog survived"
    )
    t0 = time.perf_counter()
    bands = writers.reattach_bucketed(spark, f"{PREFIX}_bands")
    sh = writers.reattach_bucketed(spark, f"{PREFIX}_shingles")
    reattach_s = time.perf_counter() - t0
    b2 = _mk_arrivals(spark, arr_pd, {i + 900_000_000 for i in b2_ids}, T1)
    time.sleep(1.1)
    b2.unionByName(_flush_row(spark, 999_999_902, FLUSH2)).coalesce(2).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, sink, ckpt, bands, sh)
    final_rows = spark.read.parquet(sink).collect()
    final = {
        (r["doc_id"], r["dup_of_corpus"], r["canonical_id"])
        for r in final_rows
    }
    # physical row count, not the set: byte-identical re-emission of
    # batch-1 rows would dedup in the set and hide a reprocessing bug
    # (r16 review catch) — each arrival lives in exactly one window
    # here, so distinct verdicts == physical rows iff exactly-once held
    n_sink_rows = len(final_rows)
    spark.stop()

    b1_verdicts = {v for v in sink_after_a if v[0] != 999_999_901}
    new_verdicts = final - sink_after_a
    b2_expected_ids = {i + 900_000_000 for i in b2_ids}
    got_b2_ids = {v[0] for v in new_verdicts if v[0] != 999_999_901}

    # re-fetches must verdict dup-of-their-stored-copy in BOTH halves
    def _ok(verdicts, ids):
        by_id = {v[0]: (v[1], v[2]) for v in verdicts}
        return all(
            by_id.get(i + 900_000_000, (None, None))[0] is True
            and by_id[i + 900_000_000][1] is not None
            for i in ids
        )

    out = {
        "rows": args.rows,
        "reattach_s": round(reattach_s, 3),
        "b1_emitted_in_a": len(b1_verdicts),
        "b2_emitted_in_b": len(got_b2_ids),
        "b1_not_reemitted": b1_verdicts <= final
        and all(v[0] not in got_b2_ids for v in b1_verdicts)
        and n_sink_rows == len(final),
        "sink_rows": n_sink_rows,
        "b2_complete": got_b2_ids == b2_expected_ids,
        "b1_all_dup": _ok(b1_verdicts, b1_ids),
        "b2_all_dup": _ok(new_verdicts, b2_ids),
    }
    print(json.dumps(out))
    ok = (
        out["b1_emitted_in_a"] == len(b1_ids)
        and out["b2_complete"]
        and out["b1_not_reemitted"]
        and out["b1_all_dup"]
        and out["b2_all_dup"]
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
