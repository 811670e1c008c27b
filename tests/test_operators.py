"""Operator-level unit tests: reference-pinned semantics (SURVEY.md §5.3)
and plan-shape assertions (the 100 TB posture — filters pushed to the
scan, broadcast joins actually broadcast).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark import catalog  # noqa: E402
from chronobase_spark.functions import multimodal, similarity, text  # noqa: E402
from chronobase_spark.operators import joins, timeseries  # noqa: E402
from chronobase_spark.plans import inspect  # noqa: E402
from tests.conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def events(spark):
    return catalog.table(spark, SF_SMOKE, "events").cache()


def test_time_range_bounds_inclusive(spark, events):
    """Reference semantics: BOTH bounds inclusive (tablet.go:366-367,382)."""
    row = events.orderBy("ts").first()
    exact = row["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
    got = timeseries.time_range_scan(events, exact, exact).collect()
    assert [r["event_id"] for r in got] == [row["event_id"]]


def test_ttl_filter_strictly_newer(spark, events):
    """Rows exactly at the cutoff are dropped; strictly newer kept
    (reference keeps ts > now-ttl, table.go:362)."""
    row = events.orderBy("ts").first()
    exact = row["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
    kept = timeseries.ttl_filter(events, exact)
    assert kept.filter(F.col("event_id") == row["event_id"]).count() == 0
    assert kept.count() == events.filter(F.col("ts") > F.lit(row["ts"])).count()


def test_scan_predicate_pushed_to_parquet(spark):
    """The ts BETWEEN predicate must reach the parquet reader as int64
    nanos range filters (PushedFilters) — this is the reference's
    tablet/block pruning (table.go:146-149) done by Catalyst, and the
    thing that makes the scan prune row groups at 100 TB."""
    spark.catalog.clearCache()  # cached fixtures would swap in InMemoryRelation
    ev = catalog.table(spark, SF_SMOKE, "events")
    df = timeseries.time_range_scan(ev, "2024-01-10 00:00:00", "2024-01-11 00:00:00")
    pushed = inspect.pushed_filters(df)
    assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must scan 2 columns, not 6 (ReadSchema)."""
    spark.catalog.clearCache()
    ev = catalog.table(spark, SF_SMOKE, "events")
    df = ev.select("event_id", "event_type")
    rs = inspect.read_schema(df)
    assert "event_id" in rs and "event_type" in rs
    assert "props" not in rs and "value" not in rs


def test_dim_join_is_broadcast(spark):
    """Star joins must broadcast the dimension, not shuffle the fact."""
    orders = catalog.table(spark, SF_SMOKE, "orders")
    customer = catalog.table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    df = joins.broadcast_dim_join(orders, [(customer, "o_custkey")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_asof_join_picks_latest_at_or_before(spark):
    data = [
        (1, "2024-01-01 10:00:00", "L1"),
        (1, "2024-01-01 12:00:00", "L2"),
        (2, "2024-01-01 10:00:00", "L3"),
    ]
    left = spark.createDataFrame(data, ["k", "t", "tag"]).withColumn(
        "t", F.to_timestamp("t")
    )
    rdata = [
        (1, "2024-01-01 09:00:00", 100.0),
        (1, "2024-01-01 12:00:00", 200.0),  # exactly at L2's ts => matched
        (2, "2024-01-01 11:00:00", 300.0),  # after L3 => no match
    ]
    right = spark.createDataFrame(rdata, ["k", "t", "state"]).withColumn(
        "t", F.to_timestamp("t")
    )
    out = joins.asof_join(
        left, right, left_on="k", right_on="k", left_ts="t", right_ts="t",
        right_cols=["state"],
    )
    got = {r["tag"]: r["state"] for r in out.collect()}
    assert got == {"L1": 100.0, "L2": 200.0, "L3": None}


def test_range_join_matches_naive(spark, events):
    """Bucketed range join ≡ naive theta join on a small sample."""
    ev = events.limit(300)
    left = ev.select(F.col("event_id").alias("ea"), F.col("ts").alias("tsa"), "user_id")
    right = ev.select(F.col("event_id").alias("eb"), F.col("ts").alias("tsb"), "user_id")
    fast = {
        (r["ea"], r["eb"])
        for r in joins.range_join_bucketed(
            left, right, "tsa", "tsb", 3600, ["user_id"]
        )
        .filter(F.col("ea") != F.col("eb"))
        .collect()
    }
    naive = {
        (r["ea"], r["eb"])
        for r in left.join(right, "user_id")
        .filter(
            (F.col("ea") != F.col("eb"))
            & (F.unix_timestamp("tsb") - F.unix_timestamp("tsa")).between(0, 3600)
        )
        .collect()
    }
    assert fast == naive


def test_topk_cosine_self_similarity_excluded(spark):
    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") == 0)
    out = similarity.topk_cosine(probes, emb, k=5).collect()
    assert len(out) == 5
    assert all(r["n_id"] != 0 for r in out)
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_multimodal_decode_stub_pipeline(spark):
    """Binary payload → mapInPandas feature extraction: schema, batch
    shape, and determinism of the stubbed decode."""
    docs = catalog.table(spark, SF_SMOKE, "documents").limit(50)
    payloads = multimodal.to_payload(docs)
    feats = multimodal.decode_stub(payloads)
    rows = feats.collect()
    assert len(rows) == 50
    assert set(feats.columns) == {"doc_id", "media_type", "n_bytes", "n_frames", "checksum"}
    assert all(r["n_bytes"] > 0 and r["n_frames"] >= 1 for r in rows)
    again = {r["doc_id"]: r["checksum"] for r in multimodal.decode_stub(payloads).collect()}
    assert {r["doc_id"]: r["checksum"] for r in rows} == again


def test_ppm_parser_known_pixels():
    """_parse_ppm / _decode_ppm_bytes against a hand-written 2×2 P6
    file with known pixel values — including a header comment and a
    multi-digit maxval, the spec corners a fixed-offset reader gets
    wrong."""
    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    buf = b"P6\n# fixture comment\n2 2\n255\n" + raster
    w, h, maxval, got = multimodal._parse_ppm(buf)
    assert (w, h, maxval) == (2, 2, 255)
    assert got == raster
    feats = multimodal._decode_ppm_bytes(buf)
    assert feats == {
        "width": 2,
        "height": 2,
        "r_sum": 255 + 0 + 0 + 10,
        "g_sum": 0 + 255 + 0 + 20,
        "b_sum": 0 + 0 + 255 + 30,
    }


def test_ppm_roundtrip_real_decode(spark):
    """to_ppm_payload builds spec-valid P6 files JVM-side; decode_ppm
    recovers the exact bytes: channel sums must equal a pure-Python
    fold over each document's UTF-8 bytes (padding is zero)."""
    docs = catalog.table(spark, SF_SMOKE, "documents").limit(25)
    payloads = multimodal.to_ppm_payload(docs)
    # every payload is independently parseable by the strict parser
    for r in payloads.collect():
        w, h, maxval, raster = multimodal._parse_ppm(bytes(r["payload"]))
        assert (w, maxval) == (16, 255) and len(raster) == 48 * h
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))
    got = {r["doc_id"]: r for r in multimodal.decode_ppm(payloads).collect()}
    for doc in docs.select("doc_id", "text").collect():
        b = doc["text"].encode("utf-8")
        want = [sum(b[c::3]) for c in range(3)]
        row = got[doc["doc_id"]]
        assert [row["r_sum"], row["g_sum"], row["b_sum"]] == want
        assert row["height"] == max(-(-len(b) // 48), 1)
        assert row["media_type"] == "image/x-portable-pixmap"


def test_frame_sample_fanout(spark):
    docs = catalog.table(spark, SF_SMOKE, "documents").limit(10)
    payloads = multimodal.to_payload(docs)
    frames = multimodal.frame_sample(payloads, every_n_bytes=100)
    per_doc = frames.groupBy("doc_id").count().collect()
    truth = {r["doc_id"]: r["n_bytes"] // 100 + 1 for r in payloads.select("doc_id", "meta.n_bytes").collect()}
    assert {r["doc_id"]: r["count"] for r in per_doc} == truth


def test_stratified_sample_rates(spark):
    """The deterministic md5-threshold sampler must hit each stratum at
    roughly its requested fraction, never emit a stratum outside the
    spec, and return the exact same membership on a rerun (the property
    sampleBy's seeded Bernoulli lacks across partition layouts)."""
    from chronobase_spark.functions import packing

    docs = catalog.table(spark, SF_SMOKE, "documents")
    frac = {"en": 0.5, "zh": 0.1}
    keep = packing.md5_stratified_keep(F.col("doc_id"), F.col("lang"), frac)
    got = docs.filter(keep)
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sampled) <= set(frac)
    for lang, f in frac.items():
        rate = sampled.get(lang, 0) / totals[lang]
        assert abs(rate - f) < 0.15, (lang, rate)
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    again = sorted(
        r["doc_id"]
        for r in docs.repartition(7).filter(keep).select("doc_id").collect()
    )
    assert ids == again


def test_stratified_sample_full_fraction_keeps_all(spark):
    """frac >= 1.0 must keep every row of the stratum ('g' sentinel
    sorts after all hex buckets; a naive 5-char '10000' threshold would
    sort before 'ffff' and drop nearly everything)."""
    from chronobase_spark.functions import packing

    docs = catalog.table(spark, SF_SMOKE, "documents")
    keep = packing.md5_stratified_keep(
        F.col("doc_id"), F.col("lang"), {"en": 1.0}
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    assert docs.filter(keep).count() == n_en


def test_latest_per_key_is_argmax(spark, events):
    """latest_per_key returns exactly one row per key, and it is the
    (ts, event_id)-max row of that key."""
    got = timeseries.latest_per_key(events, "user_id", "ts", "event_id")
    rows = {r["user_id"]: (r["ts"], r["event_id"]) for r in got.collect()}
    naive = (
        events.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id")).alias("m"))
        .collect()
    )
    assert rows == {r["user_id"]: (r["m"]["ts"], r["m"]["event_id"]) for r in naive}
    assert got.groupBy("user_id").count().filter("count > 1").count() == 0


def test_approx_percentiles_rank_error_bounded(spark):
    """approx_percentile's contract is bounded RANK error (≤ 1/accuracy),
    not value error: the returned value's quantile position must sit
    within ε of the requested p (plus 1/n granularity on small groups)."""
    from chronobase_spark import queries as q

    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in q.queries()["approx_value_percentiles"](spark, SF_SMOKE).collect()
    }
    ev = catalog.table(spark, SF_SMOKE, "events")
    rows = ev.select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["event_type"], []).append(r["value"])
    for vals in groups.values():
        vals.sort()
    assert set(approx) == set(groups)
    for et, vals in groups.items():
        n = len(vals)
        for p, a in zip((0.5, 0.9, 0.99), approx[et]):
            frac = sum(1 for v in vals if v <= a) / n
            assert frac >= p - 0.0001 - 1 / n, (et, p, a, frac)
            assert sum(1 for v in vals if v < a) / n <= p + 0.0001 + 1 / n, (et, p, a)


def test_mad_approx_agrees_with_exact(spark):
    """The approx-MAD twin must track the exact query: identical group
    keys and counts, medians within one inter-element gap of the exact
    interpolated median (approx_percentile returns an actual order
    statistic; exact p=0.5 interpolates between the two middle ones),
    and fence counts within the handful of points that sit between the
    two fences."""
    from chronobase_spark import queries as q

    exact = {
        r["event_type"]: r
        for r in q.queries()["mad_outliers_by_type"](spark, SF_SMOKE).collect()
    }
    approx = {
        r["event_type"]: r
        for r in q.queries()["mad_outliers_approx"](spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(approx)
    ev = catalog.table(spark, SF_SMOKE, "events").filter(F.col("value").isNotNull())
    xs: dict[str, list[int]] = {}
    for r in ev.select("event_type", F.round(F.col("value") * 1000000.0, 0)
                       .cast("bigint").alias("x")).collect():
        xs.setdefault(r["event_type"], []).append(r["x"])
    for et, ex in exact.items():
        ap = approx[et]
        assert ap["n"] == ex["n"]
        # approx median is a real element adjacent to the interpolated
        # exact median: bound |Δ| by the gap between the two middle
        # order statistics of that group
        vals = sorted(xs[et])
        lo, hi = vals[(len(vals) - 1) // 2], vals[len(vals) // 2]
        assert lo <= ap["med_micro"] <= hi, (et, ap["med_micro"], lo, hi)
        assert ap["mad_micro"] > 0
        # fences differ by at most the median shift; count drift stays
        # a small fraction of the group
        assert abs(ap["n_outliers"] - ex["n_outliers"]) <= max(3, ex["n"] // 50), (
            et, ap["n_outliers"], ex["n_outliers"],
        )


def test_session_window_native_matches_islands_twin(spark):
    """The native session_window batch query and the gaps-and-islands
    twin implement ONE semantics: per-user session count and total
    event count must be identical, and each native session must span
    exactly gap-joined events (end = last event + 30 min)."""
    from chronobase_spark import queries as q

    native = q.queries()["user_sessions_native"](spark, SF_SMOKE).collect()
    islands = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q.queries()["user_sessions"](spark, SF_SMOKE).collect()
    }
    per_user: dict[int, list] = {}
    for r in native:
        per_user.setdefault(r["user_id"], []).append(r)
        assert r["session_end_us"] - r["session_start_us"] >= 1_800_000_000
    assert set(per_user) == set(islands)
    for uid, sess in per_user.items():
        assert (len(sess), sum(s["n_events"] for s in sess)) == islands[uid], uid
        # sessions are disjoint with >30-min gaps between them
        spans = sorted((s["session_start_us"], s["session_end_us"]) for s in sess)
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 > e1, (uid, spans)


def test_source_unigram_kl_properties(spark):
    """Gibbs' inequality: KL(P_source || P_corpus) >= 0, up to the
    documented micro-nat quantization (each term rounds within 0.5e-6
    nats); source token totals must sum to the corpus total."""
    from chronobase_spark import queries as q

    rows = q.queries()["source_unigram_kl"](spark, SF_SMOKE).collect()
    assert rows
    docs = catalog.table(spark, SF_SMOKE, "documents").filter(
        F.col("text").isNotNull()
    )
    from chronobase_spark.functions import text as textfn

    corpus_total = docs.select(
        F.explode(textfn.tokens(F.col("text"))).alias("t")
    ).count()
    assert sum(r["n_tokens"] for r in rows) == corpus_total
    for r in rows:
        assert r["kl_nats"] >= -1e-6, (r["source"], r["kl_nats"])
        assert abs(
            r["kl_nats"] - r["kl_micro_sum"] / (r["n_tokens"] * 1e6)
        ) < 1e-12


def test_benford_first_digit_properties(spark):
    """Digits land in 1..9, per-type shares sum to 1, per-type counts
    cover every positive micro-quantized value, and the emitted
    probabilities are exactly the injected log10(1+1/d) literals."""
    import math

    from chronobase_spark import queries as q

    rows = q.queries()["benford_first_digit"](spark, SF_SMOKE).collect()
    assert rows
    per_type: dict[str, list] = {}
    for r in rows:
        assert 1 <= r["digit"] <= 9
        assert r["benford_p"] == math.log10(1.0 + 1.0 / r["digit"])
        assert abs(r["excess"] - (r["share"] - r["benford_p"])) < 1e-15
        per_type.setdefault(r["event_type"], []).append(r)
    ev = catalog.table(spark, SF_SMOKE, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    n_pos = {
        r["event_type"]: r["n"]
        for r in ev.select(
            "event_type",
            F.round(F.col("value") * 1000000.0, 0).cast("bigint").alias("x"),
        )
        .filter(F.col("x") > 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for et, rs in per_type.items():
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-9, et
        assert sum(r["n_events"] for r in rs) == n_pos[et], et


def test_kn_bigram_agrees_with_addone_on_grams(spark):
    """Kneser-Ney and add-one score the SAME gram stream (shared
    _doc_bigram_tf): identical doc coverage and per-doc gram counts;
    KN is a proper distribution over seen continuations, so every
    per-doc log-probability is strictly negative; and the continuation
    term must actually change scores (KN != add-one somewhere)."""
    from chronobase_spark import queries as q

    kn = {
        r["doc_id"]: r
        for r in q.queries()["kn_bigram_logprob"](spark, SF_SMOKE).collect()
    }
    addone = {
        r["doc_id"]: r
        for r in q.queries()["bigram_lm_logprob"](spark, SF_SMOKE).collect()
    }
    assert set(kn) == set(addone)
    for did, r in kn.items():
        assert r["n_grams"] == addone[did]["n_grams"], did
        assert r["kn_logprob_micro"] < 0, did
    assert any(
        kn[d]["kn_logprob_micro"] != addone[d]["logprob_micro"] for d in kn
    )


def test_asof_join_pandas_matches_window_impl(spark, events):
    """The cogrouped merge_asof implementation must produce exactly the
    union+window asof_join result (same '<=' backward semantics)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("value").alias("err_value")
    )
    a = joins.asof_join(
        clicks, errors, "user_id", "user_id", "ts", "err_ts", ["err_value"]
    ).select("user_id", "event_id", "err_value")
    b = joins.asof_join_pandas(
        clicks, errors, "user_id", "ts", "err_ts", ["err_value"]
    ).select("user_id", "event_id", "err_value")
    ka = {(r["user_id"], r["event_id"]): r["err_value"] for r in a.collect()}
    kb = {(r["user_id"], r["event_id"]): r["err_value"] for r in b.collect()}
    assert ka == kb and ka


def test_multimodal_resize_stub_composes(spark):
    """resize_stub keeps the multimodal row shape (so it composes with
    decode_stub) and downsamples payload bytes deterministically."""
    docs = catalog.table(spark, SF_SMOKE, "documents").limit(20)
    payloads = multimodal.to_payload(docs)
    resized = multimodal.resize_stub(payloads, scale_denom=4)
    rows = {r["doc_id"]: r for r in resized.collect()}
    for r in payloads.collect():
        want = bytes(bytes(r["payload"])[::4])
        got = bytes(rows[r["doc_id"]]["payload"])
        assert got == want
        assert rows[r["doc_id"]]["meta"]["n_bytes"] == len(want)
    feats = multimodal.decode_stub(resized)
    assert feats.count() == 20


def test_gap_fill_locf_spine_and_carry(spark):
    """Gap fill: the spine is hourly-contiguous per key, empty buckets
    have n_events=0, and LOCF carries the previous observed aggregate
    into them (null only before the first observation)."""
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 03:20:00", 5.0),  # hours 1-2 are gaps
            ("b", "2024-01-01 01:00:00", 2.0),
        ],
        "key string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = timeseries.gap_fill_locf(df, "key").orderBy("key", "bucket_ts")
    rows = out.collect()
    a = [r for r in rows if r.key == "a"]
    assert [r.bucket_ts.hour for r in a] == [0, 1, 2, 3]
    assert [r.n_events for r in a] == [1, 0, 0, 1]
    assert [r.avg_value_locf for r in a] == [1.0, 1.0, 1.0, 5.0]
    b = [r for r in rows if r.key == "b"]
    assert len(b) == 1 and b[0].n_events == 1 and b[0].avg_value_locf == 2.0


def test_value_trend_recovers_exact_line(spark):
    """OLS trend on a perfect line y = 2·t + 3 (t in seconds from the
    2024-01-01 origin) must recover slope 2e6 µ-units/s and intercept
    3e6 µ-units exactly — the moment sums are integer-exact and the
    closed form divides once."""
    from chronobase_spark import queries as q

    rows = [(i, f"2024-01-01 00:00:{s:02d}", 2.0 * s + 3.0)
            for i, s in enumerate(range(0, 50, 7))]
    df = spark.createDataFrame(
        [("lin", i, ts, v) for i, ts, v in rows],
        "event_type string, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    import unittest.mock as mock

    with mock.patch.object(q, "_t", return_value=df):
        out = q.q_value_trend_by_type(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == len(rows)
    assert r["slope_uv_per_s"] == 2_000_000.0
    assert r["intercept_uv"] == 3_000_000.0


def test_ltob_downsample_picks_largest_triangle(spark):
    """LTOB: interior buckets only; the representative is the point
    with the largest triangle area against the neighbor-bucket means
    (the y=5.0 spike beats the flat points); identical points tie and
    fall back to the lowest id."""
    rows = [
        # prev bucket (hour 10): mean y = 0
        (1, "2024-01-01 10:10:00", 0.0),
        (2, "2024-01-01 10:50:00", 0.0),
        # interior bucket (hour 11): spike at id 4
        (3, "2024-01-01 11:00:00", 0.0),
        (4, "2024-01-01 11:30:00", 5.0),
        (5, "2024-01-01 11:59:00", 0.1),
        # tied interior bucket (hour 12): identical points -> lowest id
        (6, "2024-01-01 12:10:00", 0.0),
        (7, "2024-01-01 12:10:00", 0.0),
        # last bucket (hour 13): no next neighbor, not emitted
        (8, "2024-01-01 13:20:00", 9.0),
    ]
    df = spark.createDataFrame(
        [("a", i, ts, v) for i, ts, v in rows],
        "event_type string, event_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["bucket_ts"].hour: r
        for r in timeseries.ltob_downsample(df).collect()
    }
    assert sorted(out) == [11, 12]  # interior buckets only
    assert out[11]["event_id"] == 4 and out[11]["value"] == 5.0
    assert out[12]["event_id"] == 6  # tie -> lowest id


def test_gap_fill_decimal_quantization_contract(spark):
    """The documented precision contract: the bucket average sums value
    as value_decimal (default DECIMAL(18,2)), quantizing finer inputs
    half-up per value BEFORE the sum; widening the scale preserves
    them. 0.125/0.375 are exact in binary, so the cast is unambiguous:
    2-dp → (0.13+0.38)/2 = 0.255; 3-dp → (0.125+0.375)/2 = 0.25."""
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 0.125), ("a", "2024-01-01 00:20:00", 0.375)],
        "key string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got2 = timeseries.gap_fill_locf(df, "key").collect()
    assert len(got2) == 1 and got2[0].avg_value_locf == 0.255
    got3 = timeseries.gap_fill_locf(df, "key", value_decimal="decimal(18,3)").collect()
    assert len(got3) == 1 and got3[0].avg_value_locf == 0.25
    gi = timeseries.gap_fill_interp(
        df, "key", value_decimal="decimal(18,3)"
    ).collect()
    assert len(gi) == 1 and gi[0].avg_value_interp == 0.25


def test_gap_fill_interp_linear_between_neighbors(spark):
    """Interpolation gap fill: empty buckets get the linear blend of the
    neighboring observed buckets (1.0 at hour 0, 7.0 at hour 3 → 3.0 and
    5.0 at hours 1-2); observed buckets keep their own aggregate; a
    single-bucket key interpolates to itself."""
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 03:20:00", 7.0),  # hours 1-2 are gaps
            ("b", "2024-01-01 01:00:00", 2.0),
        ],
        "key string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = timeseries.gap_fill_interp(df, "key").orderBy("key", "bucket_ts")
    rows = out.collect()
    a = [r for r in rows if r.key == "a"]
    assert [r.bucket_ts.hour for r in a] == [0, 1, 2, 3]
    assert [r.avg_value_interp for r in a] == [1.0, 3.0, 5.0, 7.0]
    b = [r for r in rows if r.key == "b"]
    assert len(b) == 1 and b[0].avg_value_interp == 2.0


def test_counter_rate_resets_and_gaps(spark):
    """Counter rate: positive delta → increase=delta, rate=delta/gap;
    negative delta → counter reset, increase=raw value; first sample per
    key → NULLs; same-second successor → increase set, rate NULL."""
    from chronobase_spark.operators import windows as W

    df = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 00:00:00", 10.0),
            (2, "u1", "2024-01-01 00:00:10", 14.0),  # +4 over 10s
            (3, "u1", "2024-01-01 00:00:20", 3.0),   # reset → increase=3
            (4, "u1", "2024-01-01 00:00:20", 5.0),   # same second → rate NULL
            (5, "u2", "2024-01-01 00:00:00", 9.0),
        ],
        "event_id long, user_id string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = W.counter_rate(df, "user_id")
    got = {r.event_id: (r.increase, r.rate_per_s) for r in out.collect()}
    assert got[1] == (None, None)
    assert got[2] == (4.0, 0.4)
    assert got[3] == (3.0, 0.3)
    assert got[4] == (2.0, None)
    assert got[5] == (None, None)


def test_inverted_index_bounded_postings(spark):
    """Inverted index: df counts every posting while the posting list
    keeps only the max_postings lowest doc ids, sorted; per-doc term
    dedup means a repeated word in one doc posts once."""
    docs = spark.createDataFrame(
        [
            (3, "alpha beta alpha"),
            (1, "alpha gamma"),
            (2, "alpha delta"),
        ],
        "doc_id long, text string",
    )
    idx = {r.term: r for r in text.inverted_index(docs, max_postings=2).collect()}
    assert idx["alpha"].df == 3
    assert idx["alpha"].postings == [1, 2]  # capped at 2 lowest, sorted
    assert idx["beta"].df == 1 and idx["beta"].postings == [3]
    assert idx["gamma"].postings == [1]


def test_sketch_rollup_estimates_within_bound(spark):
    """HLL sketch rollup: per-day estimates and the sketch-union total
    must land within 5% of exact distinct counts (default lgConfigK=12
    gives ~1.6% standard error), and the union must NOT be the sum of
    dailies (users recur across days)."""
    import chronobase_spark.queries as q

    sf = "/root/testdata/sf0.001"
    est = {
        r["bucket"]: r["est_users"]
        for r in q._REGISTRY["sketch_rollup_users"][0](spark, sf).collect()
    }
    ev = catalog.table(spark, sf, "events")
    import pyspark.sql.functions as F

    exact = {
        r["bucket"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bucket")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["total"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, v in exact.items():
        assert abs(est[k] - v) / v <= 0.05, (k, est[k], v)
    assert est["total"] < sum(v for k, v in est.items() if k != "total")
    # the registered EXACT twin (distinct_rollup_users) must agree with
    # the inline exact computation bit-for-bit AND sit inside the same
    # sketch bound — the family convention that pairs every rows-only
    # sketch query with a hash-checkable exact counterpart
    twin = {
        r["bucket"]: r["n_users"]
        for r in q._REGISTRY["distinct_rollup_users"][0](spark, sf).collect()
    }
    assert twin == exact
    for k, v in twin.items():
        assert abs(est[k] - v) / v <= 0.05, (k, est[k], v)


def test_pattern_triple_contiguity_and_span(spark):
    """Pattern matching: contiguity is relative to the pattern-filtered
    stream (an interleaved 'error' row does not break a run), the span
    bound excludes slow runs, and overlapping matches are all
    reported."""
    from chronobase_spark.operators import windows as W

    rows = [
        # u1: view(1) click(2) purchase(3) inside an hour, with an
        # ignored 'error' row interleaved -> match
        (1, 1, "2024-01-01 10:00:00", "view"),
        (1, 99, "2024-01-01 10:05:00", "error"),
        (1, 2, "2024-01-01 10:10:00", "click"),
        (1, 3, "2024-01-01 10:20:00", "purchase"),
        # u2: pattern spelled but span > 1h -> no match
        (2, 4, "2024-01-01 10:00:00", "view"),
        (2, 5, "2024-01-01 10:10:00", "click"),
        (2, 6, "2024-01-01 11:30:00", "purchase"),
        # u3: view view click purchase -> only the SECOND view starts a
        # contiguous match (the first view's next rows are view, click)
        (3, 7, "2024-01-01 09:00:00", "view"),
        (3, 8, "2024-01-01 09:10:00", "view"),
        (3, 9, "2024-01-01 09:20:00", "click"),
        (3, 10, "2024-01-01 09:30:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.user_id, r.k_start, r.k_mid, r.k_end)
        for r in W.pattern_triple(
            df, "user_id", ("view", "click", "purchase"), within_seconds=3600
        ).collect()
    }
    assert got == {(1, 1, 2, 3), (3, 8, 9, 10)}


def test_pack_offsets_concat_and_chunk_invariants(spark):
    """Packing: per-shard offsets are an exact prefix sum in doc order,
    pack coordinates follow from integer division, and a doc crossing a
    context boundary reports every pack it touches."""
    from chronobase_spark.functions.packing import pack_offsets

    rows = [  # (doc_id, shard, n_tokens) with ctx=10
        (0, 0, 4),   # [0,4)   pack 0
        (2, 0, 7),   # [4,11)  packs 0-1 (crosses)
        (4, 0, 9),   # [11,20) pack 1
        (6, 0, 21),  # [20,41) packs 2-4 (spans 3)
        (1, 1, 10),  # [0,10)  exactly pack 0, does not touch pack 1
        (3, 1, 1),   # [10,11) pack 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
    got = {
        r.doc_id: (r.start_off, r.pack_id, r.packs_spanned)
        for r in pack_offsets(df, context_len=10).collect()
    }
    assert got == {
        0: (0, 0, 1),
        2: (4, 0, 2),
        4: (11, 1, 1),
        6: (20, 2, 3),
        1: (0, 0, 1),
        3: (10, 1, 1),
    }


def test_md5_split_deterministic_and_content_free(spark):
    """Split assignment depends only on the id: identical across runs
    and unaffected by which other rows are present; all three labels
    appear at reasonable rates over a modest id range."""
    from chronobase_spark.functions.packing import md5_split

    ids = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.s for r in ids.select("doc_id", md5_split(F.col("doc_id")).alias("s")).collect()}
    subset = ids.filter(F.col("doc_id") % 3 == 0)
    b = {r.doc_id: r.s for r in subset.select("doc_id", md5_split(F.col("doc_id")).alias("s")).collect()}
    assert all(a[k] == v for k, v in b.items())
    from collections import Counter
    c = Counter(a.values())
    # expected 75% / 12.5% / 12.5%; allow generous tolerance at n=2000
    assert 0.70 < c["train"] / 2000 < 0.80
    assert 0.09 < c["val"] / 2000 < 0.17
    assert 0.09 < c["test"] / 2000 < 0.17


def test_int8_quant_saturation_and_zero_vector(spark):
    """Quantization: max-|v| element maps to ±127 exactly, a zero vector
    quantizes to all-zero codes with scale 0, and saturation counts
    every element at full scale."""
    from chronobase_spark.functions.similarity import int8_quant_stats

    rows = [
        (1, [2.54, -1.27, 0.0]),   # scale 0.02: codes 127, -64 (floor(-63.5)), 0
        (2, [0.0, 0.0, 0.0]),      # zero vector
        (3, [-5.0, 5.0, 5.0]),     # symmetric full-scale: all saturate
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.s.q_min, r.s.q_max, r.s.n_sat, r.s.q_sum, r.s.qscale)
        for r in df.select(
            "vec_id", int8_quant_stats(F.col("embedding")).alias("s")
        ).collect()
    }
    assert got[1] == (-63, 127, 1, 64, 0.02)
    assert got[2] == (0, 0, 0, 0, 0.0)
    assert got[3] == (-127, 127, 3, 127, round(5.0 / 127, 6))


def test_pq_assign_rejects_indivisible_dim(spark):
    """A vector dim not divisible by m must fail loudly (the silent
    alternative: truncated slices, NULL-padded zip_with distances, and
    quietly dropped argmin rows)."""
    import pytest

    bad = spark.createDataFrame(
        [(1, 0, [0.1] * 10)], "vec_id long, label int, embedding array<float>"
    )
    with pytest.raises(Exception, match="not divisible"):
        similarity.pq_assign(bad, m=8).collect()


def test_pq_assign_shape_and_semantics(spark):
    """pq_assign: every vector gets exactly m codes; each assigned code
    truly minimizes the integer subspace distance against a brute-force
    recomputation (with code-id tie-break); rerun is identical."""
    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    m = 8
    out = similarity.pq_assign(emb, m=m).collect()
    n_vecs = emb.count()
    assert len(out) == n_vecs * m
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["code"] for r in out} <= labels

    # brute-force verify on a handful of vectors
    rows = {r["vec_id"]: list(r["embedding"]) for r in emb.limit(5).collect()}
    import collections

    def micro(x):
        from decimal import Decimal, ROUND_HALF_UP
        return int(
            Decimal(repr(float(x) * 1000000.0)).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    # rebuild codebook the documented way: per (subspace, label, pos)
    # round-half-up integer mean of micro components
    sums = collections.defaultdict(lambda: [0, 0])
    for r in emb.collect():
        v = list(r["embedding"])
        for s in range(m):
            for p in range(8):
                key = (s, r["label"], p)
                sums[key][0] += micro(v[s * 8 + p])
                sums[key][1] += 1
    book = {}
    for (s, code, p), (tot, n) in sums.items():
        book.setdefault((s, code), [0] * 8)[p] = (2 * tot + n) // (2 * n)
    got = {(r["vec_id"], r["subspace"]): (r["code"], r["dist_u2"]) for r in out}
    for vid, vec in rows.items():
        for s in range(m):
            sub_u = [micro(vec[s * 8 + p]) for p in range(8)]
            best = min(
                (
                    (sum((a - b) ** 2 for a, b in zip(sub_u, cvec)), code)
                    for (ss, code), cvec in book.items()
                    if ss == s
                ),
            )
            assert got[(vid, s)] == (best[1], best[0]), (vid, s)


def test_kmeans_lloyd_matches_textbook(spark):
    """kmeans_lloyd pinned against a straight-line Python Lloyd's
    implementation stating the SAME deterministic arithmetic (seed ids
    < k, float64 sequential-fold distance rounded half-up at 6 dp with
    label tie-break, micro-integer exact centroid mean) — proving the
    distributed composition against the algorithm, not against itself."""
    from decimal import ROUND_HALF_UP, Decimal

    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    k = 4
    got = {
        r["vec_id"]: (r["assigned"], r["dist"])
        for r in similarity.kmeans_lloyd(emb, k=k, iters=2).collect()
    }

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("embedding").isNotNull()).collect()
    }

    def micro(x):
        # multiply-then-round half-up on the shortest decimal string =
        # Spark round() on DoubleType (BigDecimal.valueOf semantics)
        return int(
            Decimal(repr(x * 1000000.0)).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    def r6(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    def sqdist(v, c):
        acc = 0.0
        for a, b in zip(v, c):
            acc += (a - b) * (a - b)
        return acc

    def assign(cents):
        out = {}
        for vid, v in vecs.items():
            out[vid] = min(
                (r6(sqdist(v, c)), lbl) for lbl, c in cents.items()
            )
        return out  # vid -> (dist, label)

    cents = {vid: vecs[vid] for vid in vecs if vid < k}
    a1 = assign(cents)
    dim = len(next(iter(vecs.values())))
    sums, counts = {}, {}
    for vid, (_, lbl) in a1.items():
        counts[lbl] = counts.get(lbl, 0) + 1
        s = sums.setdefault(lbl, [0] * dim)
        for i, x in enumerate(vecs[vid]):
            s[i] += micro(x)
    cents = {
        lbl: [s[i] / (counts[lbl] * 1000000.0) for i in range(dim)]
        for lbl, s in sums.items()
    }
    a2 = assign(cents)

    assert set(got) == set(a2)
    for vid, (dist, lbl) in a2.items():
        assert got[vid] == (lbl, dist), (vid, got[vid], (lbl, dist))


def test_char_entropy_known_distributions(spark):
    """Entropy micro-nats pinned against closed-form values: uniform
    over k symbols = ln(k); constant string = 0; NULL/empty -> NULL."""
    import math

    rows = [
        (1, "aaaa"),          # 0
        (2, "abab"),          # ln 2
        (3, "aabbbbcc"),      # 2.0794... - see below
        (4, ""),              # NULL (no chars)
        (5, None),            # NULL propagates
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["ent"]
        for r in df.select(
            "doc_id", text.char_entropy(F.col("text")).alias("ent")
        ).collect()
    }

    def ent(s):
        n = len(s)
        counts = [s.count(c) for c in sorted(set(s))]
        return (math.log(n) - sum(c * math.log(c) for c in counts) / n) * 1e6

    assert got[1] == 0
    assert abs(got[2] - ent("abab")) <= 1
    assert abs(got[3] - ent("aabbbbcc")) <= 1
    assert got[4] is None and got[5] is None


def test_bm25_scores_match_closed_form(spark):
    """BM25 micro scores pinned against the textbook formula computed
    in Python on a 3-doc corpus (k1=1.2, b=0.75, Lucene idf)."""
    import math

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry apple"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["score_micro"])
        for r in text.bm25_scores(df).collect()
    }
    n_docs, avgdl = 3, 3.0
    tf_map = {
        (1, "apple"): (2, 3), (1, "banana"): (1, 3),
        (2, "banana"): (1, 2), (2, "cherry"): (1, 2),
        (3, "cherry"): (3, 4), (3, "apple"): (1, 4),
    }
    dfreq = {"apple": 2, "banana": 2, "cherry": 2}
    for (doc, term), (tf, dl) in tf_map.items():
        idf = math.log(1.0 + (n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        want = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6
        tf_got, micro_got = got[(doc, term)]
        assert tf_got == tf
        assert abs(micro_got - want) <= 1, (doc, term, micro_got, want)
    assert len(got) == len(tf_map)


def test_rrf_fusion_consistent_with_ranks(spark):
    """Fused RRF scores must be exactly 1/(60+r_lex) + 1/(60+r_vec)
    over the per-side ranks, bounded by per_side, ordered descending."""
    from chronobase_spark.functions import retrieval

    docs = catalog.table(spark, SF_SMOKE, "documents")
    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    rows = retrieval.rrf_hybrid_topk(
        docs, emb, query_terms=("spark", "vector", "customer"), k=20
    ).collect()
    assert 0 < len(rows) <= 20
    micros = [r["rrf_micro"] for r in rows]
    assert micros == sorted(micros, reverse=True)
    for r in rows:
        assert r["r_lex"] is not None or r["r_vec"] is not None
        want = 0.0
        if r["r_lex"] is not None:
            assert 1 <= r["r_lex"] <= 50
            want += 1.0 / (60 + r["r_lex"])
        if r["r_vec"] is not None:
            assert 1 <= r["r_vec"] <= 50
            want += 1.0 / (60 + r["r_vec"])
        assert abs(r["rrf_micro"] - want * 1e6) <= 1, r


def test_cms_never_undercounts_and_state_is_bounded(spark, events):
    """The count-min guarantee: est >= exact for EVERY key (counters
    only over-count via collisions), and the sketch is <= depth*width
    rows no matter the input size."""
    from chronobase_spark.functions import sketches

    # NULL keys are excluded by contract: they must neither leak extra
    # (seed, NULL) counter rows past the state bound nor produce a
    # bogus est=0 probe row (cms_build/cms_estimate docstrings)
    with_null = events.select("user_id").unionAll(
        events.sparkSession.sql("SELECT CAST(NULL AS BIGINT) AS user_id")
    )
    counters = sketches.cms_build(with_null, "user_id", depth=4, width=512)
    assert counters.count() <= 4 * 512
    assert counters.filter(F.col("bucket").isNull()).count() == 0
    null_probe = events.sparkSession.sql("SELECT CAST(NULL AS BIGINT) AS user_id")
    assert sketches.cms_estimate(counters, null_probe, "user_id").count() == 0
    probes = events.select("user_id").distinct()
    est = sketches.cms_estimate(counters, probes, "user_id", depth=4, width=512)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    bad = (
        est.join(exact, "user_id")
        .filter(F.col("est_count") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_pq_adc_distances_match_code_lut_model(spark):
    """Every returned ADC distance must equal the Python-computed sum
    over subspaces of the probe-to-codeword LUT entry for the vector's
    assigned code — integer-exact, ascending, probe excluded."""
    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    codes = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in similarity.pq_assign(emb, m=8).collect()
    }
    subs = similarity._pq_subvectors(emb, 8, "vec_id", "label", "embedding")
    book = {
        (r["subspace"], r["code"]): r["cvec_u"]
        for r in similarity._pq_codebook(subs).collect()
    }
    probe = {
        r["subspace"]: [round(v * 1e6) for v in r["subvec"]]
        for r in subs.filter(F.col("vec_id") == 0).collect()
    }
    lut = {
        (s, c): sum((p - cu) ** 2 for p, cu in zip(probe[s], cvec))
        for (s, c), cvec in book.items()
    }
    rows = similarity.pq_adc_topk(emb, probe_id=0, m=8, k=10).collect()
    assert len(rows) == 10
    dists = [r["adc_u2"] for r in rows]
    assert dists == sorted(dists)
    for r in rows:
        assert r["vec_id"] != 0
        want = sum(lut[(s, codes[(r["vec_id"], s)])] for s in range(8))
        assert r["adc_u2"] == want, (r, want)


def test_ivf_pq_consistent_with_cell_and_adc(spark):
    """IVF-PQ = (route to LSH cell) ∩ (rank by ADC): every returned id
    must share the probe's hyperplane bucket, and its ADC distance
    must equal the whole-corpus pq_adc value for the same id."""
    from chronobase_spark.dedup import embedding as embm

    emb = catalog.table(spark, SF_SMOKE, "embeddings")
    planes = embm.hyperplanes(6)
    buckets = {
        r["vid"]: r["bucket"]
        for r in emb.select(
            F.col("vec_id").alias("vid"),
            embm.lsh_signature(F.col("embedding"), planes).alias("bucket"),
        ).collect()
    }
    got = embm.ivf_pq_topk(emb, probe_id=0, num_planes=6, m=8, k=10).collect()
    assert got, "probe cell should contain candidates in the smoke corpus"
    full_adc = {
        r["vec_id"]: r["adc_u2"]
        for r in similarity.pq_adc_topk(emb, probe_id=0, m=8, k=10_000).collect()
    }
    dists = [r["adc_u2"] for r in got]
    assert dists == sorted(dists)
    for r in got:
        assert buckets[r["vec_id"]] == buckets[0], r
        assert r["adc_u2"] == full_adc[r["vec_id"]], r


def test_holt_daily_smoothing_matches_reference_python(spark):
    """The folded Holt recurrence must reproduce a transparent Python
    loop exactly (same op order, alpha=beta=0.5), reset state at each
    day boundary, and drop NULL observations."""
    from datetime import datetime

    from chronobase_spark.operators import timeseries

    rows = [
        # day 1, user 1: three observations
        (1, 10, datetime(2024, 1, 1, 9), 4.0),
        (1, 11, datetime(2024, 1, 1, 10), 8.0),
        (1, 12, datetime(2024, 1, 1, 11), 16.0),
        # day 2, user 1: reset
        (1, 13, datetime(2024, 1, 2, 9), 100.0),
        (1, 14, datetime(2024, 1, 2, 10), 50.0),
        # user 2 with a NULL observation dropped
        (2, 20, datetime(2024, 1, 1, 9), 1.0),
        (2, 21, datetime(2024, 1, 1, 10), None),
        (2, 22, datetime(2024, 1, 1, 11), 3.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])
    got = {
        r["event_id"]: (r["level"], r["trend"])
        for r in timeseries.holt_daily_smoothing(df).collect()
    }

    def holt(vals):
        out = []
        l, b = vals[0], 0.0
        out.append((l, b))
        for v in vals[1:]:
            ln = 0.5 * v + 0.5 * (l + b)
            bn = 0.5 * (ln - l) + 0.5 * b
            out.append((ln, bn))
            l, b = ln, bn
        return out

    want = {}
    for ids, vals in [
        ((10, 11, 12), (4.0, 8.0, 16.0)),
        ((13, 14), (100.0, 50.0)),
        ((20, 22), (1.0, 3.0)),
    ]:
        for eid, lb in zip(ids, holt(list(vals))):
            want[eid] = lb
    assert got == want
    assert 21 not in got


def test_holt_beta_zero_degenerates_to_ewma(spark):
    """With beta=0 the trend must stay exactly 0.0 and the level must
    equal the plain one-state EWMA recurrence; with alpha=1 the level
    must equal the raw observation — the two degenerate cases that pin
    Holt's wiring against the simpler smoother."""
    from datetime import datetime

    from chronobase_spark.operators import timeseries

    vals = [3.0, 7.0, 1.0, 9.0, 5.0, 2.0]
    rows = [
        (1, i, datetime(2024, 1, 1, 6 + i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "value"])

    got_b0 = {
        r["event_id"]: (r["level"], r["trend"])
        for r in timeseries.holt_daily_smoothing(df, beta=0.0).collect()
    }
    l = vals[0]
    for i, v in enumerate(vals):
        if i > 0:
            l = 0.5 * v + 0.5 * (l + 0.0)
        assert got_b0[i] == (l, 0.0), i

    got_a1 = {
        r["event_id"]: r["level"]
        for r in timeseries.holt_daily_smoothing(df, alpha=1.0).collect()
    }
    assert got_a1 == {i: v for i, v in enumerate(vals)}


def test_pii_scrub_matches_python_re_on_edge_cases(spark):
    """PII scrub pin: crafted edge rows (plus-sign international
    phones, dotted/uppercase locals that only partially match the
    lowercase pattern, adjacent and back-to-back spans, span at
    end-of-string, NULL text) must produce the same counts and
    byte-identical redacted text as a plain-Python ``re`` reference
    over the very same patterns — pinning that Spark's Java regex and
    the documented RE2-safe subset agree span-for-span."""
    import re

    cases = [
        "reach me at john.doe@example.com or call +1-555-1234 now",
        "a@b.c x@y.zz back-to-backa@b.cc555-0000",
        "555-12345 overlong still hits 555-1234 inside",
        "ends with mail tail@host.org",
        "UPPER@CASE.COM stays, lower@case.com goes",
        "no pii here at all",
        "",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], ["i", "t"])
    got = {
        r["i"]: (r["ne"], r["np"], r["red"])
        for r in df.select(
            "i",
            text.email_count(F.col("t")).alias("ne"),
            text.phone_count(F.col("t")).alias("np"),
            text.redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    email, phone = re.compile(text.EMAIL_RE), re.compile(text.PHONE_RE)
    for i, t in enumerate(cases):
        if t is None:
            assert got[i] == (None, None, None), got[i]
            continue
        ne = len(email.findall(t))
        np_ = len(phone.findall(t))
        red = phone.sub("<PHONE>", email.sub("<EMAIL>", t))
        assert got[i] == (ne, np_, red), (t, got[i], (ne, np_, red))


def test_jl_projection_distortion_concentrates_near_one(spark):
    """JL lemma sanity: with a 16-dim Gaussian projection of 64-dim
    vectors, the pairwise distance distortion d2_proj/(k*d2_orig) must
    concentrate around 1 (loose bounds — this pins the projection is
    scaled correctly and actually preserves geometry, not a tight
    concentration inequality)."""
    from chronobase_spark import queries as q

    rows = q._REGISTRY["jl_distance_preservation"][0](spark, SF_SMOKE).collect()
    ds = [r["distortion"] for r in rows if r["distortion"] is not None]
    assert len(ds) >= 100, "20-probe pair frame should yield ~190 pairs"
    mean = sum(ds) / len(ds)
    assert 0.75 < mean < 1.25, f"mean distortion {mean} far from 1"
    assert all(0.2 < d < 3.0 for d in ds), "individual distortion blew up"


def test_wav_parser_known_samples():
    """_parse_wav / _decode_wav_bytes against a hand-written canonical
    RIFF/WAVE file with known int16 samples [+256, -512, 0, +256]."""
    import struct

    from chronobase_spark.functions import multimodal

    samples = [256, -512, 0, 256]
    data = struct.pack("<4h", *samples)
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate, got = multimodal._parse_wav(buf)
    assert rate == 8000 and list(got) == samples
    feats = multimodal._decode_wav_bytes(buf)
    assert feats == {
        "sample_rate": 8000,
        "n_samples": 4,
        "duration_ms": 0,
        "peak_abs": 512,
        "sum_abs": 1024,
        # +256 -> -512 crosses; -512 -> 0 and 0 -> +256 do NOT (strict
        # sign product < 0), matching the SQL oracle's arithmetic
        "zero_crossings": 1,
    }


def test_wav_payloads_open_in_stdlib_wave(spark):
    """Every synthesized payload must be a spec-valid WAV an EXTERNAL
    reader accepts: stdlib wave (an independent RIFF implementation)
    must report the same rate/width/channels/frame count the
    in-engine decoder sees, including the empty-text zero-frame file;
    NULL text carries NULL features."""
    import io
    import wave as wavmod

    from chronobase_spark.functions import multimodal

    base = catalog.table(spark, SF_SMOKE, "documents").limit(20)
    extra = spark.createDataFrame(
        [(999998, "", "x", "x", 0), (999999, None, "x", "x", 0)],
        base.schema,
    )
    df = base.union(extra)
    payloads = {
        r["doc_id"]: r["payload"]
        for r in multimodal.to_wav_payload(df).collect()
    }
    feats = {
        r["doc_id"]: r
        for r in multimodal.decode_wav(multimodal.to_wav_payload(df)).collect()
    }
    checked = 0
    for doc_id, p in payloads.items():
        if p is None:
            assert feats[doc_id]["n_samples"] is None
            continue
        w = wavmod.open(io.BytesIO(bytes(p)))
        assert (
            w.getframerate(),
            w.getsampwidth(),
            w.getnchannels(),
            w.getnframes(),
        ) == (8000, 2, 1, feats[doc_id]["n_samples"])
        checked += 1
    assert checked >= 20 and feats[999998]["n_samples"] == 0
    assert payloads[999999] is None


def _tied_ranks(v):
    order = sorted(range(len(v)), key=lambda i: v[i])
    r = [0.0] * len(v)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
            j += 1
        for t in range(i, j + 1):
            r[order[t]] = (i + j) / 2 + 1
        i = j + 1
    return r


def _spearman(x: dict, y: dict) -> float:
    keys = sorted(set(x) & set(y))
    rx = _tied_ranks([x[k] for k in keys])
    ry = _tied_ranks([y[k] for k in keys])
    n = len(keys)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((rx[i] - mx) * (ry[i] - my) for i in range(n))
    den = (
        sum((rx[i] - mx) ** 2 for i in range(n))
        * sum((ry[i] - my) ** 2 for i in range(n))
    ) ** 0.5
    return num / den


def test_lm_smoothers_rank_documents_consistently(spark):
    """The add-one and Kneser-Ney bigram LMs are independent smoothers
    over the same gram stream; both oracles verify each model's
    arithmetic but neither would catch a smoothing regression that
    leaves its own formula internally consistent. Cross-pin: the two
    models' per-gram document scores must rank the corpus nearly
    identically (measured Spearman ρ = 0.998 at sf0.001; a discount or
    back-off bug drops it far below the 0.9 floor)."""
    from chronobase_spark.queries import _REGISTRY

    sf = SF_SMOKE
    add1 = {
        r["doc_id"]: r["logprob_micro"] / r["n_grams"]
        for r in _REGISTRY["bigram_lm_logprob"][0](spark, sf).collect()
    }
    kn = {
        r["doc_id"]: r["kn_logprob_micro"] / r["n_grams"]
        for r in _REGISTRY["kn_bigram_logprob"][0](spark, sf).collect()
    }
    assert set(add1) == set(kn) and len(add1) >= 100
    rho = _spearman(add1, kn)
    assert rho >= 0.9, f"LM smoothers disagree on document ranking: ρ={rho:.4f}"


@pytest.fixture(scope="module")
def predictability_corpus(spark):
    """Corpus where TRIGRAM statistics are meaningful (the sf0.001 docs
    make most trigrams singletons, which is why the JM model is absent
    from the sf0.001 pin above): 10-word vocabulary, 120 docs in three
    predictability tiers — pure 4-cycle, 70% cycle + noise, uniform
    shuffle. Every sane smoother must rank cyclers above shufflers."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(10)]
    rows = []
    for d in range(120):
        n = rng.randint(30, 60)
        tier = d % 3
        toks = []
        for i in range(n):
            if tier == 0:
                toks.append(vocab[i % 4])
            elif tier == 1:
                toks.append(
                    vocab[i % 4] if rng.random() < 0.7 else rng.choice(vocab)
                )
            else:
                toks.append(rng.choice(vocab))
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


@pytest.mark.parametrize(
    "pair",
    [("add1", "kn"), ("add1", "jm"), ("kn", "jm")],
    ids=["add1-kn", "add1-jm", "kn-jm"],
)
def test_lm_smoother_matrix_ranks_agree(spark, predictability_corpus, pair):
    """Full 3-smoother rank-agreement matrix (r12 verdict task #5):
    add-one bigram, Kneser-Ney bigram, and the Jelinek-Mercer TRIGRAM
    share the gram/marginal helpers in functions/text.py — a regression
    there that keeps each formula internally consistent slips every
    per-model oracle, but not a cross-model ranking pin. On the
    predictability corpus (trigrams non-singleton) all three pairs
    measure ρ ≥ 0.97; floor 0.9."""
    per_gram = {
        "add1": lambda df: {
            r["doc_id"]: r["logprob_micro"] / r["n_grams"]
            for r in text.bigram_lm_scores(df).collect()
        },
        "kn": lambda df: {
            r["doc_id"]: r["kn_logprob_micro"] / r["n_grams"]
            for r in text.kn_bigram_scores(df).collect()
        },
        "jm": lambda df: {
            r["doc_id"]: r["jm_logprob_micro"] / r["n_grams"]
            for r in text.jm_trigram_scores(df).collect()
        },
    }
    a, b = pair
    sa = per_gram[a](predictability_corpus)
    sb = per_gram[b](predictability_corpus)
    assert len(set(sa) & set(sb)) == 120
    rho = _spearman(sa, sb)
    assert rho >= 0.9, f"{a} vs {b} ranking disagreement: ρ={rho:.4f}"


def test_jm_trigram_scores_match_reference_python(spark):
    """The JM trigram scorer (marginals derived from the trigram-type
    table + edge corrections) must equal an independent pure-Python
    model that counts every order DIRECTLY — proving the no-extra-
    explode derivation exact, not just plausible. The trigram is
    deliberately NOT in the rank-agreement pin above: at smoke scale
    most trigrams are singletons (λ3 term ≈ constant ln-range), so its
    ranking is driven by the lower orders and measured Spearman vs the
    bigram models is ≈0.1 — a property of self-trained trigrams on a
    small corpus, not a defect."""
    import collections
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from chronobase_spark.functions import text as textf

    docs = catalog.table(spark, SF_SMOKE, "documents")
    got = {
        r["doc_id"]: (r["n_grams"], r["jm_logprob_micro"])
        for r in textf.jm_trigram_scores(docs).collect()
    }

    toks = {
        r["doc_id"]: [t for t in (r["text"] or "").strip().lower().split(" ") if t]
        for r in docs.select("doc_id", "text").collect()
    }
    c123 = collections.Counter()
    c12p = collections.Counter()
    c23 = collections.Counter()
    c2p = collections.Counter()
    c3 = collections.Counter()
    n_tok = 0
    for tk in toks.values():
        n_tok += len(tk)
        for w in tk:
            c3[w] += 1
        for i in range(len(tk) - 1):
            c23[(tk[i], tk[i + 1])] += 1
            c2p[tk[i]] += 1
        for i in range(len(tk) - 2):
            c123[(tk[i], tk[i + 1], tk[i + 2])] += 1
            c12p[(tk[i], tk[i + 1])] += 1

    def term(g):
        p = (
            (0.5 * c123[g]) / c12p[(g[0], g[1])]
            + (0.375 * c23[(g[1], g[2])]) / c2p[g[1]]
            + (0.125 * c3[g[2]]) / n_tok
        )
        return int(
            Decimal(repr(math.log(p) * 1e6)).quantize(0, rounding=ROUND_HALF_UP)
        )

    want = {}
    for d, tk in toks.items():
        grams = [(tk[i], tk[i + 1], tk[i + 2]) for i in range(len(tk) - 2)]
        if grams:
            want[d] = (len(grams), sum(term(g) for g in grams))
    assert want and set(got) == set(want)
    assert all(got[d] == want[d] for d in want)


# ---------------------------------------------------------------------------
# token_budget_select edge-case pins (r12 verdict task #3): the driver
# oracle is the naive global-cumulative formulation at sf0.01, which by
# luck never exercises the degenerate shapes of the sharded plan — the
# empty boundary class, a single score class (whole corpus IS the
# boundary), and a boundary class spanning several doc_id range shards.
# ---------------------------------------------------------------------------


def _naive_budget_admit(rows):
    """Plain-Python naive rule: tokenize exactly like the query
    (trim+lower+space-split, empties dropped), admit in (score desc,
    doc_id asc) order while inclusive cumulative tokens <= 30% budget."""
    scored = []
    for doc_id, txt in rows:
        toks = [t for t in (txt or "").strip().lower().split(" ") if t]
        scored.append((doc_id, len(set(toks)), len(toks)))
    budget = sum(n for _, _, n in scored) * 3 // 10
    cum, admitted = 0, {}
    for doc_id, _score, n in sorted(scored, key=lambda r: (-r[1], r[0])):
        cum += n
        admitted[doc_id] = cum <= budget
    return {d: (s, n, admitted[d]) for d, s, n in scored}


def _run_budget_select(spark, tmp_path, rows):
    from chronobase_spark.queries import _REGISTRY

    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["score"], r["n_tokens"], r["admitted"])
        for r in _REGISTRY["token_budget_select"][0](spark, sf_dir).collect()
    }
    assert got == _naive_budget_admit(rows)
    return got


def test_budget_select_empty_boundary_class(spark, tmp_path):
    """Zero-token corpus: budget = 0 >= total = 0, every (empty) bucket
    fits, the boundary filter (cum > b) matches nothing — the
    empty-boundary branch the driver oracle never reaches. Every doc
    must come back admitted via the full-bucket leg, with the left join
    against the empty boundary frame coalescing cleanly (no NULLs, no
    dropped rows)."""
    rows = [(i, "   " if i % 2 else "") for i in range(6)]
    got = _run_budget_select(spark, tmp_path, rows)
    assert len(got) == 6
    assert all(v == (0, 0, True) for v in got.values())


def test_budget_select_exact_bucket_edge(spark, tmp_path):
    """Budget lands EXACTLY on a bucket boundary: 10 docs x 10 distinct
    tokens at score 10..1 -> total 100, budget 30, the score-10..8
    buckets sum to exactly 30. The score-7 bucket is the boundary with
    remaining = 0 — its sharded prefix must admit nothing (in_cum 10 >
    0), while the cum == b bucket stays fully admitted (<=, not <)."""
    # doc i: score 10-i distinct tokens, n_tokens fixed at 10
    rows = []
    for i in range(10):
        k = 10 - i  # distinct tokens: 10, 9, ..., 1
        toks = [f"d{i}_{j}" for j in range(k)]
        toks += [toks[0]] * (10 - k)  # pad with repeats to n_tokens=10
        rows.append((i, " ".join(toks)))
    got = _run_budget_select(spark, tmp_path, rows)
    assert [got[i][2] for i in range(10)] == [True] * 3 + [False] * 7


def test_budget_select_single_score_class(spark, tmp_path):
    """One score value for the whole corpus: zero full buckets, the
    entire corpus IS the boundary class, so admission is decided purely
    by the rshard prefix machinery in doc_id order."""
    rows = [(i, " ".join(["x"] * (i + 1))) for i in range(8)]
    got = _run_budget_select(spark, tmp_path, rows)
    naive = _naive_budget_admit(rows)
    assert any(v[2] for v in got.values()) and not all(v[2] for v in got.values())
    assert got == naive


def test_budget_select_boundary_spans_many_shards(spark, tmp_path):
    """Boundary class spanning 4 doc_id range shards (rshard = doc_id
    div 65536): the cross-shard offset table and the shuffle_hash
    offset join must stitch the per-shard prefixes into ONE exact
    global prefix — an off-by-one-shard bug admits a whole shard too
    many. High-score docs burn most of the budget; the 8 boundary docs
    sit at doc_ids 10, 70_000, 140_000, 200_001, ... so the admit cut
    falls mid-shard-sequence."""
    rows = []
    # 3 high-score docs (5 distinct, 30 tokens each) -> 90 tokens
    for i in range(3):
        toks = [f"h{i}_{j}" for j in range(5)]
        rows.append((i, " ".join(toks * 6)))
    # 8 boundary docs (2 distinct, 20 tokens) across 4 shards
    for k in range(8):
        doc_id = 10 + k * 65536 + (k % 2)
        rows.append((doc_id, " ".join(["a", "b"] * 10)))
    # low-score tail (1 distinct, 40 tokens each) pushes total up so
    # the budget crosses INSIDE the boundary class
    for k in range(6):
        rows.append((1_000_000 + k, " ".join(["z"] * 40)))
    got = _run_budget_select(spark, tmp_path, rows)
    naive = _naive_budget_admit(rows)
    boundary_admits = [d for d, v in got.items() if v[0] == 2 and v[2]]
    # the cut must land strictly inside the boundary class and span
    # shard boundaries (admitted boundary docs in >= 2 distinct shards)
    assert 0 < len(boundary_admits) < 8
    assert len({d // 65536 for d in boundary_admits}) >= 2
    assert got == naive


def test_dsir_weights_match_reference_python(spark):
    """dsir_select vs an independent pure-Python model: hashed bigram
    buckets (hashlib md5), add-one smoothed target/raw bucket
    distributions, half-up micro-nat quantization per bucket, exact
    integer doc sums, and the self-normalized log-space accept test —
    proving the derived bucket tables and the no-second-explode plan
    exact, not just oracle-consistent. Synthetic corpus: two langs
    with disjoint-ish vocabularies so target-likeness actually
    separates (en docs must be accepted at a higher rate)."""
    import collections
    import hashlib
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from chronobase_spark.functions import text as textf

    rng = random.Random(7)
    en_vocab = [f"en{i}" for i in range(30)]
    xx_vocab = [f"xx{i}" for i in range(30)] + en_vocab[:5]
    rows = []
    for d in range(90):
        lang = "en" if d % 3 else "xx"
        vocab = en_vocab if lang == "en" else xx_vocab
        n = rng.randint(5, 40)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n)), lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        r["doc_id"]: (r["n_grams"], r["w_micro"], r["accepted"])
        for r in textf.dsir_select(docs).collect()
    }

    def bucket(gram):
        return int(hashlib.md5(gram.encode()).hexdigest()[:3], 16)

    doc_buckets, c_raw, c_tgt = {}, collections.Counter(), collections.Counter()
    for d, txt, lang in rows:
        toks = [t for t in txt.strip().lower().split(" ") if t]
        bs = collections.Counter(
            bucket(f"{toks[i]} {toks[i + 1]}") for i in range(len(toks) - 1)
        )
        if bs:
            doc_buckets[d] = bs
        c_raw.update(bs)
        if lang == "en":
            c_tgt.update(bs)
    n_r, n_t, B = sum(c_raw.values()), sum(c_tgt.values()), 4096.0

    def r_micro(b):
        p_t = (c_tgt[b] + 1.0) / (n_t + B)
        p_r = (c_raw[b] + 1.0) / (n_r + B)
        return int(
            Decimal(repr(math.log(p_t / p_r) * 1e6)).quantize(
                0, rounding=ROUND_HALF_UP
            )
        )

    want_w = {
        d: (sum(bs.values()), sum(tf * r_micro(b) for b, tf in bs.items()))
        for d, bs in doc_buckets.items()
    }
    assert set(got) == set(want_w)
    assert all(got[d][:2] == want_w[d] for d in want_w)

    m = max(w / n for n, w in want_w.values())
    acc_rate = {}
    for d, (n, w) in want_w.items():
        u = int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16)
        want_acc = math.log((u + 1.0) / 65536.0) * 1e6 < w / n - m
        assert got[d][2] == want_acc, d
        lang = "en" if d % 3 else "xx"
        acc_rate.setdefault(lang, []).append(want_acc)
    en_rate = sum(acc_rate["en"]) / len(acc_rate["en"])
    xx_rate = sum(acc_rate["xx"]) / len(acc_rate["xx"])
    assert en_rate > xx_rate, (en_rate, xx_rate)


def test_dsir_nondefault_config_matches_generated_oracle(spark):
    """The r13 advice fix end-to-end: a NON-default DSIR configuration
    (target_lang='fr', language column renamed 'language') must match
    the oracle GENERATED from the same parameters (queries._dsir_sql),
    proving the parameterization is threaded through the bucket pass
    and the SQL template rather than silently diverging from the one
    hardcoded-'en' oracle the driver checks."""
    import duckdb

    import chronobase_spark.queries as q
    from chronobase_spark.functions import text as textf

    docs = (
        catalog.table(spark, SF_SMOKE, "documents")
        .withColumnRenamed("lang", "language")
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["w_micro"], r["accepted"])
        for r in textf.dsir_select(
            docs, target_lang="fr", lang_col="language"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * EXCLUDE (lang), lang AS language"
        f" FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    sql = q._dsir_sql(target_lang="fr", lang_col="language")
    want = {
        int(r[0]): (int(r[1]), int(r[2]), bool(r[3]))
        for r in con.execute(sql).fetchall()
    }
    assert want and got == want
    # the fixture actually has a 'fr' slice (else the target side is
    # empty and the test proves nothing about the predicate)
    assert docs.filter(F.col("language") == "fr").count() > 0


def test_rolling_median_daily_ground_truth(spark, tmp_path):
    """Hand-built series pin for the 7-day rolling median (r17): one
    type, ten days with one event each, values chosen so the medians
    are obvious; the first six days drop (no full trailing window) and
    a single huge spike day shifts NO median it participates in —
    the robustness that distinguishes this baseline from a mean."""
    from chronobase_spark import queries as q

    vals = [10.0, 5.0, 8.0, 1.0, 9.0, 3.0, 7.0, 1000.0, 2.0, 6.0]
    rows = [
        (i, f"2024-01-{i + 1:02d} 12:00:00", "t", i, v)
        for i, v in enumerate(vals)
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, user_id long, value double"
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "user_id", "value"
    ).write.parquet(src + "/events.parquet")
    got = {
        str(r["day"])[:10]: r["med7_micro"] / 1_000_000
        for r in q.queries()["rolling_median_daily"](spark, src).collect()
    }
    # day 7: median(10,5,8,1,9,3,7)=7; day 8: median(5,8,1,9,3,7,1000)=7
    # (the spike lands ABOVE the middle, median unmoved); day 9:
    # median(8,1,9,3,7,1000,2)=7; day 10: median(1,9,3,7,1000,2,6)=6
    assert got == {
        "2024-01-07": 7.0,
        "2024-01-08": 7.0,
        "2024-01-09": 7.0,
        "2024-01-10": 6.0,
    }
