"""Property-based semantics checks (hypothesis): the custom composite
operators — as-of join, bucketed range join, sessionization — must agree
with a trivially-correct brute-force model on arbitrary generated
inputs, not just the fixture corpus. These operators are compositions
(union+window, bucket+filter, gaps-and-islands), so their edge cases
(ties, empty sides, boundary gaps) are exactly where hand-written tests
under-cover.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark.operators import joins, timeseries, windows  # noqa: E402

BASE = dt.datetime(2024, 1, 1)

# (key, seconds-offset, value) tuples; small key space forces collisions,
# duplicate timestamps exercise tie-breaking.
rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 400),
        st.integers(0, 100),
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows, cols):
    data = [
        (k, BASE + dt.timedelta(seconds=s), float(v), i)
        for i, (k, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, [cols[0], cols[1], cols[2], "rid"])


@SETTINGS
@given(left=rows_strategy, right=rows_strategy)
def test_asof_join_matches_bruteforce(spark, left, right):
    """For every left row, asof_join must return max(right.ts) with
    right.ts <= left.ts on the same key — the reference-free definition."""
    ldf = _df(spark, left, ["k", "t", "val"])
    rdf = _df(spark, right, ["k", "t", "rval"]).select(
        "k", "t", F.col("t").alias("right_t")
    )
    out = joins.asof_join(
        ldf, rdf, left_on="k", right_on="k", left_ts="t", right_ts="t",
        right_cols=["right_t"],
    )
    got = {r["rid"]: r["right_t"] for r in out.collect()}

    for i, (k, s, _v) in enumerate(left):
        lt = BASE + dt.timedelta(seconds=s)
        candidates = [
            BASE + dt.timedelta(seconds=rs)
            for (rk, rs, _rv) in right
            if rk == k and rs <= s
        ]
        want = max(candidates) if candidates else None
        assert got[i] == want, f"left row {i} (k={k}, t={lt}): {got[i]} != {want}"


@SETTINGS
@given(left=rows_strategy, right=rows_strategy, gap=st.integers(1, 300))
def test_range_join_matches_bruteforce(spark, left, right, gap):
    """Bucketed range join ≡ the naive theta-join definition
    0 <= r.ts - l.ts <= gap on matching keys, for arbitrary gap widths
    (bucket boundaries land anywhere relative to the data)."""
    ldf = _df(spark, left, ["k", "tsa", "va"]).select(
        "k", "tsa", F.col("rid").alias("lid")
    )
    rdf = _df(spark, right, ["k", "tsb", "vb"]).select(
        "k", "tsb", F.col("rid").alias("rid2")
    )
    out = joins.range_join_bucketed(ldf, rdf, "tsa", "tsb", gap, ["k"])
    got = {(r["lid"], r["rid2"]) for r in out.collect()}

    want = {
        (i, j)
        for i, (lk, ls, _lv) in enumerate(left)
        for j, (rk, rs, _rv) in enumerate(right)
        if lk == rk and 0 <= rs - ls <= gap
    }
    assert got == want


@SETTINGS
@given(rows=rows_strategy, gap=st.integers(1, 200))
def test_sessionize_matches_bruteforce(spark, rows, gap):
    """Session ids must equal the sequential gaps-and-islands fold over
    each key's (ts, rid)-ordered event list."""
    df = _df(spark, rows, ["k", "t", "v"])
    out = windows.sessionize(df, "k", "t", key_col="rid", gap_seconds=gap)
    got = {r["rid"]: r["session_id"] for r in out.collect()}

    by_key: dict[int, list[tuple[int, int]]] = {}
    for i, (k, s, _v) in enumerate(rows):
        by_key.setdefault(k, []).append((s, i))
    for k, evs in by_key.items():
        evs.sort()
        sid, prev = 0, None
        for s, rid in evs:
            if prev is None or s - prev > gap:
                sid += 1
            prev = s
            assert got[rid] == sid, f"key {k} rid {rid}: {got[rid]} != {sid}"


@SETTINGS
@given(rows=rows_strategy)
def test_gap_fill_locf_matches_bruteforce(spark, rows):
    """Gap-fill densification: per key, every minute bucket between the
    key's first and last bucket appears exactly once; empty buckets get
    n_events=0 and carry the last observed average forward."""
    df = _df(spark, rows, ["k", "t", "v"])
    out = timeseries.gap_fill_locf(df, "k", ts_col="t", value_col="v", bucket="minute")
    got = {
        (r["k"], r["bucket_ts"], r["n_events"], r["avg_value_locf"])
        for r in out.collect()
    }

    per: dict[tuple[int, dt.datetime], list[float]] = {}
    for k, s, v in rows:
        b = (BASE + dt.timedelta(seconds=s)).replace(second=0, microsecond=0)
        per.setdefault((k, b), []).append(float(v))
    want = set()
    for key in {k for k, _ in per}:
        buckets = sorted(b for kk, b in per if kk == key)
        b, end, last = buckets[0], buckets[-1], None
        while b <= end:
            vals = per.get((key, b))
            if vals:
                # exact-sum-then-one-division contract (integer test
                # values sum exactly; same op both engines, unrounded)
                last = sum(vals) / len(vals)
                n = len(vals)
            else:
                n = 0
            want.add((key, b, n, last))
            b += dt.timedelta(minutes=1)
    assert got == want


def _segmented_ewma_model(rows):
    """Pure-Python replica of segmented_ewma's exact FP op DAG
    (bucket = minute, α = 0.5): zero-start prefix fold per segment,
    boundary chain of multiply-adds, final a_j·yin + b_j per row.
    Python floats are IEEE doubles, so agreement must be bit-exact."""
    by_key: dict[int, list[tuple[dt.datetime, int, float]]] = {}
    for i, (k, s, v) in enumerate(rows):
        by_key.setdefault(k, []).append(
            (BASE + dt.timedelta(seconds=s), i, float(v))
        )
    out: dict[int, float] = {}
    for recs in by_key.values():
        recs.sort()
        segs: list[tuple[list[float], list[float], list[tuple]]] = []
        cur_seg = None
        for ts, eid, v in recs:
            seg = ts.replace(second=0, microsecond=0)
            if seg != cur_seg:
                segs.append(([], [], []))
                cur_seg = seg
            a, b, rows_in = segs[-1]
            a.append(0.5 * a[-1] if a else 0.5)
            b.append(0.5 * v + 0.5 * b[-1] if b else 0.5 * v)
            rows_in.append((ts, eid, v))
        yin = None
        for idx, (a, b, rows_in) in enumerate(segs):
            if idx == 0:
                yin = rows_in[0][2]
            else:
                pa, pb = segs[idx - 1][0][-1], segs[idx - 1][1][-1]
                yin = pa * yin + pb
            for j, (_, eid, _) in enumerate(rows_in):
                out[eid] = a[j] * yin + b[j]
    return out


@given(rows=rows_strategy)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ewma_matches_model_and_pandas(spark, rows):
    """segmented_ewma must (1) agree BIT-EXACTLY with a pure-Python
    replica of its documented affine-segment op DAG — pinning the
    determinism the DuckDB oracle relies on — and (2) agree with
    pandas' ewm(alpha=0.5, adjust=False) sequential recurrence to
    float tolerance (the segmented association differs from the pure
    sequential one only in rounding placement). Minute buckets ensure
    the 0–400 s offsets actually span multiple segments, exercising
    the boundary chain."""
    import math

    import pandas as pd

    if not rows:
        return
    df = spark.createDataFrame(
        [
            (int(i), int(k), BASE + dt.timedelta(seconds=s), float(v))
            for i, (k, s, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in timeseries.segmented_ewma(df, bucket="minute").collect()
    }

    model = _segmented_ewma_model(rows)
    assert set(got) == set(model)
    for eid in got:
        assert got[eid] == model[eid], (eid, got[eid], model[eid])

    pdf = pd.DataFrame(
        [
            {"event_id": i, "user_id": k, "s": s, "value": float(v)}
            for i, (k, s, v) in enumerate(rows)
        ]
    ).sort_values(["user_id", "s", "event_id"])
    expected = {}
    for _, grp in pdf.groupby("user_id"):
        ew_vals = grp["value"].ewm(alpha=0.5, adjust=False).mean()
        for eid, val in zip(grp["event_id"], ew_vals):
            expected[eid] = val
    for eid in got:
        assert math.isclose(got[eid], expected[eid], rel_tol=1e-9, abs_tol=1e-9), (
            eid, got[eid], expected[eid],
        )


@given(rows=rows_strategy)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ohlc_struct_extrema_match_bruteforce(spark, rows):
    """min/max(struct(ts, event_id, value)) must pick exactly the
    first/last value under (ts, event_id) order — including duplicate
    timestamps where the event_id tie-break decides."""
    if not rows:
        return
    df = spark.createDataFrame(
        [
            (int(i), int(k), BASE + dt.timedelta(seconds=s), float(v))
            for i, (k, s, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["user_id"]: (r["open_v"], r["close_v"])
        for r in df.groupBy("user_id")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("_o"),
            F.max(F.struct("ts", "event_id", "value")).alias("_c"),
        )
        .select(
            "user_id",
            F.col("_o.value").alias("open_v"),
            F.col("_c.value").alias("close_v"),
        )
        .collect()
    }
    by_key: dict[int, list] = {}
    for i, (k, s, v) in enumerate(rows):
        by_key.setdefault(k, []).append((s, i, float(v)))
    for k, items in by_key.items():
        items.sort()
        assert got[k] == (items[0][2], items[-1][2]), k


@SETTINGS
@given(rows=rows_strategy)
def test_gap_fill_interp_matches_bruteforce(spark, rows):
    """Interpolation gap-fill: observed buckets keep their (rounded)
    average; every empty bucket between a key's first and last bucket
    gets the linear blend of its neighboring observed buckets, with the
    weight taken from whole-second bucket distances."""
    df = _df(spark, rows, ["k", "t", "v"])
    out = timeseries.gap_fill_interp(df, "k", ts_col="t", value_col="v", bucket="minute")
    got = {(r["k"], r["bucket_ts"], r["avg_value_interp"]) for r in out.collect()}

    per: dict[tuple[int, dt.datetime], list[float]] = {}
    for k, s, v in rows:
        b = (BASE + dt.timedelta(seconds=s)).replace(second=0, microsecond=0)
        per.setdefault((k, b), []).append(float(v))
    want = set()
    for key in {k for k, _ in per}:
        buckets = sorted(b for kk, b in per if kk == key)
        obs = {b: sum(per[(key, b)]) / len(per[(key, b)]) for b in buckets}
        b, end = buckets[0], buckets[-1]
        while b <= end:
            if b in obs:
                want.add((key, b, obs[b]))
            else:
                prev_b = max(x for x in buckets if x < b)
                next_b = min(x for x in buckets if x > b)
                ratio = (b - prev_b).total_seconds() / (next_b - prev_b).total_seconds()
                want.add((key, b, obs[prev_b] + (obs[next_b] - obs[prev_b]) * ratio))
            b += dt.timedelta(minutes=1)
    assert got == want


@SETTINGS
@given(rows=rows_strategy)
def test_counter_rate_matches_bruteforce(spark, rows):
    """Counter rate: per key in (ts, rid) order — increase is the delta
    when non-negative, the raw value on a reset, NULL for the first
    sample; rate divides by the whole-second gap, NULL when the gap is
    zero."""
    df = _df(spark, rows, ["k", "t", "v"])
    out = windows.counter_rate(df, "k", ts_col="t", key_col="rid", value_col="v")
    got = {r["rid"]: (r["increase"], r["rate_per_s"]) for r in out.collect()}

    by_key: dict[int, list[tuple[int, int, float]]] = {}
    for i, (k, s, v) in enumerate(rows):
        by_key.setdefault(k, []).append((s, i, float(v)))
    for k, evs in by_key.items():
        evs.sort()
        prev = None
        for s, rid, v in evs:
            if prev is None:
                assert got[rid] == (None, None), f"rid {rid}"
            else:
                ps, pv = prev
                inc = v - pv if v - pv >= 0 else v
                rate = inc / (s - ps) if s - ps > 0 else None
                assert got[rid] == (inc, rate), f"rid {rid}: {got[rid]} != {(inc, rate)}"
            prev = (s, v)


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    f_small=st.sampled_from([0.1, 0.25, 0.5]),
    f_big=st.sampled_from([0.6, 0.8, 1.0]),
)
@SETTINGS
def test_stratified_sampler_is_nested_and_matches_model(spark, ids, f_small, f_big):
    """md5_stratified_keep must (a) equal the trivial Python model —
    keep iff the first 4 md5 hex chars of str(id) sort below the
    fraction's 4-hex threshold — and (b) be NESTED: every id kept at a
    smaller fraction is also kept at a larger one (the property that
    lets a pipeline down-sample a previously sampled corpus without
    resampling churn; seeded Bernoulli has no such guarantee across
    fractions)."""
    import hashlib

    from chronobase_spark.functions import packing

    df = spark.createDataFrame([(i, "en") for i in ids], ["doc_id", "lang"])

    def model(frac):
        n = int(frac * 65536)
        thr = "g" if n >= 65536 else format(n, "04x")
        return {
            i
            for i in ids
            if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr
        }

    got = {}
    for frac in (f_small, f_big):
        keep = packing.md5_stratified_keep(
            F.col("doc_id"), F.col("lang"), {"en": frac}
        )
        got[frac] = {r["doc_id"] for r in df.filter(keep).collect()}
        assert got[frac] == model(frac), frac
    assert got[f_small] <= got[f_big]


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_repeated_spans_counts_match_bruteforce(spark, texts):
    """The span explode must emit exactly max(0, n_tokens - W + 1) spans
    per document, and the cross-document span aggregation must equal
    the brute-force Python count over the same 8-token windows
    (including the short-document guard: Spark's descending
    sequence(1, n<1) must never leak phantom spans)."""
    from collections import Counter, defaultdict

    from chronobase_spark import queries as q

    W = q._SPAN_W
    docs = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    spans_per_doc = defaultdict(set)
    occ = Counter()
    for i, toks in enumerate(texts):
        for j in range(max(0, len(toks) - W + 1)):
            span = " ".join(toks[j : j + W])
            spans_per_doc[span].add(i)
            occ[span] += 1
    expect = {
        (len(d), occ[s])
        for s, d in spans_per_doc.items()
        if len(d) >= 2
    }

    # same pipeline as the registered query, bound to our generated df
    # (the registered callable is tied to the corpus tables)
    from chronobase_spark.functions import text as text_fns

    spans_expr = F.expr(
        f"""CASE WHEN size(toks) >= {W}
                 THEN transform(sequence(1, size(toks) - {W - 1}),
                                i -> array_join(slice(toks, i, {W}), ' '))
                 ELSE array() END"""
    )
    agg = (
        df.select("doc_id", text_fns.tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(spans_expr).alias("span"))
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .collect()
    )
    assert {(r["n_docs"], r["n_occ"]) for r in agg} == expect


def _ltob_model(rows, bucket_s=60):
    """Pure-Python replica of ltob_downsample's exact op DAG (minute
    buckets): bucket-relative integer sums, neighbor = adjacent
    EXISTING bucket in the summary order, score evaluated with the
    identical double expression tree, ties on (earliest x, lowest id).
    Returns {(key, bucket_start_s): (rid, value)} for interior buckets."""
    from collections import defaultdict

    pts = defaultdict(list)
    for i, (k, s, v) in enumerate(rows):
        b = (s // bucket_s) * bucket_s
        pts[(k, b)].append((s * 1_000_000, round(float(v) * 1e6), i, float(v)))
    out = {}
    for key in {k for k, _ in pts}:
        buckets = sorted(b for kk, b in pts if kk == key)
        for j in range(1, len(buckets) - 1):
            bp, bc, bn = buckets[j - 1], buckets[j], buckets[j + 1]
            bp_us, bc_us, bn_us = (b * 1_000_000 for b in (bp, bc, bn))
            P, C, N = pts[(key, bp)], pts[(key, bc)], pts[(key, bn)]
            n_p, n_n = len(P), len(N)
            sxr_p = sum(x - bp_us for x, _, _, _ in P)
            sy_p = sum(y for _, y, _, _ in P)
            sxr_n = sum(x - bn_us for x, _, _, _ in N)
            sy_n = sum(y for _, y, _, _ in N)
            xa = sxr_p + n_p * (bp_us - bc_us)
            xc = sxr_n + n_n * (bn_us - bc_us)
            best = None
            for x, y, rid, v in C:
                dx = x - bc_us
                score = abs(
                    (float(xa) * float(n_n) - float(xc) * float(n_p))
                    * (float(y) * float(n_p) - float(sy_p))
                    - (float(sy_p) * float(n_n) - float(sy_n) * float(n_p))
                    * (float(dx) * float(n_p) - float(xa))
                )
                cand = (score, -x, -rid, rid, v)
                if best is None or cand > best:
                    best = cand
            out[(key, bc)] = (best[3], best[4])
    return out


@SETTINGS
@given(rows=rows_strategy)
def test_ltob_downsample_matches_model(spark, rows):
    """ltob_downsample must agree with the pure-Python replica of its
    exact FP op DAG on arbitrary inputs — interior-bucket set,
    representative id, and value all equal."""
    df = _df(spark, rows, ["event_type", "ts", "value"]).withColumnRenamed(
        "rid", "event_id"
    )
    got = {
        (r["event_type"], int((r["bucket_ts"] - BASE).total_seconds())): (
            r["event_id"],
            r["value"],
        )
        for r in timeseries.ltob_downsample(df, bucket="minute").collect()
    }
    assert got == _ltob_model(rows)


texts_strategy = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


@SETTINGS
@given(texts=texts_strategy)
def test_char_entropy_matches_model(spark, texts):
    """Per-doc character entropy (micro-nats) must equal the Python
    model on arbitrary strings: H = ln n − (Σ c·ln c)/n over char
    counts; NULL for empty. Bounds: 0 ≤ H ≤ ln(#distinct chars)."""
    import math

    from chronobase_spark.functions import text as _text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["ent"]
        for r in df.select(
            "doc_id", _text.char_entropy(F.col("text")).alias("ent")
        ).collect()
    }
    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None
            continue
        n = len(t)
        counts = [t.count(c) for c in sorted(set(t))]
        want = (math.log(n) - sum(c * math.log(c) for c in counts) / n) * 1e6
        assert abs(got[i] - want) <= 1, (t, got[i], want)
        assert -1 <= got[i] <= math.log(len(set(t))) * 1e6 + 1


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=12),
        min_size=2,
        max_size=8,
    ),
    rel=st.sampled_from([0.2, 0.5, 0.9]),
)
def test_levenshtein_pairs_match_bruteforce_within_canopy(spark, texts, rel):
    """With a 1-char canopy prefix, every same-prefix pair at or under
    the relative threshold must be returned with the exact DP distance
    — and nothing else."""
    from chronobase_spark.dedup import edit

    from tests.test_dedup import _py_levenshtein

    rows = [(i, t, "xx") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        (r["doc_a"], r["doc_b"]): r["lev_dist"]
        for r in edit.levenshtein_near_pairs(
            df, prefix_len=1, rel_threshold=rel
        ).collect()
    }
    want = {}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            # empty prefixes canopy together too: two empty docs are
            # identical, distance 0 within any budget — a real pair
            if i < j and a[:1] == b[:1]:
                d = _py_levenshtein(a, b)
                if d <= rel * max(len(a), len(b)):
                    want[(i, j)] = d
    assert got == want


# (window-day, score, bucket_n) histograms: tiny score space forces
# many buckets per window; bucket_n 0 is legal (a score class whose
# docs are all empty); several windows exercise the per-window
# independence of the cumulative.
budget_hist_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),     # window index
        st.integers(0, 6),     # score
        st.integers(0, 40),    # bucket tokens
    ),
    min_size=1,
    max_size=30,
)


@given(rows=budget_hist_strategy)
@SETTINGS
def test_finalize_budget_admission_matches_bruteforce(spark, rows):
    """finalize_budget_admission (streaming/docs.py) must reproduce the
    naive per-window rule on arbitrary histograms: budget = tot*3 DIV
    10, inclusive (score desc) cumulative picks full buckets, exactly
    one boundary class crosses (none when the budget swallows every
    bucket — the all-zero-token window), remaining = budget − tokens
    before the boundary. Edge shapes hand tests under-cover: zero
    bucket_n rows, a single bucket, budget landing exactly on a bucket
    edge."""
    import collections

    from chronobase_spark.streaming import docs as docstream

    # collapse duplicate (window, score) pairs like the upstream
    # aggregation would
    hist = collections.defaultdict(int)
    for w, s, n in rows:
        hist[(w, s)] += n
    data = [
        (dt.datetime(2024, 1, 1 + w), s, n, 1)
        for (w, s), n in sorted(hist.items())
    ]
    counts = spark.createDataFrame(
        data, ["window_start", "score", "bucket_n", "n_docs"]
    )
    got = {
        (r["window_start"], r["score"]): (
            r["full_ok"],
            r["is_boundary"],
            r["remaining"],
        )
        for r in docstream.finalize_budget_admission(counts).collect()
    }
    assert len(got) == len(hist)

    for w in {k[0] for k in hist}:
        buckets = sorted(
            ((s, n) for (wi, s), n in hist.items() if wi == w),
            key=lambda x: -x[0],
        )
        budget = sum(n for _, n in buckets) * 3 // 10
        cum = 0
        n_boundary = 0
        for s, n in buckets:
            before, cum = cum, cum + n
            full = cum <= budget
            boundary = before <= budget < cum
            n_boundary += boundary
            rem = budget - before if boundary else None
            key = (dt.datetime(2024, 1, 1 + w), s)
            assert got[key] == (full, boundary, rem), (w, s, got[key])
        assert n_boundary == (1 if budget < cum else 0)


topq_hist_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),           # window day offset
        st.sampled_from(["en", "fr", "de"]),
        st.integers(0, 12),          # score class
        st.integers(1, 40),          # docs in the class
    ),
    min_size=1,
    max_size=30,
)


@given(
    rows=topq_hist_strategy,
    ratio=st.sampled_from([(1, 2), (3, 10), (1, 1), (1, 10)]),
)
@SETTINGS
def test_finalize_topq_admission_matches_bruteforce(spark, rows, ratio):
    """finalize_topq_admission (streaming/docs.py) must reproduce the
    naive per-stratum rule on arbitrary histograms AND arbitrary keep
    ratios: walk the doc scores in desc order until the kept count
    covers num/den of the stratum, extend to all ties of the boundary
    score, and admit exactly the score classes at-or-above that
    boundary. Edge shapes hand tests under-cover: single-class strata,
    all-one-score strata, duplicate (window, lang, score) input rows
    (the accumulated-sink case — fed UN-aggregated to exercise the
    defensive re-aggregate), keep-everything (1/1) and thin (1/10)
    ratios."""
    import collections

    from chronobase_spark.streaming import docs as docstream

    num, den = ratio
    hist = collections.defaultdict(int)
    for w, lang, s, n in rows:
        hist[(w, lang, s)] += n
    # feed raw duplicate rows (not pre-aggregated): the finalize must
    # collapse them itself
    counts = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1 + w), lang, s, n) for w, lang, s, n in rows],
        ["window_start", "lang", "score", "n_docs"],
    )
    got = {
        (r["window_start"], r["lang"], r["score"]): (
            r["n_docs"],
            r["thr"],
            r["admitted"],
        )
        for r in docstream.finalize_topq_admission(
            counts, ratio_num=num, ratio_den=den
        ).collect()
    }
    assert len(got) == len(hist)

    for w, lang in {(k[0], k[1]) for k in hist}:
        classes = sorted(
            ((s, n) for (wi, li, s), n in hist.items()
             if wi == w and li == lang),
            key=lambda x: -x[0],
        )
        total = sum(n for _, n in classes)
        # brute force: desc walk until count·den >= total·num, ties
        # included
        cum, thr = 0, None
        for s, n in classes:
            cum += n
            if cum * den >= total * num:
                thr = s
                break
        for s, n in classes:
            key = (dt.datetime(2024, 1, 1 + w), lang, s)
            assert got[key] == (n, thr, s >= thr), (w, lang, s, got[key])
