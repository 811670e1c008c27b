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
