"""Reader/writer for the reference engine's native ``.tab`` tablet files
— the migration path: a user of the reference can point this engine at
an existing data directory and query it, or export back.

Format (implemented from the reference's documented layout, NOT a code
port — byte layout per reference internal/storage/tablet.go:203-281
(write), tablet.go:403-425 (row serialization), index.go:23-58 (index),
compression.go:43-76 (gzip per block, no codec header)):

* file  := block* index index_offset:int64_be
* block := compressed_len:int64_be gzip(payload)
* payload := row*
* row   := key_len:u32_be key ts_unix_nanos:u64_be data_len:u32_be data
* index := block_count:int64_be block_offset:int64_be*
           (key_len:int64_be last_key)*

Rows within a flushed tablet are sorted by (timestamp, key)
(tablet.go:124-132).

Spark integration is a Spark 4 Python DataSource whose input partitions
are (file, block) pairs: a directory of tablets scans with one task per
block — the reference's single-threaded full-file read
(tablet.go:331-376) becomes an embarrassingly parallel scan, and the
footer index that the reference kept but never used for pruning
(tablet.go:349-350 reads all blocks anyway) is what makes the split
possible.
"""

from __future__ import annotations

import gzip
import io
import struct
from dataclasses import dataclass
from pathlib import Path


@dataclass
class TabIndex:
    block_offsets: list[int]
    last_keys: list[bytes]


def read_tab_index(path: str) -> TabIndex:
    """Parse the footer index: seek -8 for the index offset, then block
    count, offsets, and last keys (reference index.go:61-131)."""
    with open(path, "rb") as fh:
        fh.seek(-8, io.SEEK_END)
        (index_offset,) = struct.unpack(">q", fh.read(8))
        fh.seek(index_offset)
        (block_count,) = struct.unpack(">q", fh.read(8))
        if block_count <= 0:
            raise ValueError(f"{path}: invalid block count {block_count}")
        offsets = list(
            struct.unpack(f">{block_count}q", fh.read(8 * block_count))
        )
        last_keys = []
        for _ in range(block_count):
            (key_len,) = struct.unpack(">q", fh.read(8))
            last_keys.append(fh.read(key_len))
        return TabIndex(offsets, last_keys)


def read_block(path: str, offset: int) -> list[tuple[bytes, int, bytes]]:
    """One block → [(key, ts_unix_nanos, data)] (reference
    tablet.go:308-328 + 428-462)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        (clen,) = struct.unpack(">q", fh.read(8))
        payload = gzip.decompress(fh.read(clen))
    rows = []
    pos = 0
    n = len(payload)
    while pos < n:
        (key_len,) = struct.unpack_from(">I", payload, pos)
        pos += 4
        key = payload[pos : pos + key_len]
        pos += key_len
        (ts_ns,) = struct.unpack_from(">Q", payload, pos)
        pos += 8
        (data_len,) = struct.unpack_from(">I", payload, pos)
        pos += 4
        data = payload[pos : pos + data_len]
        pos += data_len
        rows.append((key, ts_ns, data))
    return rows


def read_tab_rows(path: str):
    """All rows of one tablet file, block by block."""
    idx = read_tab_index(path)
    for off in idx.block_offsets:
        yield from read_block(path, off)


def write_tab_file(
    rows: list[tuple[bytes, int, bytes]], path: str, block_size: int = 64 * 1024
) -> None:
    """Write a tablet in the reference's layout (the EXPORT direction of
    the migration path; also the fixture generator for reader tests —
    no Go toolchain ships in this environment, so fidelity rests on the
    byte-layout citations above). Rows sort by (ts, key) exactly like a
    flushed tablet (tablet.go:124-132); blocks split when the estimated
    serialized size would exceed ``block_size`` with at least one row
    buffered (tablet.go:229-249)."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    with open(path, "wb") as fh:
        offsets: list[int] = []
        last_keys: list[bytes] = []

        def flush(block: list[tuple[bytes, int, bytes]]) -> None:
            payload = b"".join(
                struct.pack(">I", len(k))
                + k
                + struct.pack(">Q", ts)
                + struct.pack(">I", len(d))
                + d
                for k, ts, d in block
            )
            compressed = gzip.compress(payload, compresslevel=1)
            offsets.append(fh.tell())
            fh.write(struct.pack(">q", len(compressed)))
            fh.write(compressed)
            last_keys.append(block[-1][0])

        block: list[tuple[bytes, int, bytes]] = []
        size = 0
        for k, ts, d in ordered:
            row_size = 4 + len(k) + 8 + 4 + len(d)
            if size + row_size > block_size and block:
                flush(block)
                block, size = [], 0
            block.append((k, ts, d))
            size += row_size
        if block:
            flush(block)

        index_offset = fh.tell()
        fh.write(struct.pack(">q", len(offsets)))
        for off in offsets:
            fh.write(struct.pack(">q", off))
        for key in last_keys:
            fh.write(struct.pack(">q", len(key)))
            fh.write(key)
        fh.write(struct.pack(">q", index_offset))


def write_tab_dir(
    df, path: str, block_size: int = 64 * 1024, partitions: int | None = None
) -> int:
    """Distributed export of a DataFrame to a DIRECTORY of reference-
    layout tablets — the scale version of :func:`write_tab_file` (which
    buffers every row on the driver and only suits fixtures). ``df``
    must have columns ``key: binary``, ``ts_ns: long``, ``data:
    binary``; anything else is a caller bug and fails in the select.

    Shape: range-partition on ``ts_ns`` so each tablet covers a
    disjoint time range (the reference's flush cadence produces exactly
    that, tablet.go:124-132 — a flushed tablet is one sorted time
    slice), then each partition writes ONE ``part-NNNNN.tab`` via the
    driver-side writer running ON THE EXECUTOR over its partition's
    rows only — per-task memory is one partition, never the dataset.
    Executors must share ``path`` (true in local mode and on any
    cluster exporting to shared/NFS storage — the migration target is
    the reference's own data directory, which is single-machine by
    design, reference pkg/db/db.go).

    Returns the number of rows written (also the one Spark action).
    """
    import os

    from pyspark import TaskContext
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)
    slim = df.select("key", "ts_ns", "data")
    if partitions:
        slim = slim.repartitionByRange(partitions, "ts_ns")
    else:
        slim = slim.repartitionByRange("ts_ns")

    def _write_partition(batches):
        import pandas as pd

        rows: list[tuple[bytes, int, bytes]] = []
        for pdf in batches:
            rows.extend(
                (bytes(k), int(t), bytes(d))
                for k, t, d in zip(pdf["key"], pdf["ts_ns"], pdf["data"])
            )
        if rows:
            pid = TaskContext.get().partitionId()
            write_tab_file(
                rows, os.path.join(path, f"part-{pid:05d}.tab"), block_size
            )
        yield pd.DataFrame({"n": [len(rows)]})

    counts = slim.mapInPandas(_write_partition, "n long")
    return counts.agg(F.sum("n")).collect()[0][0] or 0


def register_tab_source(spark) -> None:
    """Register the ``chronotab`` Spark DataSource on this session.

    ``spark.read.format("chronotab").load(dir_or_file)`` then scans
    every ``.tab`` tablet with ONE SPARK TASK PER BLOCK — the block
    list comes from each file's footer index at planning time (driver
    reads 8 bytes + the index per file; row data is only touched on
    executors)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("key", BinaryType()),
            StructField("ts", TimestampType()),
            StructField("ts_ns", LongType()),
            StructField("data", BinaryType()),
        ]
    )

    class _BlockPartition(InputPartition):
        def __init__(self, path: str, offset: int):
            self.path = path
            self.offset = offset

    class _TabReader(DataSourceReader):
        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("chronotab: .load(path) is required")

        def partitions(self):
            root = Path(self.root)
            files = (
                sorted(root.rglob("*.tab")) if root.is_dir() else [root]
            )
            parts = []
            for f in files:
                idx = read_tab_index(str(f))
                parts.extend(
                    _BlockPartition(str(f), off) for off in idx.block_offsets
                )
            return parts

        def read(self, partition):
            import datetime as dt

            epoch = dt.datetime(1970, 1, 1)
            for key, ts_ns, data in read_block(
                partition.path, partition.offset
            ):
                # integer µs truncation (floats drift ~0.2µs at current
                # epochs) — the same ns→µs semantics the catalog applies
                # to parquet TIMESTAMP(NANOS)
                ts = epoch + dt.timedelta(microseconds=ts_ns // 1000)
                yield (key, ts, ts_ns, data)

    class ChronoTabDataSource(DataSource):
        @classmethod
        def name(cls):
            return "chronotab"

        def schema(self):
            return schema

        def reader(self, schema):  # noqa: ARG002 — fixed schema source
            return _TabReader(self.options)

    spark.dataSource.register(ChronoTabDataSource)
