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
    count, offsets, and last keys (reference index.go:61-131). Damaged
    framing raises ValueError naming the file — the reference's
    ErrCorruptData contract (pkg/db/errors.go), never a cryptic
    short-read struct error and never garbage rows."""
    with open(path, "rb") as fh:
        fh.seek(0, io.SEEK_END)
        size = fh.tell()
        if size < 16:
            raise ValueError(f"{path}: {size} bytes — too short for a tablet footer")
        fh.seek(-8, io.SEEK_END)
        (index_offset,) = struct.unpack(">q", fh.read(8))
        if not 0 <= index_offset <= size - 16:
            raise ValueError(
                f"{path}: corrupt footer (index offset {index_offset}, "
                f"file is {size} bytes)"
            )
        fh.seek(index_offset)
        (block_count,) = struct.unpack(">q", fh.read(8))
        if block_count <= 0:
            raise ValueError(f"{path}: invalid block count {block_count}")
        if index_offset + 8 + 8 * block_count > size - 8:
            raise ValueError(
                f"{path}: corrupt index (claims {block_count} blocks past EOF)"
            )
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


def block_first_ts(path: str, offset: int) -> int:
    """First row's ts_unix_nanos of one block, WITHOUT decompressing the
    whole block: gzip is a stream, so feeding the decompressor ~4 KiB of
    compressed bytes yields (far) more than the 12+keyLen output bytes
    the header needs. Rows are (ts, key)-sorted within a tablet
    (tablet.go:124-132), so this is the block's MINIMUM ts — and block
    i's maximum is bounded by block i+1's first ts, which is what makes
    footer-driven time pruning sound (see _prune_blocks)."""
    import zlib

    d = zlib.decompressobj(wbits=31)  # 31 = gzip container
    out = b""
    with open(path, "rb") as fh:
        fh.seek(offset)
        (clen,) = struct.unpack(">q", fh.read(8))
        remaining = clen
        while remaining > 0:
            chunk = fh.read(min(4096, remaining))
            if not chunk:
                break
            remaining -= len(chunk)
            out += d.decompress(chunk)
            if len(out) >= 4:
                (key_len,) = struct.unpack_from(">I", out, 0)
                if len(out) >= 4 + key_len + 8:
                    (ts_ns,) = struct.unpack_from(">Q", out, 4 + key_len)
                    return ts_ns
    raise ValueError(f"{path}@{offset}: truncated block header")


def _prune_blocks(
    first_ts: list[int], lo: int | None, hi: int | None
) -> list[int]:
    """Indices of blocks that may intersect [lo, hi] (ns, inclusive;
    None = unbounded), given each block's first-row ts in file order.

    Sound because rows sort by (ts, key) across a tablet: block i's min
    ts IS first_ts[i], and its max ts is ≤ first_ts[i+1]. Keep block i
    unless its min exceeds `hi`, or an upper bound on its max
    (first_ts[i+1]) falls below `lo` — conservative in both directions,
    so pruning can only skip provably-empty blocks, never rows."""
    keep = []
    m = len(first_ts)
    for i in range(m):
        if hi is not None and first_ts[i] > hi:
            continue
        if lo is not None and i + 1 < m and first_ts[i + 1] < lo:
            continue
        keep.append(i)
    return keep


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

    from pyspark.sql.datasource import (
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    class _TabReader(DataSourceReader):
        """Reader with footer-driven TIME PRUNING — the feature the
        reference's own block index was built for but never wired
        (tablet.go:349-350 reads every block regardless). Bounds on
        ``ts_ns`` arrive via Spark's filter pushdown (pushFilters) or
        the explicit ``start_ts_ns``/``end_ts_ns`` load options; blocks
        provably outside the range are never scheduled as partitions.
        Pushed filters are NOT consumed (all are returned as
        unsupported), so Spark still applies them row-wise — pruning is
        purely a partition-count optimization and can never change
        results. Planning reads ~4 KiB per block on the driver (the
        partial-gzip first-ts probe); a deployment with millions of
        blocks would move the probe into a planning job, the same
        escalation path Parquet footers take."""

        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("chronotab: .load(path) is required")
            self.lo = self._opt_int(options, "start_ts_ns")
            self.hi = self._opt_int(options, "end_ts_ns")

        @staticmethod
        def _opt_int(options, key):
            v = options.get(key)
            return int(v) if v is not None else None

        def partitions(self):
            root = Path(self.root)
            files = (
                sorted(root.rglob("*.tab")) if root.is_dir() else [root]
            )
            parts = []
            for f in files:
                idx = read_tab_index(str(f))
                offsets = idx.block_offsets
                if self.lo is not None or self.hi is not None:
                    first = [block_first_ts(str(f), off) for off in offsets]
                    offsets = [
                        offsets[i]
                        for i in _prune_blocks(first, self.lo, self.hi)
                    ]
                parts.extend(_BlockPartition(str(f), off) for off in offsets)
            return parts

        def read(self, partition):
            import datetime as dt

            epoch = dt.datetime(1970, 1, 1)
            lo, hi = self.lo, self.hi
            for key, ts_ns, data in read_block(
                partition.path, partition.offset
            ):
                # Row-level bound check: block pruning is conservative
                # (boundary blocks survive), so the explicit
                # start/end_ts_ns options are made EXACT here; when the
                # bounds came from pushFilters instead this is a cheap
                # no-op duplicate of the filter Spark re-applies.
                if (lo is not None and ts_ns < lo) or (
                    hi is not None and ts_ns > hi
                ):
                    continue
                # integer µs truncation (floats drift ~0.2µs at current
                # epochs) — the same ns→µs semantics the catalog applies
                # to parquet TIMESTAMP(NANOS)
                ts = epoch + dt.timedelta(microseconds=ts_ns // 1000)
                yield (key, ts, ts_ns, data)

    def _push_filters(self, filters):
        for f in filters:
            if getattr(f, "attribute", None) == ("ts_ns",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, GreaterThan):
                    b = f.value + 1
                    self.lo = b if self.lo is None else max(self.lo, b)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = f.value if self.lo is None else max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    b = f.value - 1
                    self.hi = b if self.hi is None else min(self.hi, b)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = f.value if self.hi is None else min(self.hi, f.value)
            yield f  # never consumed: Spark re-applies row-wise

    # Spark 4.1 ERRORS if a reader defines pushFilters while
    # spark.sql.python.filterPushdown.enabled is false (the default),
    # so the method is attached only when the session opted in —
    # get_spark() does; a vanilla session still prunes via the
    # start_ts_ns/end_ts_ns load options.
    if (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        == "true"
    ):
        _TabReader.pushFilters = _push_filters

    from pyspark.sql.datasource import DataSourceStreamReader

    class _TabStreamReader(DataSourceStreamReader):
        """Micro-batch STREAMING over a directory of ``.tab`` tablets —
        the reference's ingest lifecycle (flush drops an immutable
        sorted tablet into the data dir, reference tablet.go:124-132)
        replayed as a Structured Streaming source, so the whole
        document pipeline (scrub → signatures → LM scoring,
        streaming/docs.py) can ride tablet arrival directly instead of
        requiring a parquet conversion hop.

        Offset = the sorted list of tablet file paths already ingested
        (tablets are immutable once flushed, so file arrival is the
        only progress dimension; JSON-serializable and monotone — files
        are only ever appended to the offset). Each micro-batch plans
        ONE SPARK TASK PER BLOCK of each newly discovered tablet — the
        identical partition unit (and decode path) as the batch reader,
        so batch and stream read bit-identical rows. Writers must drop
        tablets atomically (write temp + rename), the reference's own
        flush discipline — a half-written file would be scanned once
        and never re-read."""

        def __init__(self, options):
            self.root = options.get("path")
            if not self.root:
                raise ValueError("chronotab: .load(path) is required")

        def _list(self) -> list[str]:
            root = Path(self.root)
            files = root.rglob("*.tab") if root.is_dir() else [root]
            return sorted(str(p) for p in files)

        def initialOffset(self) -> dict:
            return {"seen": []}

        def latestOffset(self) -> dict:
            return {"seen": self._list()}

        def partitions(self, start: dict, end: dict):
            done = set(start.get("seen", []))
            parts = []
            for f in end.get("seen", []):
                if f in done:
                    continue
                parts.extend(
                    _BlockPartition(f, off)
                    for off in read_tab_index(f).block_offsets
                )
            return parts

        def read(self, partition):
            import datetime as dt

            epoch = dt.datetime(1970, 1, 1)
            for key, ts_ns, data in read_block(
                partition.path, partition.offset
            ):
                # same integer ns→µs truncation as the batch reader
                ts = epoch + dt.timedelta(microseconds=ts_ns // 1000)
                yield (key, ts, ts_ns, data)

        def commit(self, end):
            pass  # progress lives in the checkpoint's offset log

    class ChronoTabDataSource(DataSource):
        @classmethod
        def name(cls):
            return "chronotab"

        def schema(self):
            return schema

        def reader(self, schema):  # noqa: ARG002 — fixed schema source
            return _TabReader(self.options)

        def streamReader(self, schema):  # noqa: ARG002 — fixed schema
            return _TabStreamReader(self.options)

    spark.dataSource.register(ChronoTabDataSource)
