"""Driver-session handshake regression test.

The grading driver builds its OWN SparkSession with zero engine configs.
Round 1 shipped a bug where ``events.parquet`` (parquet TIMESTAMP(NANOS))
was only readable under the repo's pre-configured ``get_spark()`` session
— 30/50 graded queries died with PARQUET_TYPE_ILLEGAL. The fix lives in
``catalog.ensure_session_conf`` (runtime ``spark.conf.set`` before any
read). This test runs the driver contract on a truly vanilla session in a
fresh subprocess JVM, so reverting that fix fails CI.

A subprocess is mandatory: inside the pytest JVM the shared SparkContext
already carries the engine's builder configs, so an in-process
``newSession()`` would not reproduce a caller-owned session.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_VANILLA_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Bare session: exactly what the driver does. No engine configs.
spark = (
    SparkSession.builder.appName("vanilla-handshake")
    .master("local[4]")
    .getOrCreate()
)

import __spark_entry__ as mod

# 1) entry() smoke: must return rows on the vanilla session.
rows = mod.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows on a vanilla session"

# 2) an events query (nanos timestamp path) end-to-end at sf0.001.
qs = mod.queries()
n = qs["time_range_scan"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "time_range_scan returned no rows on a vanilla session"

# 3) timezone must have been pinned by the catalog, not left to luck.
assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

# 4) chronotab on a session WITHOUT the Python filter-pushdown conf:
# register_tab_source must not attach pushFilters (Spark errors when the
# conf is off and the method exists), and options-based time pruning
# must still deliver exact results.
import tempfile, os as _os
from chronobase_spark.sources import tabfile as _tab

_d = tempfile.mkdtemp(prefix="vanilla_tab_")
_tab.write_tab_file(
    [(b"k%03d" % i, 1_000 * i, b"v") for i in range(20)],
    _os.path.join(_d, "a.tab"),
    block_size=1,
)
_tab.register_tab_source(spark)
_df = (
    spark.read.format("chronotab")
    .option("start_ts_ns", 5_000)
    .option("end_ts_ns", 9_000)
    .load(_d)
)
_got = sorted(r["ts_ns"] for r in _df.collect())
assert _got == [1_000 * i for i in range(5, 10)], _got
assert _df.rdd.getNumPartitions() <= 7  # pruned from 20 blocks

print("VANILLA_OK", len(rows), n)
spark.stop()
"""


def test_driver_contract_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _VANILLA_SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"vanilla-session driver contract failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
    assert "VANILLA_OK" in proc.stdout
