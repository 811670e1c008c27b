"""Driver simulation: exercise the exact contract the driver runs —
import __spark_entry__, smoke entry(spark), then run every query at
sf0.01 against its DuckDB oracle (the t2 gate), rows-only otherwise."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as mod
from pyspark.sql import SparkSession
from tests.oracle_harness import compare, duck_connection

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional argv[2]: comma-separated query names — verify just an edited
# subset without paying the full 165-query sweep
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
# FAITHFUL to the driver: a bare session with ZERO engine configs — the
# engine must repair session state itself (catalog.ensure_session_conf).
# Using the repo's own get_spark() here is exactly how the round-1 nanos
# handshake bug shipped ungraded.
spark = SparkSession.builder.appName("driver-sim").master("local[16]").getOrCreate()

rows = mod.entry(spark).collect()
print(f"entry: {len(rows)} rows :: {rows[:2]}")
assert len(rows) > 0

qs, oracles = mod.queries(), mod.oracle_sql()
con = duck_connection(SF)
failed = []
for name in sorted(qs):
    if ONLY is not None and name not in ONLY:
        continue
    t0 = time.perf_counter()
    if name in oracles:
        problems = compare(qs[name](spark, SF), con.execute(oracles[name]).fetchdf(), name)
        status = "MATCH" if not problems else "MISMATCH"
        if problems: failed.append((name, problems))
    else:
        n = qs[name](spark, SF).count()
        status = f"rows-only n={n}"
    print(f"{name:28s} {status:12s} {time.perf_counter()-t0:6.1f}s")
for name, problems in failed:
    print("FAIL", name, problems)
print(f"\n{len(qs)} queries, {len(oracles)} with oracle, {len(failed)} mismatches")
sys.exit(1 if failed else 0)
