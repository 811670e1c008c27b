"""Registry/scheduler contract tests — the driver-facing invariants that
don't need a SparkSession."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronobase_spark import queries as q  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs, oracles = q.queries(), q.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())


def test_queries_and_oracles_share_order():
    """The driver grades a prefix by pairing the two dicts by name; both
    must enumerate in the same (priority) order."""
    qnames = [n for n in q.queries() if n in q.oracle_sql()]
    assert qnames == list(q.oracle_sql())


def test_never_green_queries_sort_first():
    """Grading-window scheduler: every query lacking green evidence in
    recorded CORRECTNESS files must precede every query that has it —
    except the documented _FORCE_REGRADE set (green rows recorded
    against superseded code), which is allowed to front-run."""
    rounds, green = q._recorded_green()
    names = list(q.queries())
    if not green or rounds == 0:
        return  # fresh checkout — nothing to schedule around
    seen_plain_green = False
    for n in names:
        if n in green and n not in q._FORCE_REGRADE:
            seen_plain_green = True
        elif n not in green:
            assert not seen_plain_green, (
                f"pending query {n!r} sorted after a green one"
            )


def test_rows_only_queries_are_documented_set():
    """Exactly the engine-hash/RNG queries may lack an oracle; a new
    query accidentally registered without SQL should fail here, not
    silently downgrade to a rows-only check."""
    no_oracle = set(q.queries()) - set(q.oracle_sql())
    assert no_oracle == {
        "minhash_dedup_pairs",
        "simhash_near_pairs",
        "approx_distinct_users",
        "approx_value_percentiles",
        "sketch_rollup_users",
        "mad_outliers_approx",
    }
