"""`python -m chronobase_spark` — the reference's demo server loop as a
CLI (reference cmd/dbserver/main.go:21-121: load config or fall back to
defaults, open the DB, ensure a `metrics` table, insert a row, query the
surrounding hour back, print stats, shut down cleanly).

The reference then idles until a shutdown signal; a Spark batch session
has nothing to wait for, so this exits after the round trip. Streaming
ingest/maintenance (the reference's background tickers) are started
explicitly via chronobase_spark.streaming when a deployment needs them.
"""

from __future__ import annotations

import argparse
import datetime as dt
import logging
import sys

log = logging.getLogger("chronobase_spark.demo")


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="python -m chronobase_spark")
    p.add_argument("--config", default=None, help="JSON engine config path")
    p.add_argument("--data-dir", default=None, help="override config data_dir")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from chronobase_spark.config import EngineConfig, load_config
    from chronobase_spark.db import ChronoSpark, TableExistsError

    if args.config:
        cfg = load_config(args.config)
        log.info("config loaded from %s", args.config)
    else:
        cfg = EngineConfig()
        log.info("no config given; using defaults")
    data_dir = args.data_dir or cfg.data_dir

    if spark is None:
        from chronobase_spark.session import get_spark

        spark = get_spark(
            app_name="chronobase-demo", extra_conf=cfg.to_spark_conf()
        )

    with ChronoSpark(spark, data_dir) as db:
        try:
            db.create_table("metrics", ttl_seconds=24 * 3600)
            log.info("created table metrics")
        except TableExistsError:
            log.info("table metrics already exists, continuing")

        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        db.insert(
            "metrics",
            [{"key": "test1", "ts": now, "value": 1.0, "data": "example data"}],
        )
        log.info("insert completed")

        rows = db.query(
            "metrics", now - dt.timedelta(hours=1), now + dt.timedelta(hours=1)
        ).collect()
        log.info("found %d results", len(rows))
        for i, r in enumerate(rows):
            log.info("result %d: %s", i, r.asDict())

        stats = db.get_stats("metrics")
        log.info("stats: %s", stats)
    log.info("closed")
    return 0 if rows else 1


if __name__ == "__main__":
    sys.exit(main())
