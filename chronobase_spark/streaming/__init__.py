"""Streaming ingest & maintenance — the reference's storage lifecycle
(memtable → flush → merge → TTL; reference pkg/db/db.go:195-249) as
Structured Streaming plus scheduled batch jobs.
"""

from chronobase_spark.streaming import ingest, maintenance  # noqa: F401
