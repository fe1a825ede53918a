"""PySpark-native CDC / incremental-ingest engine.

A brand-new Spark-first engine with the capabilities of the reference
``th2-net/th2-listener-mysql-binlog-go`` (a Go MySQL-binlog CDC listener,
surveyed in /root/repo/SURVEY.md) extended to the *apply* side per the
north rule: replay a GTID-ordered, binlog-shaped change stream
(INSERT/UPDATE/DELETE row events + DDL query events) into snapshot-versioned
lake tables with exactly-once semantics, last-writer-wins dedup, schema
evolution, per-batch lineage, and explicit partitioning/skew handling.

Layout
------
- ``sources``    synthetic binlog-shaped change streams (distributed,
                 deterministic generators) + raw-JSON bean payload variant
- ``functions``  vectorized decode (from_json / pandas UDFs), DDL
                 classification, text analysis, dedup & similarity functions
- ``operators``  LWW dedup, update pairing, size/split planning, batch apply
- ``plans``      the snapshot-pointer lake table format (bucketed parquet,
                 column-id schema evolution, copy-on-write merge)
- ``streaming``  micro-batch replay runner, Structured Streaming shell,
                 checkpoint/resume, lineage
"""

__version__ = "0.1.0"
