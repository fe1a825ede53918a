"""Binlog-shaped change-event streams (the engine's S1 "source" operator).

The reference tails a live MySQL binlog
(/root/reference/component/listener/listener.go:115-155). This sandbox has
no MySQL, so the source is a GTID-ordered change-event *table* with the
exact event model of FIXTURES.md §2 — the same shape a binlog decoder
(Debezium-style) would land. Two generators:

- :func:`synthetic_changestream` — fully distributed generation from
  ``spark.range`` with hash-derived pseudo-randomness: no driver-side
  materialization, deterministic for a given (n_events, seed), scales to
  10^10 rows on a cluster (each executor generates its own id range).
  Builds in hot-key skew, multi-change keys, DELETE→INSERT resurrection,
  TRUNCATEs, unobserved tables, and non-matching query events.

- :func:`derived_changestream` — a stream *derived from the driver's
  ``events`` parquet table with arithmetic-only SQL* (no engine-specific
  hash functions), so the identical SQL text runs in DuckDB for the
  correctness oracle. Used by ``__spark_entry__.queries()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Flat change-event schema (FIXTURES.md §2). before/after are kept flat
# (prefixed) rather than nested structs in the derived stream so DuckDB
# value-hash comparison sees identical primitive columns.
CHANGE_SCHEMA = (
    "gtid bigint, log_name string, log_pos bigint, seq bigint, ts bigint, "
    "schema_name string, table_name string, op string, "
    "before struct<repo:string,path:string,commit:string,lang:string,content:string>, "
    "after struct<repo:string,path:string,commit:string,lang:string,content:string>, "
    "ddl string"
)

_LANGS = ["py", "go", "java", "ts", "rs", "sql", "md"]


def synthetic_changestream(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 200,
    n_paths: int = 500,
    seed: int = 42,
    with_truncate: bool = True,
    truncate_per_10k: int = 1,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic, distributed change stream of ``n_events`` rows.

    Event mix mirrors FIXTURES.md §2 (~60/30/9/~1 I/U/D/other); ~2% of
    rows target an unobserved table (exercising the table filter,
    listener.go:236-240); ~0.5% are non-matching query statements that the
    DDL classifier must drop (listener.go:254-256); TRUNCATE rate is
    ``truncate_per_10k``/10k (default ~0.01%, a realistic DDL cadence).
    Hot-key skew: half of all DML lands on ~1% of repos.
    """
    rng = spark.range(0, n_events, 1, n_partitions or spark.sparkContext.defaultParallelism)
    h = lambda k: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)))  # noqa: E731

    t_rate = truncate_per_10k * 10 if with_truncate else 0
    m = h(1) % 100000
    op = (
        F.when(m < 60000, "INSERT")
        .when(m < 90000, "UPDATE")
        .when(m < 99000, "DELETE")
        .when(m < 99000 + t_rate, "TRUNCATE")
        .otherwise("QUERY_OTHER")  # becomes a non-matching statement
    )
    hot = (h(2) % 1000) < 500
    n_hot = max(1, n_repos // 100)
    repo_id = F.when(hot, h(3) % n_hot).otherwise(h(3) % n_repos)
    path_id = h(4) % n_paths
    repo = F.concat(F.lit("org"), (repo_id % 97).cast("string"), F.lit("/proj"), repo_id.cast("string"))
    path = F.concat(
        F.lit("src/pkg"), (path_id % 13).cast("string"), F.lit("/mod_"), path_id.cast("string"),
        F.element_at(F.array(*[F.lit("." + x) for x in _LANGS]), (h(5) % 7 + 1).cast("int")),
    )
    lang = F.element_at(F.array(*[F.lit(x) for x in _LANGS]), (h(5) % 7 + 1).cast("int"))
    md5 = F.md5(F.concat(repo, F.lit("@"), path, F.lit("@"), F.col("id").cast("string")))
    commit = F.concat(md5, F.substring(md5, 1, 8))
    content = F.concat(F.lit("c:"), F.repeat(F.substring(md5, 1, 16), (3 + h(6) % 100).cast("int")))

    row = F.struct(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        lang.alias("lang"), content.alias("content"),
    )
    null_row = F.lit(None).cast(
        "struct<repo:string,path:string,commit:string,lang:string,content:string>"
    )
    is_dml = op.isin("INSERT", "UPDATE", "DELETE")
    unobserved = is_dml & ((h(7) % 50) == 0)

    df = rng.select(
        F.col("id").alias("gtid"),
        F.concat(F.lit("binlog."), F.lpad((F.col("id") / 100000).cast("bigint").cast("string"), 6, "0")).alias("log_name"),
        ((F.col("id") % 100000) * 256 + 4).alias("log_pos"),
        (F.col("id") / 3).cast("bigint").alias("seq"),
        (F.lit(1700000000000000000) + F.col("id") * 1000000).alias("ts"),
        F.lit("repos").alias("schema_name"),
        F.when(unobserved, "shadow_table").otherwise(F.when(is_dml, "files").otherwise("files")).alias("table_name"),
        F.when(op == "QUERY_OTHER", "QUERY").otherwise(op).alias("op"),
        F.when(op.isin("UPDATE", "DELETE"), row).otherwise(null_row).alias("before"),
        F.when(op.isin("INSERT", "UPDATE"), row).otherwise(null_row).alias("after"),
        F.when(op == "TRUNCATE", F.lit("TRUNCATE TABLE repos.files;"))
        .when(op == "QUERY_OTHER", F.lit("SET SESSION sql_mode='STRICT_TRANS_TABLES'"))
        .otherwise(F.lit(None).cast("string")).alias("ddl"),
    )
    return df


def composite_gtid(log_name_col, log_pos_col):
    """Total order from the reference's (name, pos) checkpoint token
    (/root/reference/README.md:62; ROTATE handling listener.go:183-189):
    the numeric binlog-file suffix shifted above any possible byte offset,
    plus the within-file position. A file rollover (ROTATE) resets pos to
    ~4 but increments the suffix, so the composite stays strictly
    monotonic across rotations — use it as the engine's ``gtid`` for
    binlog-native sources that carry only (name, pos). Pure Catalyst
    (regexp compiled once by codegen). Max pos per file is bounded by
    max_binlog_size (<= 1 GiB in MySQL), far under the 2^40 shift."""
    idx = F.regexp_extract(log_name_col, r"(\d+)\s*$", 1).cast("bigint")
    return idx * F.lit(1 << 40) + log_pos_col.cast("bigint")


# --------------------------------------------------------------------------
# Oracle-parity derived stream: identical SQL text runs in Spark and DuckDB.
# Arithmetic/md5/CASE only — no xxhash64, no engine-specific functions.
# Ops: m = event_id % 1000 → <600 INSERT, <900 UPDATE, else DELETE.
# Hot-key skew: half of events land on 5 repos, rest on 50.
# --------------------------------------------------------------------------

DERIVED_STREAM_SQL = """
SELECT
  event_id AS gtid,
  CASE WHEN (event_id % 1000) < 600 THEN 'INSERT'
       WHEN (event_id % 1000) < 900 THEN 'UPDATE'
       ELSE 'DELETE' END AS op,
  'repos' AS schema_name,
  CASE WHEN (event_id % 53) = 0 THEN 'shadow_table' ELSE 'files' END AS table_name,
  'repo_' || CAST(CASE WHEN (event_id % 100) < 50 THEN user_id % 5
                       ELSE user_id % 50 END AS STRING) AS repo,
  'src/f' || CAST((event_id * 37) % 211 AS STRING) || '.py' AS path,
  md5(CAST(event_id AS STRING)) ||
    substring(md5(CAST(event_id AS STRING)), 1, 8) AS commit,
  CASE (event_id % 7) WHEN 0 THEN 'py' WHEN 1 THEN 'go' WHEN 2 THEN 'java'
       WHEN 3 THEN 'ts' WHEN 4 THEN 'rs' WHEN 5 THEN 'sql'
       ELSE 'md' END AS lang,
  'c:' || md5('content' || CAST(event_id AS STRING)) AS content
FROM events
""".strip()


# Two-observed-table variant (multi-table routing, listener.go:236-241):
# odd event_ids target a second table 'files2'; same arithmetic-only SQL
# runs verbatim in Spark and DuckDB.
_TABLE_CASE = "CASE WHEN (event_id % 53) = 0 THEN 'shadow_table' ELSE 'files' END AS table_name"
_MULTI_TABLE_CASE = (
    "CASE WHEN (event_id % 53) = 0 THEN 'shadow_table' "
    "WHEN (event_id % 2) = 0 THEN 'files' ELSE 'files2' END AS table_name"
)
DERIVED_MULTI_STREAM_SQL = DERIVED_STREAM_SQL.replace(_TABLE_CASE, _MULTI_TABLE_CASE)
assert "files2" in DERIVED_MULTI_STREAM_SQL, "table-case slot moved in DERIVED_STREAM_SQL"


# DDL-bearing variant: deterministic TRUNCATE events (every 2500 gtids) and
# ALTER TABLE ADD COLUMN stars (at gtid 9100 mod 10000) interleaved with the
# DML — puts the engine's hardest logic (GTID-marker truncate, batch
# segmentation at ALTER boundaries, schema evolution mid-stream) into the
# hash-verified oracle path. The last TRUNCATE lands BEFORE the first ALTER
# so the converged state exercises both stars=NULL (winner wrote pre-ALTER)
# and stars=value (winner wrote post-ALTER) rows. Arithmetic-only SQL, runs
# verbatim in Spark and DuckDB.
DERIVED_DDL_STREAM_SQL = """
SELECT
  event_id AS gtid,
  CASE WHEN (event_id % 2500) = 1250 THEN 'TRUNCATE'
       WHEN (event_id % 10000) = 9100 THEN 'ALTER_TABLE'
       WHEN (event_id % 1000) < 600 THEN 'INSERT'
       WHEN (event_id % 1000) < 900 THEN 'UPDATE'
       ELSE 'DELETE' END AS op,
  'repos' AS schema_name,
  'files' AS table_name,
  'repo_' || CAST(user_id % 20 AS STRING) AS repo,
  'src/f' || CAST((event_id * 37) % 97 AS STRING) || '.py' AS path,
  md5(CAST(event_id AS STRING)) ||
    substring(md5(CAST(event_id AS STRING)), 1, 8) AS commit,
  CASE (event_id % 7) WHEN 0 THEN 'py' WHEN 1 THEN 'go' WHEN 2 THEN 'java'
       WHEN 3 THEN 'ts' WHEN 4 THEN 'rs' WHEN 5 THEN 'sql'
       ELSE 'md' END AS lang,
  'c:' || md5('content' || CAST(event_id AS STRING)) AS content,
  CAST(event_id % 89 AS INT) AS stars,
  CASE WHEN (event_id % 2500) = 1250 THEN 'TRUNCATE TABLE repos.files'
       WHEN (event_id % 10000) = 9100
         THEN 'ALTER TABLE repos.files ADD COLUMN stars INT'
       ELSE NULL END AS ddl
FROM events
""".strip()


# Multi-event-per-GTID variant for the batched wire format: each GTID
# (transaction) carries FOUR events at distinct log_pos with mixed ops and
# mixed target tables — event e=0 INSERT(files) x2 rows, e=1 DELETE(files2)
# x2, e=2 INSERT(files) x2, e=3 UPDATE(files) x2. This is exactly the shape
# that corrupts a GTID-grouped encoder (the round-2 defect): the reference
# publishes one bean per RowsEvent (listener.go:229-244), so an encoder
# must keep the four events as four (or more, after splitting) payloads.
# seq is the within-transaction row counter; bcommit is the UPDATE rows'
# distinct Before image. Arithmetic-only SQL, runs verbatim in DuckDB.
DERIVED_WIRE_STREAM_SQL = """
SELECT
  CAST((event_id - (event_id % 8)) / 8 AS BIGINT) AS gtid,
  CAST(4 + (((event_id % 8) - (event_id % 2)) / 2) * 128 AS BIGINT) AS log_pos,
  CAST(event_id % 8 AS BIGINT) AS seq,
  CASE CAST(((event_id % 8) - (event_id % 2)) / 2 AS BIGINT)
       WHEN 0 THEN 'INSERT' WHEN 1 THEN 'DELETE'
       WHEN 2 THEN 'INSERT' ELSE 'UPDATE' END AS op,
  'repos' AS schema_name,
  CASE CAST(((event_id % 8) - (event_id % 2)) / 2 AS BIGINT)
       WHEN 1 THEN 'files2' ELSE 'files' END AS table_name,
  'repo_' || CAST(user_id % 40 AS STRING) AS repo,
  'src/f' || CAST((event_id * 37) % 211 AS STRING) || '.py' AS path,
  md5(CAST(event_id AS STRING)) ||
    substring(md5(CAST(event_id AS STRING)), 1, 8) AS commit,
  md5('b' || CAST(event_id AS STRING)) AS bcommit,
  CASE (event_id % 7) WHEN 0 THEN 'py' WHEN 1 THEN 'go' WHEN 2 THEN 'java'
       WHEN 3 THEN 'ts' WHEN 4 THEN 'rs' WHEN 5 THEN 'sql'
       ELSE 'md' END AS lang,
  'c:' || md5('content' || CAST(event_id AS STRING)) AS content
FROM events
""".strip()


def derived_changestream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run DERIVED_STREAM_SQL over ``{sf_dir}/events.parquet`` in Spark."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(DERIVED_STREAM_SQL)


def to_change_schema(
    flat: DataFrame,
    row_fields: list[tuple[str, str]] | None = None,
    with_ddl: bool = False,
) -> DataFrame:
    """Flat derived-stream rows -> the nested CHANGE_SCHEMA envelope
    (before/after structs per op, FIXTURES.md §2) the apply path consumes.

    ``row_fields`` widens the payload struct beyond the default 5-column
    repo table (e.g. a ``stars int`` column riding a schema-evolution
    stream); ``with_ddl`` passes the flat stream's ``ddl`` statement
    through instead of NULL."""
    fields = row_fields or [("repo", "string"), ("path", "string"),
                            ("commit", "string"), ("lang", "string"),
                            ("content", "string")]
    row = F.struct(*[F.col(n).cast(t).alias(n) for n, t in fields])
    null_row = F.lit(None).cast(
        "struct<" + ",".join(f"{n}:{t}" for n, t in fields) + ">"
    )
    return flat.select(
        "gtid",
        F.concat(F.lit("binlog."), F.lpad((F.col("gtid") / 100000).cast("bigint").cast("string"), 6, "0")).alias("log_name"),
        ((F.col("gtid") % 100000) * 256 + 4).alias("log_pos"),
        (F.col("gtid") / 3).cast("bigint").alias("seq"),
        (F.lit(1700000000000000000) + F.col("gtid") * 1000000).alias("ts"),
        "schema_name",
        "table_name",
        "op",
        F.when(F.col("op").isin("UPDATE", "DELETE"), row).otherwise(null_row).alias("before"),
        F.when(F.col("op").isin("INSERT", "UPDATE"), row).otherwise(null_row).alias("after"),
        (F.col("ddl") if with_ddl else F.lit(None)).cast("string").alias("ddl"),
    )


def write_gtid_partitioned(
    stream: DataFrame,
    path: str,
    partition_span: int,
    partition_col: str = "gtid_span",
    mode: str = "overwrite",
) -> None:
    """Materialize a change stream as a GTID-range-partitioned parquet
    archive: hive dirs ``{partition_col}=N`` with ``N = gtid //
    partition_span`` — the binlog-segment layout a real deployment's
    archiver produces. A ReplayRunner given the matching
    (``partition_col``, ``partition_span``) then reads ONLY each batch's
    spans: partition pruning at planning time, so per-batch scan cost is
    O(batch), independent of archive length (a 10^10-event archive's file
    listing never enters a batch's scan). Size ``partition_span`` so a
    partition holds ~1 parquet file per executor-core wave."""
    (
        stream.withColumn(partition_col,
                          F.floor(F.col("gtid") / partition_span).cast("bigint"))
        .write.partitionBy(partition_col).mode(mode).parquet(path)
    )
