"""Backfill -> tail handoff: a table bootstrapped by ReplayRunner (archive
backfill) handed to the Structured Streaming shell with
``resume_from_table=True``. The two runners use different batch-id
sequences, so the handoff pins an epoch base (streamed sub-ids must clear
the backfill's ``last_batch_id`` guard — otherwise early epochs are
silently SKIPPED) and a gtid floor (the archive/live overlap must not
re-append — it would pollute ``key_history`` and lineage). The pin lives
in ``<checkpoint_dir>/handoff.json`` and never moves on restart, because
a later file-paced epoch may legally carry older-gtid events."""

import json
import os

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    CHANGE_SCHEMA,
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import (
    CatalogReplayRunner,
    ReplayRunner,
)
from th2_listener_mysql_binlog_go_spark.streaming.structured import (
    StreamingApplier,
    StreamingCatalogApplier,
)

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _oracle_events(stream_df):
    return [
        {
            "gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
            "before": r["before"].asDict() if r["before"] else None,
            "after": r["after"].asDict() if r["after"] else None,
        }
        for r in stream_df.collect()
    ]


def test_handoff_replay_to_streaming(spark, tmp_path):
    """Archive backfill (5 replay batches) then a live tail whose epoch
    ids (0, 1) are all BELOW the backfill's batch count — without the
    pinned epoch base every epoch would be skipped by the sub-batch
    guard; without the gtid floor the archive/live overlap would
    re-append. Final state must equal the oracle of the full stream and
    an overlapped key's audit history must hold each event exactly once."""
    full = synthetic_changestream(spark, 4000, n_repos=25, n_paths=50,
                                  truncate_per_10k=0)
    cfg = ApplyConfig(auto_compact_deltas=None)  # full event retention

    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, table, batch_span=500, config=cfg).run(
        full.filter("gtid < 2500"))
    assert table.last_batch_id // 1024 == 4  # 5 backfill batches

    live = str(tmp_path / "live")
    full.filter("gtid >= 2000").coalesce(1).write.parquet(live)  # one epoch: 0
    base_before = table.last_batch_id // 1024 + 1
    floor_before = table.watermark_gtid
    assert floor_before >= 2000  # the live dir genuinely overlaps

    sa = StreamingApplier(spark, table, config=cfg)
    ckpt = str(tmp_path / "ckpt")
    q = sa.start(live, ckpt, CHANGE_SCHEMA, available_now=True,
                 max_files_per_trigger=1, resume_from_table=True)
    q.awaitTermination(300)

    pin = json.load(open(os.path.join(ckpt, "handoff.json")))
    assert pin == {"epoch_base": base_before, "gtid_floor": floor_before}

    expected = state_fingerprint(replay_oracle(_oracle_events(full)))
    got = df_fingerprint([r.asDict() for r in table.read().collect()])
    assert got == expected

    # an overlapped key's audit view holds each of its events exactly once
    dml = full.filter(
        (F.col("table_name") == "files")
        & F.col("op").isin("INSERT", "UPDATE", "DELETE"))
    key_row = (dml.select(
        F.coalesce(F.col("after.repo"), F.col("before.repo")).alias("repo"),
        F.coalesce(F.col("after.path"), F.col("before.path")).alias("path"),
        "gtid")
        .groupBy("repo", "path")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("gtid").alias("lo"), F.max("gtid").alias("hi"))
        .filter((F.col("lo") < 2000) & (F.col("hi") >= 2500))
        .orderBy(F.desc("n"), "repo", "path").first())
    hist = table.key_history(key_row["repo"], key_row["path"]).collect()
    assert len(hist) == key_row["n"]
    gtids = [r["_gtid"] for r in hist]
    assert gtids == sorted(gtids) and len(set(gtids)) == len(gtids)


def test_handoff_pin_survives_restart_and_late_older_epochs(spark, tmp_path):
    """The pinned floor must NOT be re-captured on restart: after the
    first drain the watermark has advanced past events a later file-paced
    epoch legally carries (an out-of-order segment). A re-captured floor
    would silently drop them; the pin keeps the original handoff floor."""
    full = synthetic_changestream(spark, 4000, n_repos=25, n_paths=50,
                                  truncate_per_10k=0)
    cfg = ApplyConfig(auto_compact_deltas=None)

    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, table, batch_span=500, config=cfg).run(
        full.filter("gtid < 2500"))

    live, ckpt = str(tmp_path / "live"), str(tmp_path / "ckpt")
    # first live file skips ahead: gtid 3000+ (watermark will reach ~3999)
    full.filter("gtid >= 3000").coalesce(1).write.parquet(live)
    sa = StreamingApplier(spark, table, config=cfg)
    sa.start(live, ckpt, CHANGE_SCHEMA, available_now=True,
             resume_from_table=True).awaitTermination(300)
    pin1 = json.load(open(os.path.join(ckpt, "handoff.json")))
    assert table.watermark_gtid > pin1["gtid_floor"]

    # a LATER epoch carries the OLDER window 2500-2999 (file-paced source)
    full.filter("gtid >= 2500 and gtid < 3000").coalesce(1) \
        .write.mode("append").parquet(live)
    table2 = LakeTable.load(spark, table.root)
    sa2 = StreamingApplier(spark, table2, config=cfg)
    sa2.start(live, ckpt, CHANGE_SCHEMA, available_now=True,
              resume_from_table=True).awaitTermination(300)

    assert json.load(open(os.path.join(ckpt, "handoff.json"))) == pin1
    expected = state_fingerprint(replay_oracle(_oracle_events(full)))
    got = df_fingerprint([r.asDict() for r in table2.read().collect()])
    assert got == expected


def test_catalog_handoff_replay_to_streaming(spark, tmp_path):
    """Multi-table handoff: CatalogReplayRunner backfill, then the catalog
    streaming shell tails a live dir whose epochs all fall below the
    backfill's batch ids. Both observed tables must equal a one-shot
    full-stream replay."""
    stream = synthetic_changestream(spark, 3000, n_repos=30, n_paths=50,
                                    with_truncate=False)
    cfg = ApplyConfig(observed={"repos": ["files", "shadow_table"]},
                      num_buckets=4)

    def mk(root):
        cat = LakeCatalog.create(spark, root)
        cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
        cat.create_table("repos", "shadow_table", SCHEMA, ["repo", "path"], num_buckets=4)
        return cat

    cat_full = mk(str(tmp_path / "full"))
    CatalogReplayRunner(spark, cat_full, batch_span=600, config=cfg).run(stream)

    cat = mk(str(tmp_path / "handoff"))
    CatalogReplayRunner(spark, cat, batch_span=600, config=cfg).run(
        stream.filter("gtid < 1800"))

    live = str(tmp_path / "live")
    stream.filter("gtid >= 1500").coalesce(1).write.parquet(live)
    sca = StreamingCatalogApplier(spark, cat, config=cfg)
    q = sca.start(live, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
                  available_now=True, max_files_per_trigger=1,
                  resume_from_table=True)
    q.awaitTermination(300)

    for name in ("files", "shadow_table"):
        want = df_fingerprint(
            [r.asDict() for r in cat_full.get("repos", name).read().collect()])
        got = df_fingerprint(
            [r.asDict() for r in cat.get("repos", name).read().collect()])
        assert got == want, name


def test_handoff_floor_exempts_query_shaped_truncate(spark, tmp_path):
    """The truncate marker only commits with its batch's FINAL segment, so
    a mid-batch-crash backfill can leave an unapplied TRUNCATE below the
    handoff floor — and raw binlog sources carry truncates as op='QUERY'
    statements, not pre-classified rows. The floor filter must pass them
    (replay is monotonic-max safe) while still dropping other DDL
    (review finding)."""
    from th2_listener_mysql_binlog_go_spark.streaming.structured import (
        _handoff_filtered,
    )

    ddl = ("gtid long, op string, ddl string")
    rows = [
        (100, "INSERT", None),                                   # overlap DML
        (520, "QUERY", "TRUNCATE TABLE repos.files;"),           # must pass
        (530, "QUERY", "ALTER TABLE repos.files ADD COLUMN x INT"),  # drop
        (540, "TRUNCATE", "TRUNCATE TABLE repos.files;"),        # must pass
        (700, "INSERT", None),                                   # above floor
    ]
    out = _handoff_filtered(spark.createDataFrame(rows, ddl), 600).collect()
    assert sorted(r["gtid"] for r in out) == [520, 540, 700]

    # end-to-end: the exempt QUERY-truncate below the floor still commits
    # its marker, killing the overlap rows it covers
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    pre = spark.createDataFrame(
        [("r", "a", "c1", "py", "x", "INSERT", 100),
         ("r", "b", "c2", "go", "y", "INSERT", 510),
         ("r", "c", "c3", "rs", "z", "INSERT", 600)],
        "repo string, path string, commit string, lang string, "
        "content string, _op string, _gtid long")
    t.merge(pre, batch_id=1, mode="mor")          # crashed batch's segments
    assert t.watermark_gtid == 600                # truncate never committed

    live = str(tmp_path / "live")
    full = synthetic_changestream(spark, 100, n_repos=5, n_paths=10,
                                  truncate_per_10k=0)
    # live dir: the missed QUERY-shaped TRUNCATE@520 + new events re-keyed
    # above the floor
    trunc_row = spark.createDataFrame(
        [(520, "bl.1", 520, 0, 0, "repos", "files", "QUERY", None, None,
          "TRUNCATE TABLE repos.files;")],
        "gtid long, log_name string, log_pos long, seq long, ts long, "
        "schema_name string, table_name string, op string, "
        "before struct<repo:string,path:string,commit:string,lang:string,"
        "content:string>, after struct<repo:string,path:string,"
        "commit:string,lang:string,content:string>, ddl string")
    tail = full.withColumn("gtid", F.col("gtid") + 1000) \
               .withColumn("log_pos", F.col("log_pos") + 1000)
    trunc_row.unionByName(tail.select(*trunc_row.columns)) \
        .coalesce(1).write.parquet(live)

    sa = StreamingApplier(spark, t)
    sa.start(live, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
             available_now=True,
             resume_from_table=True).awaitTermination(300)
    # rows at or below the recovered marker (520) are dead; 600 survives
    left = {(r["repo"], r["path"]) for r in
            t.read().select("repo", "path").collect()
            if r["path"] in ("a", "b", "c")}
    assert left == {("r", "c")}


def test_catalog_handoff_refuses_mid_batch_crash(spark, tmp_path):
    """The catalog watermark only advances after a whole batch commits;
    a table watermark past it proves a mid-batch crash, where a pinned
    floor would re-append the already-applied tail of that batch. The
    handoff must refuse and point at resuming the backfill (review
    finding)."""
    stream = synthetic_changestream(spark, 1000, n_repos=10, n_paths=20,
                                    with_truncate=False)
    cfg = ApplyConfig(observed={"repos": ["files", "shadow_table"]},
                      num_buckets=4)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
    cat.create_table("repos", "shadow_table", SCHEMA, ["repo", "path"],
                     num_buckets=4)
    CatalogReplayRunner(spark, cat, batch_span=400, config=cfg).run(
        stream, max_batches=1)
    # simulate the crash window: one table's merge of batch 2 committed,
    # the catalog progress update did not
    cat.get("repos", "files").merge(
        spark.createDataFrame(
            [("r", "x", "c", "py", "v", "INSERT", 450)],
            "repo string, path string, commit string, lang string, "
            "content string, _op string, _gtid long"),
        batch_id=2 * 1024, mode="mor")

    live = str(tmp_path / "live")
    stream.filter("gtid >= 300").coalesce(1).write.parquet(live)
    sca = StreamingCatalogApplier(spark, cat, config=cfg)
    with pytest.raises(ValueError, match="mid-batch"):
        sca.start(live, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
                  available_now=True, resume_from_table=True)


# seed, n_events, archive_hi, live_lo, live slice order, truncate_per_10k
HANDOFF_CASES = [
    (7, 3000, 2000, 1500, [0, 1, 2], 0),    # plain overlap, in-order epochs
    (11, 3000, 1800, 1500, [2, 1, 0], 20),  # reversed epochs + truncates
    (13, 2400, 1200, 0, [1, 2, 0], 10),     # live re-covers the FULL archive
    (17, 2000, 2000, 1500, [0, 1, 2], 0),   # live adds nothing new
]


@pytest.mark.parametrize("seed,n,ahi,llo,order,t10k", HANDOFF_CASES)
def test_randomized_handoff_matches_oracle(spark, tmp_path, seed, n, ahi,
                                           llo, order, t10k):
    """Seeded randomized handoff property: for several stream shapes —
    overlap widths, out-of-order live epochs, truncate density, a live
    dir that re-covers the whole archive, a live dir with nothing new —
    backfill + handed-off tail always converges to the full-stream
    oracle."""
    full = synthetic_changestream(spark, n, n_repos=20, n_paths=40,
                                  seed=seed, truncate_per_10k=t10k,
                                  with_truncate=t10k > 0)
    table = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                             ["repo", "path"], num_buckets=4)
    ReplayRunner(spark, table, batch_span=max(1, ahi // 4)).run(
        full.filter(f"gtid < {ahi}"))

    live = str(tmp_path / "live")
    span = (n - llo) // 3 or 1
    wrote = False
    for i in order:
        lo = llo + i * span
        hi = n if i == 2 else llo + (i + 1) * span
        sl = full.filter(f"gtid >= {lo} and gtid < {hi}")
        if sl.limit(1).count():
            sl.coalesce(1).write.mode("append").parquet(live)
            wrote = True
    if not wrote:
        pytest.skip("degenerate slice plan")

    sa = StreamingApplier(spark, table)
    sa.start(live, str(tmp_path / "ckpt"), CHANGE_SCHEMA,
             available_now=True, max_files_per_trigger=1,
             resume_from_table=True).awaitTermination(300)

    expected = state_fingerprint(replay_oracle(_oracle_events(full)))
    got = df_fingerprint([r.asDict() for r in table.read().collect()])
    assert got == expected
