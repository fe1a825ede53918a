"""Round-6 optimization: ReplayRunner.run(bounds=...) — the caller-supplied
(min,max) gtid that skips the discovery aggregation — must plan the exact
same batches and converge to the exact same state as the discovered path.
"""

import os

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig
from th2_listener_mysql_binlog_go_spark.plans.catalog import LakeCatalog
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import (
    CatalogReplayRunner,
    ReplayRunner,
)

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _state(table):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in table.read().collect())


@pytest.fixture(scope="module")
def stream(spark):
    s = synthetic_changestream(spark, 20_000, with_truncate=False).persist()
    s.count()
    yield s
    s.unpersist()


def test_bounds_param_equals_discovered(spark, tmp_path, stream):
    b = stream.agg(F.min("gtid").alias("lo"), F.max("gtid").alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])

    t_disc = LakeTable.create(spark, str(tmp_path / "disc"), SCHEMA,
                              key_cols=["repo", "path"], num_buckets=4)
    m_disc = ReplayRunner(spark, t_disc, batch_span=5000).run(stream)

    t_given = LakeTable.create(spark, str(tmp_path / "given"), SCHEMA,
                               key_cols=["repo", "path"], num_buckets=4)
    m_given = ReplayRunner(spark, t_given, batch_span=5000,
                           pipeline_depth=3).run(stream, bounds=(lo, hi))

    assert m_given["batches"] == m_disc["batches"]
    assert m_given["events"] == m_disc["events"]
    assert m_given["watermark_gtid"] == m_disc["watermark_gtid"]
    assert _state(t_given) == _state(t_disc)

    # resumed run with bounds clamps exactly like the discovered path
    m2 = ReplayRunner(spark, LakeTable.load(spark, t_given.root),
                      batch_span=5000).run(stream, bounds=(lo, hi))
    assert m2.get("clamped") and m2["events"] == 0


def test_bounds_param_catalog(spark, tmp_path, stream):
    b = stream.agg(F.min("gtid").alias("lo"), F.max("gtid").alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    cfg = ApplyConfig(observed={"repos": ["files"]}, num_buckets=4)

    cats = []
    for name, kw in (("disc", {}), ("given", {"bounds": (lo, hi)})):
        cat = LakeCatalog.create(spark, str(tmp_path / f"cat_{name}"))
        cat.create_table("repos", "files", SCHEMA, ["repo", "path"], num_buckets=4)
        CatalogReplayRunner(spark, cat, batch_span=5000, config=cfg).run(stream, **kw)
        cats.append(cat)
    disc, given = cats
    assert _state(given.get("repos", "files")) == _state(disc.get("repos", "files"))
    assert given.properties.get("watermark_gtid") == disc.properties.get("watermark_gtid")
