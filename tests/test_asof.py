"""AS-OF (point-in-time) join: every probe gets the image current as of
its position — inclusive at the position, DELETE = no live image,
"deleted" distinguishable from "never existed", one window instead of a
range join, and the log scan prunes to the probed buckets / position
bound."""

from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.operators.asof import asof_join
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string")]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, _op string, _gtid long")


def _table(spark, tmp_path, name="t"):
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    t.merge(_batch(spark, [
        ("r1", "a", "c1", "INSERT", 10),
        ("r2", "b", "d1", "INSERT", 15),
    ]), batch_id=1, mode="mor")
    t.merge(_batch(spark, [("r1", "a", "c2", "UPDATE", 20)]),
            batch_id=2, mode="mor")
    t.merge(_batch(spark, [("r1", "a", None, "DELETE", 30)]),
            batch_id=3, mode="mor")
    t.merge(_batch(spark, [("r1", "a", "c3", "INSERT", 40)]),
            batch_id=4, mode="mor")
    return t


def _probes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, as_of_gtid long")


def test_asof_semantics_left_and_inner(spark, tmp_path):
    t = _table(spark, tmp_path)
    probes = _probes(spark, [
        ("r1", "a", 5),    # before first event: never existed
        ("r1", "a", 10),   # inclusive at the insert
        ("r1", "a", 25),   # between update and delete
        ("r1", "a", 30),   # inclusive at the delete: deleted as of then
        ("r1", "a", 99),   # after re-insert
        ("r2", "b", 14),   # before this key's insert
        ("r3", "z", 50),   # key never in the table
    ])
    got = {(r["repo"], r["path"], r["as_of_gtid"]):
           (r["commit"], r["_match_gtid"], r["_match_op"])
           for r in t.asof_join(probes).collect()}
    assert got == {
        ("r1", "a", 5): (None, None, None),
        ("r1", "a", 10): ("c1", 10, "INSERT"),
        ("r1", "a", 25): ("c2", 20, "UPDATE"),
        ("r1", "a", 30): (None, None, "DELETE"),
        ("r1", "a", 99): ("c3", 40, "INSERT"),
        ("r2", "b", 14): (None, None, None),
        ("r3", "z", 50): (None, None, None),
    }
    inner = t.asof_join(probes, how="inner").collect()
    assert sorted(r["as_of_gtid"] for r in inner) == [10, 25, 99]
    # pushdown off must give the identical answer (full-log plan)
    full = {(r["repo"], r["path"], r["as_of_gtid"]):
            (r["commit"], r["_match_gtid"], r["_match_op"])
            for r in t.asof_join(probes, keyset_pushdown_max=0).collect()}
    assert full == got


def test_asof_same_gtid_max_seq_wins(spark, tmp_path):
    # two rows of ONE multi-row event (same _gtid, ordered by _seq): the
    # as-of image at that position is the max-_seq row — the lake's own
    # LWW sub-order, not first-seen
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA,
                         ["repo", "path"], num_buckets=2)
    ch = spark.createDataFrame(
        [("r1", "a", "first", "INSERT", 10, 100),
         ("r1", "a", "second", "UPDATE", 10, 200)],
        "repo string, path string, commit string, _op string, "
        "_gtid long, _seq long")
    t.merge(ch, batch_id=1, mode="mor")
    got = t.asof_join(_probes(spark, [("r1", "a", 10)])).collect()
    assert got[0]["commit"] == "second" and got[0]["_match_gtid"] == 10


def test_asof_fold_caveat_and_keep_rows(spark, tmp_path):
    # compaction folds history: the surviving image keeps its ORIGINAL
    # (_gtid, _seq), so probes at/after it still match; probes below the
    # fold see nothing (the documented retention window)
    t = _table(spark, tmp_path, "t3")
    t.compact()
    log = t.events_log().collect()
    assert {r["_op"] for r in log} <= {"KEEP"}
    got = {r["as_of_gtid"]: (r["commit"], r["_match_op"])
           for r in t.asof_join(_probes(spark, [
               ("r1", "a", 25),   # below r1/a's surviving gtid 40: folded away
               ("r1", "a", 40),   # at the surviving image
               ("r2", "b", 15),   # r2/b's image survived at its original 15
           ])).collect()}
    assert got[25] == (None, None)
    assert got[40] == ("c3", "KEEP")
    assert got[15] == ("d1", "KEEP")


def test_asof_truncate_kills_prior_history(spark, tmp_path):
    t = _table(spark, tmp_path, "t4")
    t.merge(_batch(spark, [("r9", "x", "n1", "INSERT", 50)]),
            batch_id=5, mode="mor",
            extra_properties={"truncate_gtid": "35"})
    got = {r["as_of_gtid"]: r["commit"]
           for r in t.asof_join(_probes(spark, [
               ("r1", "a", 25), ("r1", "a", 99), ("r9", "x", 60)])).collect()}
    assert got == {25: None, 99: "c3", 60: "n1"}


def test_asof_bucket_and_pos_pruning(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t5"), SCHEMA,
                         ["repo", "path"], num_buckets=8)
    rows = [(f"r{i}", f"f{i}", f"c{i}", "INSERT", i + 1) for i in range(32)]
    t.merge(_batch(spark, rows), batch_id=1, mode="mor")
    t.merge(_batch(spark, [(f"r{i}", f"f{i}", f"u{i}", "UPDATE", 100 + i)
                           for i in range(32)]), batch_id=2, mode="mor")
    probes = _probes(spark, [("r3", "f3", 500), ("r7", "f7", 500)])
    out = t.asof_join(probes)
    assert {(r["repo"], r["commit"]) for r in out.collect()} == \
        {("r3", "u3"), ("r7", "u7")}
    # the plan opened ONLY the probed keys' buckets' files
    opened = set(out.inputFiles())
    by_bucket = {}
    for fi in t.snapshot.files:
        by_bucket.setdefault(fi["bucket"], []).append(fi["path"])
    probed = {b for b, paths in by_bucket.items()
              if any(any(p.endswith(x) for x in paths) for p in opened)}
    assert len(probed) < len(by_bucket)
    # pos_max drops commits entirely above the bound (stamped envelopes)
    bounded = t.asof_join(probes, pos_max=50)
    assert {r["commit"] for r in bounded.collect()} == {"c3", "c7"}
    n_files = len(set(bounded.inputFiles()))
    assert n_files < len(set(out.inputFiles()))


def test_asof_operator_contract_errors(spark, tmp_path):
    t = _table(spark, tmp_path, "t6")
    import pytest
    with pytest.raises(ValueError, match="collide"):
        t.asof_join(spark.createDataFrame(
            [("r1", "a", 5, "x")],
            "repo string, path string, as_of_gtid long, commit string"))
    with pytest.raises(ValueError, match="position column"):
        asof_join(t.events_log(),
                  spark.createDataFrame([("r1", "a")], "repo string, path string"),
                  ["repo", "path"])
    with pytest.raises(ValueError, match="key columns"):
        t.asof_join(spark.createDataFrame([(1,)], "x long"))
    with pytest.raises(ValueError, match="how"):
        t.asof_join(_probes(spark, [("r1", "a", 5)]), how="outer")
    with pytest.raises(ValueError, match="internals"):
        asof_join(t.events_log(), spark.createDataFrame(
            [("r1", "a", 5, 1)],
            "repo string, path string, as_of_gtid long, _t int"),
            ["repo", "path"])


def test_asof_plan_one_exchange_no_join(spark, tmp_path):
    """The documented plan shape, pinned: the probes+log union flows
    through exactly ONE hash exchange into the window — no join node of
    any kind, no range-join blowup, no per-probe jobs."""
    import re

    ev = spark.createDataFrame(
        [("k1", "v1", 10, 1, "INSERT")],
        "k string, val string, _gtid long, _seq long, _op string")
    probes = spark.createDataFrame([("k1", 15)], "k string, as_of_gtid long")
    plan = (asof_join(ev, probes, ["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert not re.findall(r"\w*Join\w*", plan), plan


import pytest

from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner
from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig

FULL_SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
               ("lang", "string"), ("content", "string")]


@pytest.mark.parametrize("seed,n,nr,np_,t10k,buckets", [
    (23, 1500, 3, 5, 0, 2),    # tiny keyspace: deep per-key histories
    (29, 2500, 60, 80, 40, 8), # truncate-dense: marker kills old probes
])
def test_randomized_asof_matches_python_oracle(spark, tmp_path, seed, n,
                                               nr, np_, t10k, buckets):
    """Seeded randomized property: for random streams and random probe
    positions (including beyond-max and pre-history), asof_join equals a
    pure-Python per-key replay-to-position oracle — the same protocol as
    test_property_replay, extended with the time axis."""
    stream = synthetic_changestream(
        spark, n, n_repos=nr, n_paths=np_, seed=seed,
        truncate_per_10k=t10k, with_truncate=t10k > 0)
    table = LakeTable.create(spark, str(tmp_path / "t"), FULL_SCHEMA,
                             ["repo", "path"], num_buckets=buckets)
    ReplayRunner(spark, table, batch_span=max(n // 5, 1),
                 config=ApplyConfig(auto_compact_deltas=None)).run(stream)
    trunc = int(table.snapshot.properties.get("truncate_gtid", "-1"))

    events = [
        {"gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
         "schema_name": r["schema_name"],
         "row": (r["after"] or r["before"]).asDict()
         if (r["after"] or r["before"]) else None}
        for r in stream.collect()
    ]
    dml = sorted(
        (e for e in events
         if e["op"] in ("INSERT", "UPDATE", "DELETE")
         and e["schema_name"] == "repos" and e["table_name"] == "files"),
        key=lambda e: e["gtid"])
    by_key = {}
    for e in dml:
        by_key.setdefault((e["row"]["repo"], e["row"]["path"]), []).append(e)

    keys = sorted(by_key)[::3]
    probe_rows, expected = [], {}
    for i, (repo, path) in enumerate(keys):
        g = (seed * 7919 + i * 104729) % (n + n // 5)
        probe_rows.append((repo, path, g))
        winner = None
        for e in by_key[(repo, path)]:
            if e["gtid"] <= g and e["gtid"] > trunc:
                winner = e
        if winner is None:
            expected[(repo, path, g)] = (None, None, None)
        elif winner["op"] == "DELETE":
            expected[(repo, path, g)] = (None, None, "DELETE")
        else:
            expected[(repo, path, g)] = (
                winner["row"]["commit"], winner["gtid"], winner["op"])
    probes = spark.createDataFrame(
        probe_rows, "repo string, path string, as_of_gtid long")
    got = {(r["repo"], r["path"], r["as_of_gtid"]):
           (r["commit"], r["_match_gtid"], r["_match_op"])
           for r in table.asof_join(probes).collect()}
    assert got == expected


def test_cli_asof(spark, tmp_path):
    """The asof CLI subcommand (in-process main(); spark-submit surface
    covered by the journey test) answers the single-probe form, both
    modes: a live image, and a deleted-as-of-then probe."""
    import contextlib
    import io
    import json

    from th2_listener_mysql_binlog_go_spark.__main__ import main

    _table(spark, tmp_path, "tcli")  # the CLI loads it fresh

    def run(at):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["asof", "--table", str(tmp_path / "tcli"),
                       "--values", "r1,a", "--at", str(at)])
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    live = run(25)
    assert live["rows"][0]["commit"] == "c2"
    assert live["rows"][0]["_match_op"] == "UPDATE"
    dead = run(30)
    assert dead["rows"][0]["commit"] is None
    assert dead["rows"][0]["_match_op"] == "DELETE"


def test_asof_carry_through_and_plain_operator(spark, tmp_path):
    # the pure-function form works on any event-shaped DF, and probe
    # carry-through columns (a label, an event id) survive untouched
    ev = spark.createDataFrame(
        [("k1", "v1", 10, 1, "INSERT"), ("k1", "v2", 20, 1, "UPDATE")],
        "k string, val string, _gtid long, _seq long, _op string")
    probes = spark.createDataFrame(
        [("k1", 15, "label-x", 7)],
        "k string, as_of_gtid long, label string, evt_id int")
    got = asof_join(ev, probes, ["k"]).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["val"], r["label"], r["evt_id"], r["_match_gtid"]) == \
        ("v1", "label-x", 7, 10)
