"""Out-of-band corrections: `delete_where` (compliance / contamination
removal) and `update_where` (redaction) — one delta commit per call,
stamped (gtid = effective watermark, seq = 2^62 + correction#*2^21) so the
rows outrank every applied stream row, lose to any later stream event,
and leave replay bookkeeping (watermark / last_batch_id) untouched."""

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.plans.lake import (
    CORRECTION_SEQ_BASE,
    LakeTable,
)
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint, replay_oracle, state_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def _events(df):
    return [
        {"gtid": r["gtid"], "op": r["op"], "table_name": r["table_name"],
         "before": r["before"].asDict() if r["before"] else None,
         "after": r["after"].asDict() if r["after"] else None}
        for r in df.collect()
    ]


def _apply_onto(state: dict, events: list[dict]) -> dict:
    """Continue the python oracle from an existing state (replay_oracle
    always starts fresh); the test streams carry no TRUNCATE/PK-change."""
    for e in sorted(events, key=lambda e: e["gtid"]):
        if e.get("table_name", "files") != "files":
            continue
        b, a = e.get("before"), e.get("after")
        if e["op"] == "INSERT" or e["op"] == "UPDATE":
            state[(a["repo"], a["path"])] = dict(a)
        elif e["op"] == "DELETE":
            state.pop((b["repo"], b["path"]), None)
    return state


def _mk(spark, tmp_path, n=3000):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    full = synthetic_changestream(spark, n, n_repos=12, n_paths=25,
                                  truncate_per_10k=0)
    return t, full


def test_update_where_rhs_sees_pre_update_row(spark, tmp_path):
    """SQL UPDATE SET semantics: every assignment's RHS evaluates against
    the PRE-update row, so a swap/archive pattern keeps the original
    value (sequential withColumn would let dict order decide — review
    finding), and a lossy-typed assignment raises instead of silently
    committing NULLs (the write path's cast is non-ANSI)."""
    t, full = _mk(spark, tmp_path, n=1500)
    ReplayRunner(spark, t, batch_span=1000).run(full)
    originals = {(r["repo"], r["path"]): r["commit"]
                 for r in t.read().filter("lang = 'py'").collect()}
    t.update_where("lang = 'py'", {"commit": "'REDACTED'",
                                   "content": "commit"})
    got = t.read().filter("lang = 'py'").collect()
    assert originals and all(r["commit"] == "REDACTED" for r in got)
    # content archived the ORIGINAL commit, not the rewritten literal
    assert {(r["repo"], r["path"]): r["content"] for r in got} == originals

    # lossy-typed assignment on a non-string column raises up front
    ti = LakeTable.create(spark, str(tmp_path / "ti"),
                          [("k", "string"), ("stars", "int")], ["k"],
                          num_buckets=2)
    ti.merge(spark.createDataFrame(
        [("a", 5, "INSERT", 1)], "k string, stars int, _op string, _gtid long"),
        batch_id=1, mode="mor")
    with pytest.raises(ValueError, match="lossy cast"):
        ti.update_where("k = 'a'", {"stars": "'REDACTED'"})
    # widening (int -> bigint literal into int? no: int expr into int) and
    # NULL literals stay allowed
    assert ti.update_where("k = 'a'", {"stars": "stars + 1"})["rows"] == 1
    assert ti.read().first()["stars"] == 6


def test_delete_where_matches_oracle_and_preserves_bookkeeping(spark, tmp_path):
    t, full = _mk(spark, tmp_path)
    ReplayRunner(spark, t, batch_span=1000).run(full)
    wm, lb, v0 = t.watermark_gtid, t.last_batch_id, t.snapshot.version

    r = t.delete_where("lang = 'go'")
    st = replay_oracle(_events(full))
    victims = {k for k, row in st.items() if row.get("lang") == "go"}
    assert r["rows"] == len(victims) > 0
    assert r["gtid"] == wm and r["seq"] == CORRECTION_SEQ_BASE
    # replay bookkeeping untouched; snapshot advanced by exactly one
    assert t.watermark_gtid == wm and t.last_batch_id == lb
    assert t.snapshot.version == v0 + 1

    expected = {k: row for k, row in st.items() if k not in victims}
    assert df_fingerprint([x.asDict() for x in t.read().collect()]) \
        == state_fingerprint(expected)

    # correction visible per key: the audit's last row is the DELETE in
    # the reserved seq band, and no row is current (key deleted)
    k = sorted(victims)[0]
    hist = t.key_history(*k).collect()
    assert hist and not any(h["_is_current"] for h in hist)
    assert hist[-1]["_op"] == "DELETE" \
        and hist[-1]["_seq"] >= CORRECTION_SEQ_BASE

    # zero matches: no commit, no version bump, no counter burn
    v1 = t.snapshot.version
    r2 = t.delete_where("lang = 'no-such-lang'")
    assert r2["skipped"] and t.snapshot.version == v1


def test_later_stream_events_beat_a_correction(spark, tmp_path):
    """A resumed tail re-inserts corrected keys: the correction must lose
    to any strictly-later gtid (and the runner's bookkeeping must be
    oblivious to the correction commit)."""
    t, _ = _mk(spark, tmp_path)
    full = synthetic_changestream(spark, 4000, n_repos=12, n_paths=25,
                                  truncate_per_10k=0)
    pre = full.filter("gtid < 2500")
    post = full.filter("gtid >= 2500")
    ReplayRunner(spark, t, batch_span=1000).run(pre)
    t.delete_where("lang = 'go'")
    ReplayRunner(spark, t, batch_span=1000).run(full)  # resumes past 2499

    st = replay_oracle(_events(pre))
    st = {k: row for k, row in st.items() if row.get("lang") != "go"}
    expected = _apply_onto(st, _events(post))
    assert df_fingerprint([x.asDict() for x in t.read().collect()]) \
        == state_fingerprint(expected)


def test_update_where_redacts_and_guards_keys(spark, tmp_path):
    t, full = _mk(spark, tmp_path)
    ReplayRunner(spark, t, batch_span=1000).run(full)

    r = t.update_where("lang = 'py'", {"content": "md5(content)",
                                       "commit": "'REDACTED'"})
    st = replay_oracle(_events(full))
    n_py = sum(1 for row in st.values() if row.get("lang") == "py")
    assert r["rows"] == n_py > 0

    import hashlib
    expected = {
        k: (dict(row, content=hashlib.md5(row["content"].encode()).hexdigest(),
                 commit="REDACTED")
            if row.get("lang") == "py" else row)
        for k, row in st.items()
    }
    assert df_fingerprint([x.asDict() for x in t.read().collect()]) \
        == state_fingerprint(expected)

    with pytest.raises(ValueError, match="key columns"):
        t.update_where("lang = 'py'", {"repo": "'x'"})
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_where("lang = 'py'", {"nope": "'x'"})


def test_correction_propagates_to_view_and_feed(spark, tmp_path):
    """Downstream surfaces must SEE a correction: an incremental
    aggregate view's refresh drops the kill-listed group (via the diff
    fallback), and the changes feed re-publishes the corrected window so
    a wire consumer converges to the corrected state."""
    from th2_listener_mysql_binlog_go_spark.plans.matview import (
        IncrementalAggView,
    )
    from th2_listener_mysql_binlog_go_spark.streaming.structured import (
        ChangesFeedPublisher,
        StreamingWireApplier,
    )

    t, full = _mk(spark, tmp_path, n=1200)
    ReplayRunner(spark, t, batch_span=600).run(full)
    view = IncrementalAggView.create(spark, t, str(tmp_path / "v"),
                                     dims=["lang"], aggs={"n": ("count",)},
                                     num_buckets=2)
    feed = ChangesFeedPublisher(spark, t.root, str(tmp_path / "q"),
                                max_size=1 << 16)
    feed.poll()  # bootstrap: current state as INSERT beans

    t.delete_where("lang = 'go'")
    t.update_where("lang = 'py'", {"commit": "'REDACTED'"})

    view.refresh()
    langs = {r["lang"]: r["n"] for r in view.read().collect()}
    assert "go" not in langs
    assert langs == {
        r["lang"]: r["cnt"] for r in
        t.read().groupBy("lang").agg(F.count("*").alias("cnt")).collect()}

    m = feed.poll()
    assert m["payloads"] > 0
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA,
                          ["repo", "path"], num_buckets=4)
    q = StreamingWireApplier(spark, t2).start(
        str(tmp_path / "q"), str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)
    assert df_fingerprint([x.asDict() for x in t2.read().collect()]) \
        == df_fingerprint([x.asDict() for x in t.read().collect()])


def test_correction_composes_with_changes_and_compaction(spark, tmp_path):
    t, full = _mk(spark, tmp_path, n=2000)
    ReplayRunner(spark, t, batch_span=1000).run(full)
    v_from = t.snapshot.version
    live_go = {(r["repo"], r["path"])
               for r in t.read().filter("lang = 'go'").collect()}
    t.delete_where("lang = 'go'")

    # on this MOR shape the correction window must NOT take the
    # incremental plan (added stamps sit AT the from-side's max, failing
    # the strictly-above clause); a CoW shape whose written-row bounds
    # sit below the watermark may legitimately pass the gate — sound, as
    # strictly-above IS the soundness condition — so this assertion is
    # deliberately shape-specific
    assert t.changes_plan(v_from) == "diff"
    ch = t.changes(v_from).collect()
    assert {( r["repo"], r["path"]) for r in ch
            if r["_change_type"] == "DELETE"} == live_go

    # compaction folds the correction like any winning DELETE; state holds
    before = df_fingerprint([x.asDict() for x in t.read().collect()])
    t.compact(keep_tombstones=True)
    assert df_fingerprint([x.asDict() for x in t.read().collect()]) == before
    # two corrections at one gtid: the counter sub-orders them
    from th2_listener_mysql_binlog_go_spark.plans.lake import (
        CORRECTION_SEQ_STEP,
    )
    r1 = t.update_where("lang = 'py'", {"commit": "'A'"})
    r2 = t.update_where("lang = 'py'", {"commit": "'B'"})
    assert r2["seq"] == r1["seq"] + CORRECTION_SEQ_STEP
    assert {r["commit"] for r in t.read().filter("lang = 'py'").collect()} \
        == {"B"}


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_correction_interleavings_match_oracle(spark, tmp_path, seed):
    """Property: any interleaving of replay segments and corrections
    (kill-list deletes / redaction updates between batches) converges to
    the stepwise python oracle — including keys the tail re-inserts
    after a correction — and a tombstone-keeping compaction at the end
    is a state fixed point."""
    import random

    rng = random.Random(seed)
    n = rng.choice([1800, 2400])
    full = synthetic_changestream(spark, n, n_repos=10, n_paths=20,
                                  seed=seed, truncate_per_10k=0)
    cuts = sorted(rng.sample(range(200, n - 200), 2))
    segs = [(0, cuts[0]), (cuts[0], cuts[1]), (cuts[1], n)]
    langs = ["py", "go", "rs", "md", "sql"]

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    # ONE span for the table's lifetime — the runner refuses a resume
    # under a different span (sub-batch ids would miss the guard)
    span = rng.choice([300, 500])
    state: dict = {}
    for i, (lo, hi) in enumerate(segs):
        seg = full.filter(f"gtid >= {lo} and gtid < {hi}")
        ReplayRunner(spark, t, batch_span=span).run(
            full.filter(f"gtid < {hi}"))  # runner resumes from watermark
        state = _apply_onto(state, _events(seg))
        if i < 2:  # a correction between segments
            lang = rng.choice(langs)
            if rng.random() < 0.5:
                t.delete_where(f"lang = '{lang}'")
                state = {k: r for k, r in state.items()
                         if r.get("lang") != lang}
            else:
                t.update_where(f"lang = '{lang}'",
                               {"commit": f"'R{i}'"})
                state = {k: (dict(r, commit=f"R{i}")
                             if r.get("lang") == lang else r)
                         for k, r in state.items()}

    assert df_fingerprint([x.asDict() for x in t.read().collect()]) \
        == state_fingerprint(state)
    t.compact(keep_tombstones=True)
    assert df_fingerprint([x.asDict() for x in t.read().collect()]) \
        == state_fingerprint(state)
