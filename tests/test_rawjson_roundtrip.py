"""Wire-format roundtrip: CHANGE_SCHEMA -> bean JSON payloads (the
reference's published format) -> vectorized decode -> full replay must
converge to the same state as replaying the original stream."""


from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import (
    CHANGE_SCHEMA,
    synthetic_changestream,
)
from th2_listener_mysql_binlog_go_spark.sources.rawjson import (
    decode_stream,
    encode_stream,
    encode_stream_batched,
)
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def test_roundtrip_replay_equivalence(spark, tmp_path):
    stream = synthetic_changestream(spark, 2000, n_repos=30, n_paths=50, truncate_per_10k=20)

    raw = encode_stream(stream)
    assert dict(raw.dtypes)["payload"] == "string"
    decoded = decode_stream(raw)
    # same names and types (nullability flags differ through from_json),
    # plus row_idx — the within-event row order of multi-row beans that the
    # apply path's _seq packing consumes (CHANGE_SCHEMA sources carry their
    # order in log_pos/seq; wire decode must reconstruct it per bean)
    assert [(f.name, f.dataType.simpleString())
            for f in decoded.schema.fields if f.name != "row_idx"] == \
           [(f.name, f.dataType.simpleString()) for f in stream.schema.fields]
    assert dict(decoded.dtypes)["row_idx"] == "int"

    # the non-matching QUERY statements survive encode/decode and are then
    # dropped by the applier's classifier, as in the reference
    n_q = stream.filter("op = 'QUERY'").count()
    assert decoded.filter("op = 'QUERY'").count() == n_q

    t1 = LakeTable.create(spark, str(tmp_path / "direct"), SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, t1, batch_span=500).run(stream)
    t2 = LakeTable.create(spark, str(tmp_path / "via_json"), SCHEMA, ["repo", "path"], num_buckets=8)
    ReplayRunner(spark, t2, batch_span=500).run(decoded)

    fp1 = df_fingerprint([r.asDict() for r in t1.read().collect()])
    fp2 = df_fingerprint([r.asDict() for r in t2.read().collect()])
    assert fp1 == fp2 and t1.read().count() > 0


def _mk(gtid, log_pos, seq, op, path, content="x" * 40, table="files"):
    row = ("r1", path, "c" * 40, "py", content)
    return (gtid, "binlog.000001", log_pos, seq, 0, "repos", table, op,
            row if op in ("UPDATE", "DELETE") else None,
            row if op in ("INSERT", "UPDATE") else None, None)


def test_batched_encode_consumes_split_plan(spark):
    """S9→S10 parity (putToBatch, listener.go:265-294): rows of one binlog
    event (shared gtid+log_pos+op+table) pack into multi-row bean payloads;
    an oversized INSERT event splits into parts <= max_size, each its own
    message; UPDATE never splits."""
    events = (
        # one 6-row INSERT event, rows ~150 bytes each -> must split
        [_mk(1, 100, i, "INSERT", f"a{i}.py") for i in range(6)]
        # one 4-row UPDATE event -> unsplittable, single payload
        + [_mk(2, 200, i, "UPDATE", f"b{i}.py") for i in range(4)]
        # singletons
        + [_mk(3, 300, 0, "DELETE", "z.py")]
    )
    stream = spark.createDataFrame(events, CHANGE_SCHEMA)
    out = encode_stream_batched(stream, max_size=400).cache()

    msgs = {(r["gtid"], r["part_idx"]): r["payload"] for r in out.collect()}
    ins_parts = [k for k in msgs if k[0] == 1]
    assert len(ins_parts) > 1  # the INSERT event split
    assert [k for k in msgs if k[0] == 2] == [(2, 0)]  # UPDATE unsplit
    # size guarantee: every *split* payload respects the bound
    for (g, p), payload in msgs.items():
        if g == 1:
            assert len(payload) <= 400, (g, p, len(payload))
    # part contents are ordered, disjoint, complete
    import json as _json

    seen = []
    for _, p in sorted(ins_parts):
        body = _json.loads(msgs[(1, p)])
        assert body["Operation"] == "INSERT"
        seen += [r["path"] for r in body["Inserted"]]
    assert seen == [f"a{i}.py" for i in range(6)]

    # decode of batched messages yields the original row-changes
    decoded = decode_stream(out)
    got = sorted((r["gtid"], r["op"],
                  (r["after"] or r["before"])["path"]) for r in decoded.collect())
    exp = sorted((e[0], e[7], (e[9] or e[8])[1]) for e in events)
    assert got == exp


def test_batched_encode_mixed_op_transaction(spark):
    """A transaction (one GTID) carrying several events with different ops
    and tables must yield one payload PER EVENT, never a merged one —
    the reference publishes one bean per RowsEvent (listener.go:229-244).
    Regression for the round-2 defect: grouping by gtid alone collapsed an
    INSERT to A and a DELETE to B into a single corrupted payload."""
    import json as _json

    events = (
        # gtid 7: INSERT(files) x2 at log_pos 400, DELETE(files2) x1 at 464,
        # UPDATE(files) x1 at 528, INSERT(files2) x1 at 592 — 4 events
        [_mk(7, 400, 0, "INSERT", "i0.py"), _mk(7, 400, 1, "INSERT", "i1.py"),
         _mk(7, 464, 2, "DELETE", "d0.py", table="files2"),
         _mk(7, 528, 3, "UPDATE", "u0.py"),
         _mk(7, 592, 4, "INSERT", "i2.py", table="files2")]
    )
    stream = spark.createDataFrame(events, CHANGE_SCHEMA)
    out = encode_stream_batched(stream, max_size=100_000).cache()
    rows = out.collect()
    # one message per event (nothing split at this max_size, nothing merged)
    assert sorted((r["gtid"], r["log_pos"], r["part_idx"]) for r in rows) == [
        (7, 400, 0), (7, 464, 0), (7, 528, 0), (7, 592, 0)]
    by_pos = {r["log_pos"]: _json.loads(r["payload"]) for r in rows}
    assert by_pos[400]["Operation"] == "INSERT" and by_pos[400]["Table"] == "files"
    assert [x["path"] for x in by_pos[400]["Inserted"]] == ["i0.py", "i1.py"]
    assert by_pos[464]["Operation"] == "DELETE" and by_pos[464]["Table"] == "files2"
    assert [x["path"] for x in by_pos[464]["Deleted"]] == ["d0.py"]
    assert by_pos[528]["Operation"] == "UPDATE" and by_pos[528]["Table"] == "files"
    assert by_pos[592]["Operation"] == "INSERT" and by_pos[592]["Table"] == "files2"

    # row order within an event follows seq even when log_pos ties — and
    # NOT JSON-text order (seq order here is the reverse of text order)
    ev2 = [_mk(8, 100, 1, "INSERT", "aa_second.py"),
           _mk(8, 100, 0, "INSERT", "zz_first.py")]
    out2 = encode_stream_batched(spark.createDataFrame(ev2, CHANGE_SCHEMA),
                                 max_size=100_000)
    body = _json.loads(out2.collect()[0]["payload"])
    assert [x["path"] for x in body["Inserted"]] == ["zz_first.py", "aa_second.py"]


def test_split_parts_keep_seq_suborder(spark, tmp_path):
    """_seq disjointness across parts of ONE split event (round-4 advice
    #3): every part's decoded row_idx restarts at 0 while parts share
    log_pos, so decode folds part_idx into log_pos — the same key touched
    in two parts of one multi-row event must resolve LWW to the LATER
    (higher-seq) row, exactly as the unsplit replay does."""
    # 8-row INSERT event at one (gtid, log_pos); rows ~150B; max_size=400
    # forces a split into >= 3 parts. Rows 0 and 7 hit the SAME key with
    # different contents — the seq-7 row must win.
    events = (
        [_mk(1, 100, 0, "INSERT", "same.py", content="FIRST" + "x" * 40)]
        + [_mk(1, 100, i, "INSERT", f"fill{i}.py") for i in range(1, 7)]
        + [_mk(1, 100, 7, "INSERT", "same.py", content="LAST" + "y" * 40)]
    )
    stream = spark.createDataFrame(events, CHANGE_SCHEMA)
    wire = encode_stream_batched(stream, max_size=400).cache()
    # the duplicate-key rows really land in different parts
    import json as _json

    part_of = {}
    for r in wire.collect():
        body = _json.loads(r["payload"])
        for row in body.get("Inserted", []):
            if row["path"] == "same.py":
                part_of[row["content"][:4]] = r["part_idx"]
    assert part_of["FIRS"] != part_of["LAST"], "test setup: split must separate them"

    decoded = decode_stream(wire)
    # decoded parts carry DISTINCT effective log_pos (the fold), ordered by part
    pos = sorted({r["log_pos"] for r in decoded.collect()})
    assert len(pos) == len(set(r["part_idx"] for r in wire.collect()))

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
                         num_buckets=2)
    ReplayRunner(spark, t, batch_span=500).run(decoded)
    rows = {r["path"]: r["content"] for r in t.read().collect()}
    assert rows["same.py"].startswith("LAST"), "cross-part LWW must pick the later row"


def test_batched_encode_ddl_passthrough(spark):
    stream = spark.createDataFrame(
        [(9, "binlog.000001", 900, 9, 0, "repos", "files", "TRUNCATE",
          None, None, "TRUNCATE TABLE repos.files")], CHANGE_SCHEMA)
    out = encode_stream_batched(stream, max_size=256)
    r = out.collect()[0]
    assert r["part_idx"] == 0 and "TRUNCATE TABLE" in r["payload"]
    d = decode_stream(out).collect()[0]
    assert d["op"] == "TRUNCATE" and d["ddl"] == "TRUNCATE TABLE repos.files"
