"""Wire-format roundtrip: CHANGE_SCHEMA -> bean JSON payloads (the
reference's published format) -> vectorized decode -> full replay must
converge to the same state as replaying the original stream."""

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable
from th2_listener_mysql_binlog_go_spark.sources.changestream import synthetic_changestream
from th2_listener_mysql_binlog_go_spark.sources.rawjson import decode_stream, encode_stream
from th2_listener_mysql_binlog_go_spark.streaming.runner import ReplayRunner

from .oracle import df_fingerprint

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]


def test_roundtrip_replay_equivalence(spark, tmp_path):
    stream = synthetic_changestream(spark, 2000, n_repos=30, n_paths=50, truncate_per_10k=20)

    raw = encode_stream(stream)
    assert dict(raw.dtypes)["payload"] == "string"
    decoded = decode_stream(raw)
    # same names and types (nullability flags differ through from_json)
    assert [(f.name, f.dataType.simpleString()) for f in decoded.schema.fields] == \
           [(f.name, f.dataType.simpleString()) for f in stream.schema.fields]

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
