"""All-types fidelity through the FULL engine path (SURVEY.md §7 hard part
(e)): the reference's documented test schema spans ints of every width,
DECIMAL, FLOAT/DOUBLE, CHAR/TEXT, BLOB, DATE, DATETIME, TIMESTAMP, TIME,
YEAR, JSON (/root/reference/README.md:77-98). Golden decode tests cover the
JSON boundary; THIS suite drives typed values through
merge -> schema-evolve -> within-gtid LWW -> compact -> read and asserts
exact Python-value equality — where Arrow/parquet corruption would appear.

MySQL's TIME and JSON land as strings, YEAR as int (the decode mapping in
functions/ddl._MYSQL_TO_SPARK); zero-dates are not representable in
Arrow/parquet and decode to NULL by policy.
"""

from datetime import date, datetime
from decimal import Decimal

from th2_listener_mysql_binlog_go_spark.operators.apply import ApplyConfig, BatchApplier
from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

TYPED = [
    ("id", "bigint"),
    ("tiny", "tinyint"), ("small", "smallint"), ("cnt", "int"),
    ("price", "decimal(10,2)"),
    ("ratio", "float"), ("score", "double"),
    ("name", "string"),
    ("payload", "binary"),
    ("d", "date"), ("dt", "timestamp_ntz"),
    ("t", "string"), ("yr", "int"), ("js", "string"),
]
# change-envelope payload struct: the decoder's widest view (cnt already
# bigint — pre-widen segments cast it down losslessly, post-widen keep it)
_STRUCT = "struct<" + ",".join(
    f"{n}:{'bigint' if n == 'cnt' else t}" for n, t in TYPED + [("extra", "decimal(6,3)")]
) + ">"
CHANGE = (
    "gtid bigint, log_name string, log_pos bigint, seq bigint, ts bigint, "
    "schema_name string, table_name string, op string, "
    f"before {_STRUCT}, after {_STRUCT}, ddl string"
)


def _row(i, cnt=None, price=None, extra=None):
    return (
        i, i % 100 - 50, i * 3, cnt if cnt is not None else i * 1000,
        price or Decimal(f"{i * 11}.25"),
        float(f"{i}.5"), i / 7.0,
        f"naïve-ünïcode-{i}", bytes([i % 256, 0, 255, 7]),
        date(2024, 1 + i % 12, 1 + i % 28), datetime(2024, 3, 1 + i % 28, 12, 30, i % 60),
        f"{i % 24:02d}:00:59", 1990 + i % 30, f'{{"k": {i}}}',
        extra,
    )


def _ev(gtid, op, row=None, before=None, ddl=None):
    return (gtid, "binlog.000001", gtid * 256, gtid, 0, "repos", "files", op,
            before if op in ("UPDATE", "DELETE") else None,
            row if op in ("INSERT", "UPDATE") else None, ddl)


def test_alltypes_roundtrip_through_engine(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), TYPED, ["id"], num_buckets=4)
    applier = BatchApplier(table, ApplyConfig())

    # batch 0: typed inserts, one same-gtid churn pair, one NULL-heavy row
    nullish = (7, None, None, None, None, None, None, None, None, None, None,
               None, None, None, None)
    b0 = [
        _ev(1, "INSERT", _row(1)),
        _ev(2, "INSERT", _row(2)),
        _ev(3, "INSERT", _row(3)),
        _ev(4, "INSERT", nullish),
        _ev(5, "INSERT", _row(5)),
    ]
    applier.apply(spark.createDataFrame(b0, CHANGE), batch_id=0)

    # batch 1: widen cnt int->bigint, add decimal column, then typed updates
    # that exercise both; delete one key; update another
    big = 2**40
    b1 = [
        _ev(10, "ALTER_TABLE", ddl="ALTER TABLE repos.files MODIFY COLUMN cnt BIGINT"),
        _ev(11, "ALTER_TABLE", ddl="ALTER TABLE repos.files ADD COLUMN extra DECIMAL(6,3)"),
        _ev(12, "UPDATE", _row(2, cnt=big, price=Decimal("99999999.99"),
                               extra=Decimal("123.456")), before=_row(2)),
        _ev(13, "DELETE", before=_row(3)),
        _ev(14, "UPDATE", _row(5, extra=Decimal("0.001")), before=_row(5)),
    ]
    applier.apply(spark.createDataFrame(b1, CHANGE), batch_id=1)
    table.compact()

    got = {r["id"]: r.asDict() for r in table.read().collect()}
    assert set(got) == {1, 2, 5, 7}

    # pre-evolution row: every original typed value survives; new col NULL
    r1 = got[1]
    exp1 = dict(zip([n for n, _ in TYPED] + ["extra"], _row(1)))
    for k, v in exp1.items():
        assert got[1][k] == v, (k, got[1][k], v)
    assert r1["extra"] is None

    # widened + new-column row: bigint beyond int32, exact decimals
    r2 = got[2]
    assert r2["cnt"] == big and isinstance(r2["cnt"], int)
    assert r2["price"] == Decimal("99999999.99")
    assert r2["extra"] == Decimal("123.456")
    assert r2["payload"] == bytes([2, 0, 255, 7])
    assert r2["d"] == date(2024, 3, 3) and r2["dt"] == datetime(2024, 3, 3, 12, 30, 2)

    # NULLs of every type survive
    assert all(got[7][k] is None for k, _ in TYPED[1:])

    assert got[5]["extra"] == Decimal("0.001")
    assert got[5]["ratio"] == float("5.5") and got[5]["score"] == 5 / 7.0
    assert got[5]["js"] == '{"k": 5}' and got[5]["t"] == "05:00:59"
    assert got[5]["yr"] == 1995


def test_alltypes_resume_replay_identical(spark, tmp_path):
    """Replaying the typed batches after a reload is a no-op and the state
    (including binary/decimal/date columns) is byte-identical."""
    table = LakeTable.create(spark, str(tmp_path / "t"), TYPED, ["id"], num_buckets=2)
    applier = BatchApplier(table, ApplyConfig())
    b0 = [_ev(1, "INSERT", _row(1)), _ev(2, "INSERT", _row(2))]
    df = spark.createDataFrame(b0, CHANGE)
    applier.apply(df, batch_id=0)
    before = sorted(str(r) for r in table.read().collect())

    t2 = LakeTable.load(spark, table.root)
    BatchApplier(t2, ApplyConfig()).apply(df, batch_id=0)  # guarded no-op
    after = sorted(str(r) for r in t2.read().collect())
    assert before == after
