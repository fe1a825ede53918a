"""Decode the reference's documented golden JSON bodies (README.md:109-240,
the de-facto correctness spec for the 19-column all-types table) through
the vectorized bean decoder and assert type fidelity: DECIMAL-as-string,
BLOB/TEXT-as-base64 -> binary, DATE/DATETIME/TIME strings, JSON-as-string
(SURVEY.md §1 'supported column types', FIXTURES.md §3)."""

import base64
import datetime
from decimal import Decimal

import pyspark.sql.functions as F

from th2_listener_mysql_binlog_go_spark.functions.decode import decode_bean_json

# Spark-typed row schema for the reference's type_test table (FIXTURES.md §3).
# In the bean JSON, blob/text are base64 strings and decimal is a string —
# we decode to the JSON-level types first, then refine.
ROW_DDL = (
    "id bigint, int_col bigint, tinyint_col bigint, smallint_col bigint, "
    "mediumint_col bigint, bigint_col bigint, decimal_col string, "
    "float_col double, double_col double, char_col string, varchar_col string, "
    "text_col string, blob_col string, date_col string, datetime_col string, "
    "timestamp_col string, time_col string, year_col bigint, json_col string"
)

INSERT_BODY = """
{"Schema":"test","Table":"type_test","Operation":"INSERT","Inserted":[
 {"bigint_col":9223372036854775807,"blob_col":"U2FtcGxlIEJMT0IgZGF0YQ==","char_col":"A",
  "date_col":"2024-02-12","datetime_col":"2024-02-12 14:30:00","decimal_col":"12345.67",
  "double_col":2.71828,"float_col":3.14,"id":1,"int_col":100,
  "json_col":"{\\"key\\":\\"value\\"}","mediumint_col":500000,"smallint_col":32000,
  "text_col":"U2FtcGxlIHRleHQgZGF0YQ==","time_col":"14:30:00",
  "timestamp_col":"2025-02-12 13:10:37","tinyint_col":1,
  "varchar_col":"create-update-delete-test","year_col":2024}]}
""".strip().replace("\n", "")

UPDATE_BODY = """
{"Schema":"test","Table":"type_test","Operation":"UPDATE","Updated":[
 {"Before":{"id":1,"int_col":100,"decimal_col":"12345.67","blob_col":"U2FtcGxlIEJMT0IgZGF0YQ=="},
  "After":{"id":1,"int_col":200,"decimal_col":"98765.43","blob_col":"VXBkYXRlZCBCTE9CIGRhdGE="}}]}
""".strip().replace("\n", "")

DELETE_BODY = """
{"Schema":"test","Table":"type_test","Operation":"DELETE","Deleted":[
 {"id":1,"int_col":200,"decimal_col":"98765.43","time_col":"16:00:00","year_col":2025}]}
""".strip().replace("\n", "")


def _decode(spark, bodies):
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bodies)], "i int, payload string")
    return decode_bean_json(df, "payload", ROW_DDL)


def test_insert_golden_types(spark):
    r = _decode(spark, [INSERT_BODY]).collect()[0]
    assert (r["schema_name"], r["table_name"], r["op"]) == ("test", "type_test", "INSERT")
    a = r["after"]
    assert r["before"] is None
    assert a["id"] == 1 and a["int_col"] == 100
    assert a["bigint_col"] == 9223372036854775807
    assert a["decimal_col"] == "12345.67"  # DECIMAL serialized as string (README.md:120)
    assert abs(a["float_col"] - 3.14) < 1e-9 and abs(a["double_col"] - 2.71828) < 1e-12
    assert base64.b64decode(a["blob_col"]) == b"Sample BLOB data"  # base64 (README.md:116)
    assert base64.b64decode(a["text_col"]) == b"Sample text data"  # TEXT also base64 (README.md:128)
    assert a["date_col"] == "2024-02-12" and a["time_col"] == "14:30:00"
    assert a["json_col"] == '{"key":"value"}'  # embedded JSON string (README.md:125)
    assert a["year_col"] == 2024


def test_typed_refinement(spark):
    """Second-stage refinement to native Spark types: decimal, binary, date,
    timestamp — what the apply path would store columnar."""
    d = _decode(spark, [INSERT_BODY]).select("after.*")
    typed = d.select(
        F.col("decimal_col").cast("decimal(10,2)").alias("dec"),
        F.unbase64("blob_col").alias("blob"),
        F.to_date("date_col").alias("d"),
        F.to_timestamp("timestamp_col").alias("ts"),
    ).collect()[0]
    assert typed["dec"] == Decimal("12345.67")
    assert bytes(typed["blob"]) == b"Sample BLOB data"
    assert typed["d"] == datetime.date(2024, 2, 12)
    assert typed["ts"].year == 2025


def test_update_delete_golden(spark):
    rows = _decode(spark, [UPDATE_BODY, DELETE_BODY]).orderBy("i").collect()
    u, dl = rows[0], rows[1]
    assert u["op"] == "UPDATE"
    assert u["before"]["int_col"] == 100 and u["after"]["int_col"] == 200
    assert u["before"]["decimal_col"] == "12345.67" and u["after"]["decimal_col"] == "98765.43"
    assert dl["op"] == "DELETE"
    assert dl["before"]["year_col"] == 2025 and dl["after"] is None


def test_unparseable_payload_dropped(spark):
    rows = _decode(spark, ["not json at all", INSERT_BODY]).collect()
    ops = {r["i"]: r["op"] for r in rows}
    assert ops[0] is None  # undecodable -> op NULL, caller filters
    assert ops[1] == "INSERT"


def test_multirow_event_explodes_in_order(spark):
    body = (
        '{"Schema":"s","Table":"t","Operation":"INSERT","Inserted":['
        '{"id":10},{"id":11},{"id":12}]}'
    )
    rows = _decode(spark, [body]).orderBy("row_idx").collect()
    assert [r["after"]["id"] for r in rows] == [10, 11, 12]
    assert [r["row_idx"] for r in rows] == [0, 1, 2]


# ---------------------------------------------------------------- true S4

def test_positional_decode_zips_ordinals(spark):
    """Positional [][]any rows bind i-th value to i-th ordinal column name
    (createValues, bean.go:152-162); UPDATE rows alternate Before/After
    (createUpdatePairs, bean.go:164-181)."""
    from th2_listener_mysql_binlog_go_spark.functions.decode import decode_positional

    events = [
        (1, "INSERT", [["10", "py", "5"], ["11", "go", "6"]]),
        (2, "UPDATE", [["10", "xx", "0"], ["10", "py", "9"],
                       ["11", "go", "1"], ["11", "rs", "2"]]),
        (3, "DELETE", [["10", "py", "5"]]),
    ]
    df = spark.createDataFrame(
        events, "gtid bigint, op string, rows array<array<string>>")
    out = decode_positional(df, ["id", "lang", "n"])
    got = sorted((r["gtid"], r["row_idx"],
                  r["before"] and r["before"]["lang"],
                  r["after"] and r["after"]["lang"],
                  r["after"] and r["after"]["n"]) for r in out.collect())
    assert got == [
        (1, 0, None, "py", "5"), (1, 1, None, "go", "6"),
        (2, 0, "xx", "py", "9"), (2, 1, "go", "rs", "2"),
        (3, 0, "py", None, None),
    ]


def test_load_table_metadata_ordinal_order(spark):
    """INFORMATION_SCHEMA loader preserves ORDINAL_POSITION order even when
    rows arrive shuffled (db_metadata.go:85-118)."""
    from th2_listener_mysql_binlog_go_spark.functions.decode import load_table_metadata

    rows = [
        ("repos", "files", "content", 5), ("repos", "files", "repo", 1),
        ("repos", "files", "lang", 4), ("repos", "files", "path", 2),
        ("repos", "files", "commit", 3),
        ("other", "t2", "b", 2), ("other", "t2", "a", 1),
    ]
    df = spark.createDataFrame(
        rows, "table_schema string, table_name string, column_name string, ordinal_position int")
    meta = load_table_metadata(df)
    assert meta[("repos", "files")] == ["repo", "path", "commit", "lang", "content"]
    assert meta[("other", "t2")] == ["a", "b"]
