"""DDL classification: the statement corpus of the reference's
pattern_test.go:21-230, asserted against both the Python classifier and
the Catalyst (regexp_extract) surface, plus ALTER sub-command parsing."""

import pytest
from pyspark.sql import functions as F

from th2_listener_mysql_binlog_go_spark.functions.ddl import (
    classify_ddl,
    classify_ddl_cols,
    parse_alter,
)

# (query, schema, table, operation, matched) — mirrors pattern_test.go
CASES = [
    ("TRUNCATE TABLE users;", "", "users", "TRUNCATE", True),
    ("TRUNCATE TABLE `users`;", "", "users", "TRUNCATE", True),
    ("TRUNCATE TABLE db1.users;", "db1", "users", "TRUNCATE", True),
    ("TRUNCATE TABLE `db1`.`users`;", "db1", "users", "TRUNCATE", True),
    ("TRUNCATE TABLE  db1.`users`  ;", "db1", "users", "TRUNCATE", True),
    ("TRUNCATE TABLE\n\t\t\t`my_db`.`tbl_user`;", "my_db", "tbl_user", "TRUNCATE", True),
    ("CREATE TABLE users (id INT);", "", "users", "CREATE_TABLE", True),
    ("CREATE TABLE `users` (id INT, name VARCHAR(50));", "", "users", "CREATE_TABLE", True),
    ("CREATE TABLE IF NOT EXISTS users (id INT PRIMARY KEY);", "", "users", "CREATE_TABLE", True),
    (
        "CREATE TABLE IF NOT EXISTS `mydb`.`users` (\n\t\t\t    id INT AUTO_INCREMENT,"
        "\n\t\t\t\tname VARCHAR(255),\n\t\t\t\tPRIMARY KEY (id)\n\t\t\t) ENGINE=InnoDB;",
        "mydb", "users", "CREATE_TABLE", True,
    ),
    ("CREATE TABLE test.users (col1 INT, col2 TEXT);", "test", "users", "CREATE_TABLE", True),
    (
        "CREATE TABLE\n\t\t\t`schema1`.`table1`\n\t\t\t(\n\t\t\t\tcol1 INT,\n\t\t\t\tcol2 TEXT\n\t\t\t);",
        "schema1", "table1", "CREATE_TABLE", True,
    ),
    (
        "CREATE TABLE test.users\n\t\t\t(\n\t\t\t\tcol1 INT,\n\t\t\t\tcol2 VARCHAR(100)\n\t\t\t);",
        "test", "users", "CREATE_TABLE", True,
    ),
    ("DROP TABLE users;", "", "users", "DROP_TABLE", True),
    ("DROP TABLE IF EXISTS users;", "", "users", "DROP_TABLE", True),
    ("DROP TABLE IF EXISTS `users`;", "", "users", "DROP_TABLE", True),
    ("DROP TABLE `db1`.`users`;", "db1", "users", "DROP_TABLE", True),
    ("DROP TABLE db1.users;", "db1", "users", "DROP_TABLE", True),
    ("DROP TABLE\n\t\t\tIF EXISTS\n\t\t\t`my_schema`.`tbl`;", "my_schema", "tbl", "DROP_TABLE", True),
    ("ALTER TABLE users ADD COLUMN age INT;", "", "users", "ALTER_TABLE", True),
    ("ALTER TABLE `users` DROP COLUMN age;", "", "users", "ALTER_TABLE", True),
    ("ALTER TABLE db1.users MODIFY COLUMN name VARCHAR(255);", "db1", "users", "ALTER_TABLE", True),
    ("ALTER TABLE `db1`.`users` ADD INDEX idx_name (name);", "db1", "users", "ALTER_TABLE", True),
    (
        "ALTER TABLE\n    \t\t   `schema1`.`table1`\n\t\t\tADD\n    \t\t\tCOLUMN col_new INT;",
        "schema1", "table1", "ALTER_TABLE", True,
    ),
    # non-matching statements are dropped (listener.go:254-256)
    ("SET SESSION sql_mode='STRICT_TRANS_TABLES'", "", "", "UNKNOWN", False),
    ("INSERT INTO users VALUES (1)", "", "", "UNKNOWN", False),
    ("BEGIN", "", "", "UNKNOWN", False),
]


@pytest.mark.parametrize("query,schema,table,op,ok", CASES)
def test_classify_ddl_python(query, schema, table, op, ok):
    s, t, o, matched = classify_ddl(query)
    assert (s, t, o, matched) == (schema, table, op, ok)


def test_classify_ddl_catalyst(spark):
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(CASES)], "i int, ddl string")
    got = {
        r["i"]: (r["ddl_schema"], r["ddl_table"], r["ddl_op"])
        for r in df.select("i", *classify_ddl_cols(F.col("ddl"))).collect()
    }
    for i, (q, schema, table, op, ok) in enumerate(CASES):
        assert got[i] == (schema, table, op), f"case {i}: {q!r}"


def test_session_schema_fallback(spark):
    # matched statement without schema -> session schema (listener.go:257-259)
    assert classify_ddl("TRUNCATE TABLE users;", session_schema="sess") == (
        "sess", "users", "TRUNCATE", True)
    # unmatched statement: no fallback
    assert classify_ddl("BEGIN", session_schema="sess") == ("", "", "UNKNOWN", False)
    df = spark.createDataFrame([("TRUNCATE TABLE users;",), ("BEGIN",)], "ddl string")
    rows = df.select(*classify_ddl_cols(F.col("ddl"), session_schema=F.lit("sess"))).collect()
    assert (rows[0]["ddl_schema"], rows[1]["ddl_schema"]) == ("sess", "")


def test_parse_alter():
    c = parse_alter("ALTER TABLE repos.files ADD COLUMN stars INT;")
    assert (c.kind, c.column, c.type_) == ("add", "stars", "int")
    c = parse_alter("ALTER TABLE repos.files RENAME COLUMN lang TO language")
    assert (c.kind, c.column, c.new_name) == ("rename", "lang", "language")
    c = parse_alter("ALTER TABLE repos.files MODIFY COLUMN stars BIGINT;")
    assert (c.kind, c.column, c.type_) == ("modify", "stars", "bigint")
    c = parse_alter("ALTER TABLE repos.files ADD COLUMN note VARCHAR(100)")
    assert (c.kind, c.column, c.type_) == ("add", "note", "string")
    assert parse_alter("ALTER TABLE x ADD INDEX idx_name (name)").kind == "other"
    assert parse_alter("ALTER TABLE x ADD PRIMARY KEY (id)").kind == "other"
    assert parse_alter("OPTIMIZE TABLE x").kind == "other"
