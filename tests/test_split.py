"""Size estimation + greedy split invariants, mirroring the reference's
randomized tests (bean_test.go:54-179, insert_test.go:25-42,
delete_test.go:25-42)."""

import json
import random

import pytest

from th2_listener_mysql_binlog_go_spark.functions.split import (
    datamap_size,
    greedy_split_sizes,
    json_size,
    record_base_size,
    split_plan,
    split_plan_cumsum,
)


def _random_row(rng):
    """5 value types like bean_test.go:181-231: string, int, float, bytes, None."""
    row = {}
    for i in range(rng.randint(1, 10)):
        t = rng.randint(0, 4)
        k = f"col_{i}"
        if t == 0:
            row[k] = "".join(rng.choice('ab"\\\nxyz \t') for _ in range(rng.randint(0, 30)))
        elif t == 1:
            row[k] = rng.randint(-2**62, 2**62)
        elif t == 2:
            row[k] = rng.random() * 10**rng.randint(-5, 5)
        elif t == 3:
            row[k] = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
        else:
            row[k] = None
    return row


def _serialize(schema, table, op, field, rows):
    def enc(v):
        if isinstance(v, bytes):
            import base64
            return base64.b64encode(v).decode()
        return v
    doc = {"Schema": schema, "Table": table, "Operation": op,
           field: [{k: enc(v) for k, v in r.items()} for r in rows]}
    return json.dumps(doc, separators=(",", ":"))


@pytest.mark.parametrize("seed", range(20))
def test_size_estimate_upper_bounds_serialized(seed):
    """SizeBytes() >= len(Serialize()) — bean_test.go:54-92."""
    rng = random.Random(seed)
    rows = [_random_row(rng) for _ in range(rng.randint(2, 8))]
    est = record_base_size("s", "t", "INSERT", "Inserted")
    est += len(rows) - 1
    est += sum(datamap_size(r) for r in rows)
    actual = len(_serialize("s", "t", "INSERT", "Inserted", rows))
    assert est >= actual, f"estimate {est} < serialized {actual}"


def test_json_size_scalars():
    assert json_size(None) == 4
    assert json_size(12345) == 5
    assert json_size(-7) == 2
    assert json_size("ab") == len('"ab"')
    assert json_size('a"b') == len(json.dumps('a"b'))
    assert json_size(b"xyz1") == ((4 + 2) // 3) * 4 + 2  # base64 sizing, bean.go:82


def test_doubling_rows_splits_in_two():
    """insert_test.go:25-42 / delete_test.go:25-42: doubling a bean's rows
    and splitting at the original size yields exactly 2 parts; at half
    the size, >= 4 parts."""
    rng = random.Random(7)
    rows = [_random_row(rng) for _ in range(6)]
    base = record_base_size("s", "t", "INSERT", "Inserted")
    sizes = [datamap_size(r) for r in rows]
    original = base + sum(sizes) + len(sizes) - 1
    doubled = sizes + sizes
    parts = greedy_split_sizes(doubled, base, original)
    assert max(parts) + 1 == 2
    parts_half = greedy_split_sizes(doubled, base, max(original // 2, base + max(sizes) + 1))
    assert max(parts_half) + 1 >= 4


def test_single_row_and_update_not_splittable():
    assert greedy_split_sizes([100], 10, 50) == [0]


def test_split_plan_spark(spark):
    rows = []
    for ev in range(10):
        op = "INSERT" if ev % 2 == 0 else "UPDATE"
        for i in range(8):
            rows.append((ev, i, 300, op))
    df = spark.createDataFrame(rows, "event_id int, row_order int, est_size int, op string")
    out = split_plan(df, "event_id", "row_order", "est_size", "op", max_size=1000, base_size=50)
    got = {(r["event_id"], r["row_order"]): r["part_idx"] for r in out.collect()}
    # UPDATE events: never split (update.go:49-55)
    assert all(got[(ev, i)] == 0 for ev in range(1, 10, 2) for i in range(8))
    # INSERT events: 8 rows * ~301 bytes at max 1000 -> several parts, order preserved
    ins = [got[(0, i)] for i in range(8)]
    assert ins == sorted(ins) and max(ins) >= 2
    # each part's size within bound: 50 + 3*301 + 2 < 1000 -> 3 rows/part
    from collections import Counter
    assert all(c <= 3 for c in Counter(ins).values())


def test_split_plan_cumsum_never_oversizes_randomized(spark):
    """The pure-Catalyst prefix-sum splitter (the streaming publisher's
    default kernel, round-4 review #6) must satisfy the SAME size
    guarantee as greedy — base + sum(sizes) + separators <= max_size for
    every part unless a single row alone exceeds the budget — preserve row
    order within parts, and never split UPDATE events. It may fragment
    more than greedy (boundary straddles), never pack more."""
    import random as _random

    rng = _random.Random(11)
    max_size, base = 512, 64
    rows = []
    for ev in range(150):
        op = rng.choice(["INSERT", "DELETE", "UPDATE", "INSERT"])
        n = rng.choice([1, 1, 2, 3, 8, 20])
        for i in range(n):
            rows.append((ev, i, rng.randrange(10, 400), op))
    # plus one event with a single row bigger than the whole budget
    rows.append((999, 0, 2000, "INSERT"))
    df = spark.createDataFrame(rows, "event_id int, row_order int, est_size int, op string")
    out = split_plan_cumsum(df, "event_id", "row_order", "est_size", "op",
                            max_size=max_size, base_size=base)
    by_part: dict = {}
    for r in out.collect():
        by_part.setdefault((r["event_id"], r["part_idx"]), []).append(
            (r["row_order"], r["est_size"], r["op"]))
    for (ev, p), part_rows in by_part.items():
        sizes = [s for _, s, _ in sorted(part_rows)]
        payload = base + sum(sizes) + len(sizes) - 1
        if part_rows[0][2] == "UPDATE":
            # UPDATE is never split (update.go:49-55): one part, no bound
            assert p == 0
            continue
        if ev == 999:
            assert len(part_rows) == 1  # oversized single row: own part
            continue
        assert payload <= max_size, (ev, p, payload)
    # part order follows row order within each event
    per_event: dict = {}
    for r in out.collect():
        per_event.setdefault(r["event_id"], []).append((r["row_order"], r["part_idx"]))
    for ev, lst in per_event.items():
        parts_in_order = [p for _, p in sorted(lst)]
        assert parts_in_order == sorted(parts_in_order)


def test_batched_encode_cumsum_roundtrip(spark):
    """encode_stream_batched(split_mode='cumsum') — the publisher default —
    produces size-bounded payloads that decode back to the original rows."""
    from th2_listener_mysql_binlog_go_spark.sources.changestream import (
        synthetic_changestream,
    )
    from th2_listener_mysql_binlog_go_spark.sources.rawjson import (
        decode_stream,
        encode_stream_batched,
    )

    stream = synthetic_changestream(spark, 400, n_repos=10, n_paths=20,
                                    truncate_per_10k=0)
    wire = encode_stream_batched(stream, max_size=2048, split_mode="cumsum").cache()
    greedy_wire = encode_stream_batched(stream, max_size=2048).cache()
    # the only payloads over budget are the ones greedy ALSO cannot bound
    # (unsplittable UPDATEs, single rows over the budget) — the cumsum
    # kernel introduces no new oversize class
    assert (wire.filter("length(payload) > 2048").count()
            == greedy_wire.filter("length(payload) > 2048").count())
    import json as _json

    for r in wire.filter("length(payload) > 2048").limit(20).collect():
        body = _json.loads(r["payload"])
        rows_in = body.get("Inserted") or body.get("Deleted") or body.get("Updated") or []
        assert body["Operation"] == "UPDATE" or len(rows_in) <= 1
    decoded = decode_stream(wire)
    n_dml = stream.filter("op in ('INSERT','UPDATE','DELETE')").count()
    assert decoded.filter("op in ('INSERT','UPDATE','DELETE')").count() == n_dml
    # exact content parity with the greedy wire, independent of packing
    greedy = decode_stream(greedy_wire)
    cols = ["gtid", "op", "schema_name", "table_name", "before", "after"]
    assert decoded.select(cols).exceptAll(greedy.select(cols)).count() == 0
    assert greedy.select(cols).exceptAll(decoded.select(cols)).count() == 0


def test_split_plan_matches_reference_recurrence_randomized(spark):
    """The mapInPandas stream implementation must equal the pure-Python
    greedy recurrence per event, for random event shapes (multi-row,
    single-row, unsplittable ops, sizes straddling the bound) — including
    events that span Arrow batch boundaries (forced tiny batch size)."""
    import random

    rng = random.Random(7)
    rows, expected = [], {}
    for ev in range(120):
        op = rng.choice(["INSERT", "DELETE", "UPDATE", "INSERT"])
        n = rng.choice([1, 1, 2, 3, 8, 20])
        sizes = [rng.randrange(10, 400) for _ in range(n)]
        if op in ("INSERT", "DELETE"):
            parts = greedy_split_sizes(sizes, 64, 512)
        else:
            parts = [0] * n
        for i, (s, p) in enumerate(zip(sizes, parts)):
            rows.append((ev, i, s, op))
            expected[(ev, i)] = p
    df = spark.createDataFrame(rows, "event_id int, row_order int, est_size int, op string")
    small_batch = df.sparkSession.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    df.sparkSession.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = split_plan(df, "event_id", "row_order", "est_size", "op",
                         max_size=512, base_size=64)
        got = {(r["event_id"], r["row_order"]): r["part_idx"] for r in out.collect()}
    finally:
        df.sparkSession.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", small_batch)
    assert got == expected
