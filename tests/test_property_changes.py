"""Property test for the incremental changelog: on random op sequences,
``changes(i, j)`` must equal the pure-Python state diff of the two
snapshots for EVERY window — under the O(changes) incremental plan and
the full-diff fallback alike, across a mid-run compaction that forces
the fallback for straddling windows."""

import random

import pytest

from th2_listener_mysql_binlog_go_spark.plans.lake import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string")]
VALS = ["commit", "lang", "content"]


def _random_events(seed: int, n: int):
    """(gtid, op, key, vals) with a small key space so keys collide."""
    rng = random.Random(seed)
    keys = [(f"r{i % 3}", f"f{i}.py") for i in range(8)]
    live: set = set()
    out = []
    for gtid in range(1, n + 1):
        k = rng.choice(keys)
        if k in live and rng.random() < 0.25:
            out.append((gtid, "DELETE", k, (None, None, None)))
            live.discard(k)
        else:
            op = "UPDATE" if k in live else "INSERT"
            # occasionally rewrite the SAME values: must diff to nothing
            if op == "UPDATE" and rng.random() < 0.2:
                prev = next(e for e in reversed(out)
                            if e[2] == k and e[1] != "DELETE")
                vals = prev[3]
            else:
                vals = (f"c{gtid}", rng.choice(["py", "go", "rs"]),
                        f"v{gtid}:{rng.randrange(1000)}")
            out.append((gtid, op, k, vals))
            live.add(k)
    return out


def _state_at(events, hi):
    st = {}
    for gtid, op, k, vals in events:
        if gtid > hi:
            break
        if op == "DELETE":
            st.pop(k, None)
        else:
            st[k] = vals
    return st


def _expected_diff(old, new):
    exp = {}
    for k in set(old) | set(new):
        if k in old and k in new:
            if old[k] != new[k]:
                exp[k] = ("UPDATE", new[k])
        elif k in new:
            exp[k] = ("INSERT", new[k])
        else:
            exp[k] = ("DELETE", old[k])
    return exp


@pytest.mark.parametrize("seed", [7, 19])
def test_changes_equals_state_diff_on_random_windows(spark, tmp_path, seed):
    events = _random_events(seed, 240)
    t = LakeTable.create(spark, str(tmp_path / f"t{seed}"), SCHEMA,
                         ["repo", "path"], num_buckets=4)
    marks = []  # (version, gtid_hi)
    spans = [(1, 40), (41, 80), (81, 120), (121, 160), (161, 200), (201, 240)]
    for b, (lo, hi) in enumerate(spans):
        rows = [(k[0], k[1], v[0], v[1], v[2], op, g)
                for g, op, k, v in events if lo <= g <= hi]
        t.merge(spark.createDataFrame(
            rows, "repo string, path string, commit string, lang string, "
                  "content string, _op string, _gtid long"),
            batch_id=b + 1, mode="mor")
        marks.append((t.snapshot.version, hi))
        if b == 2:
            t.compact()  # straddling windows must fall back to 'diff'

    # windows: adjacent, straddle-the-compaction, and full-run
    windows = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (0, 5)]
    for i, j in windows:
        (vi, hi_i), (vj, hi_j) = marks[i], marks[j]
        exp = _expected_diff(_state_at(events, hi_i), _state_at(events, hi_j))
        plan = t.changes_plan(vi, vj)
        assert plan == ("diff" if i <= 2 <= j - 1 else "incremental"), (i, j)
        for mode in ("auto", "diff"):
            got = {}
            for r in t.changes(vi, vj, mode=mode).collect():
                got[(r["repo"], r["path"])] = (
                    r["_change_type"],
                    (r["commit"], r["lang"], r["content"]))
            assert got == exp, (i, j, mode)
