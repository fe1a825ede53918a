"""Independent pure-Python replay oracle (SURVEY.md §5 "our test strategy").

Replays a change-event list row by row into a dict — deliberately the
dumbest possible implementation, sharing no code with the engine — and
returns the expected final table state for sha256 comparison.
"""

from __future__ import annotations

import hashlib


def replay_oracle(events: list[dict], observed_tables: set[str] = frozenset({"files"})) -> dict:
    """events: dicts with gtid, op, table_name, before/after dicts (or None),
    keyed on (repo, path). Returns {(repo, path): row_dict}."""
    state: dict = {}
    for e in sorted(events, key=lambda e: e["gtid"]):
        op = e["op"]
        if op == "TRUNCATE":
            # truncate clears the target only if its table is observed into
            # this state (multi-table: a TRUNCATE of repos.files must not
            # clear shadow_table's state)
            if e.get("table_name", "files") in observed_tables:
                state.clear()
            continue
        if op not in ("INSERT", "UPDATE", "DELETE"):
            continue
        if e.get("table_name", "files") not in observed_tables:
            continue
        before, after = e.get("before"), e.get("after")
        if op == "INSERT":
            state[(after["repo"], after["path"])] = dict(after)
        elif op == "DELETE":
            state.pop((before["repo"], before["path"]), None)
        else:  # UPDATE — binlog PK-change semantics
            bkey = (before["repo"], before["path"])
            akey = (after["repo"], after["path"])
            if bkey != akey:
                state.pop(bkey, None)
            state[akey] = dict(after)
    return state


def state_fingerprint(state: dict) -> str:
    """Order-insensitive sha256 over (repo, path, sha256(content), commit, lang)."""
    items = []
    for (repo, path), row in state.items():
        c = row.get("content")
        csha = hashlib.sha256(c.encode()).hexdigest() if c is not None else "null"
        items.append((repo, path, csha, row.get("commit") or "", row.get("lang") or ""))
    h = hashlib.sha256()
    for t in sorted(items):
        h.update(("|".join(t) + "\n").encode())
    return h.hexdigest()


def df_fingerprint(rows: list[dict]) -> str:
    """Same fingerprint from collected engine rows."""
    state = {(r["repo"], r["path"]): r for r in rows}
    return state_fingerprint(state)
