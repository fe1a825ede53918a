from .lake import LakeTable, Snapshot, ColumnSpec  # noqa: F401
