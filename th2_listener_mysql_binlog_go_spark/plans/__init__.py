from .lake import ColumnSpec, ConcurrentCommitError, LakeTable, Snapshot  # noqa: F401
from .catalog import LakeCatalog  # noqa: F401
