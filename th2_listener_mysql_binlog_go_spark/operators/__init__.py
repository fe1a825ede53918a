from .lww import lww_dedup  # noqa: F401
from .apply import BatchApplier, ApplyConfig  # noqa: F401
from .asof import asof_join  # noqa: F401
