from .lineage import LineageWriter  # noqa: F401
from .runner import ReplayRunner  # noqa: F401
from .structured import StreamingApplier, StreamingCatalogApplier, StreamingWireApplier  # noqa: F401
