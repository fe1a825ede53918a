from .lineage import LineageWriter  # noqa: F401
from .runner import ReplayRunner  # noqa: F401
from .structured import (  # noqa: F401
    ChangesFeedPublisher,
    StreamingApplier,
    StreamingCatalogApplier,
    StreamingWireApplier,
    StreamingWireCatalogApplier,
    StreamingWirePublisher,
)
