from .changestream import (  # noqa: F401
    CHANGE_SCHEMA,
    DERIVED_STREAM_SQL,
    derived_changestream,
    synthetic_changestream,
)
