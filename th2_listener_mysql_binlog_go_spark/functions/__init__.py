from .caching import release_cache, tag_cached  # noqa: F401
