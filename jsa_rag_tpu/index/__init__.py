from .flat import ShardedFlatIndex  # noqa: F401
