from . import extract, pip_join, tiles, knn, dedup  # noqa: F401
