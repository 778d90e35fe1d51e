from . import text, ids, hashing  # noqa: F401
