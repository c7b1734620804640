from .hashing import stable_hash_strings  # noqa: F401
