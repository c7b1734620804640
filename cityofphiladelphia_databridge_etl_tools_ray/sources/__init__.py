from .changelog import read_change_log  # noqa: F401
