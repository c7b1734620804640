from .replay import ChangeNormalizer, replay_into_lake, replay_to_table  # noqa: F401
