from .lake import TranscriptLake  # noqa: F401
from .manifest import PartitionManifest, write_json_atomic  # noqa: F401
