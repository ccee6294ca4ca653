from wdel_spark.sources.snapshot import (
    write_snapshot,
    read_snapshot,
    snapshot_is_valid,
    read_manifest,
)

__all__ = [
    "write_snapshot",
    "read_snapshot",
    "snapshot_is_valid",
    "read_manifest",
]
