from .pipeline import (
    route_stream_from_directory,
    snapshot_then_stream_paths,
    stream_lines_from_directory,
)
from .stateful import running_totals
from .supervisor import RestartSupervisor
from .windows import (
    sessionized,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "stream_lines_from_directory",
    "route_stream_from_directory",
    "snapshot_then_stream_paths",
    "tumbling_counts",
    "sessionized",
    "streaming_dedup",
    "running_totals",
    "RestartSupervisor",
]
