from .state import StreamingTail, TailConfig, tail_output_schema
from .sink import write_batch_idempotent
from .job import StreamingJob

__all__ = [
    "StreamingJob",
    "StreamingTail",
    "TailConfig",
    "tail_output_schema",
    "write_batch_idempotent",
]
