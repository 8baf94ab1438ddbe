"""Structured Streaming layer (beyond-reference extension, SURVEY §7
step 8): streaming ingestion of the events table with watermarked
tumbling windows, and gap-based sessionization both as a batch
window-function pipeline and as a custom stateful streaming operator
(``applyInPandasWithState``).
"""

from .jobs import (
    sessionize_batch,
    sessionize_stream,
    stream_tumbling_agg,
)

__all__ = ["sessionize_batch", "sessionize_stream", "stream_tumbling_agg"]
