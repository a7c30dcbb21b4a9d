"""Structured Streaming layer (≈ Pixels-Retina ingestion + event-time ops).

- ``ingest``  : micro-batch CDC ingestion into an MvccTable via foreachBatch
                (≈ RetinaService insert/flush pipeline; freshness = trigger
                interval vs the reference's 10-ms MemTable reads).
- ``windows`` : watermarked tumbling/sliding/session event-time windows —
                absent from the reference (Retina is commit-ts CDC replay,
                SURVEY.md §2.9) but required by the fixtures; Spark-native.
- ``stateful``: custom per-key state machine via applyInPandasWithState
                (exactly-once closed-session emission with event-time
                timeouts) — the template for operators session_window
                can't express.
"""

from .ingest import ingest_cdc_stream, ingest_stream
from .rollup import continuous_rollup, rollup_with_tail
from .stateful import sessionize_stateful
from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "ingest_stream",
    "ingest_cdc_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "sessionize_stateful",
    "continuous_rollup",
    "rollup_with_tail",
]
