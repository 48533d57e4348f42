from .events import (  # noqa: F401
    interval_join,
    sessionized_counts,
    sliding_event_rates,
    streaming_dedup,
    tumbling_event_counts,
    user_activity_state,
)
from .corpus import ingest_corpus_stream, read_corpus_stream  # noqa: F401
