from etly_spark.streaming.transfer import StreamingTransferService  # noqa: F401
from etly_spark.streaming.windows import (  # noqa: F401
    interval_join,
    session_agg,
    sliding_agg,
    stateful_running_totals,
    streaming_dedupe,
    tumbling_agg,
)
