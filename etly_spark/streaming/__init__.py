from etly_spark.streaming.transfer import StreamingTransferService  # noqa: F401
from etly_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    stateful_running_totals,
    streaming_dedupe,
    tumbling_agg,
)
