from lakehouse_workshop_spark.streaming.jobs import (
    run_streaming_windowed_counts,
    sessionize_stateful,
)

__all__ = ["run_streaming_windowed_counts", "sessionize_stateful"]
