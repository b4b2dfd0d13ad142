from mit_6_5840_mapreduce_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    sessionized_stream,
    user_running_totals_stream,
    windowed_counts_stream,
)
