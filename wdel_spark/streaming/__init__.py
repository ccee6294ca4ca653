from wdel_spark.streaming.stream_pipeline import run_streaming_assignments

__all__ = ["run_streaming_assignments"]
