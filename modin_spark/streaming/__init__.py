from modin_spark.streaming.resample import stream_resample, stream_session_windows

__all__ = ["stream_resample", "stream_session_windows"]
