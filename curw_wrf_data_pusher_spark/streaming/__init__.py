from .file_stream import stream_wrf_push, windowed_obs_resample

__all__ = ["stream_wrf_push", "windowed_obs_resample"]
