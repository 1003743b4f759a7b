from .file_stream import stream_wrf_push, windowed_obs_resample
from .stateful import running_gauge_totals

__all__ = ["stream_wrf_push", "windowed_obs_resample", "running_gauge_totals"]
