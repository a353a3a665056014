from .frontier_stream import (  # noqa: F401
    stream_host_rates,
    stream_politeness_throttle,
    stream_tumbling_hourly,
    stream_windowed_counts,
)
