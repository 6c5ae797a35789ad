from video_analytics_tpu.flow.farneback import (  # noqa: F401
    farneback,
    farneback_jit,
)
