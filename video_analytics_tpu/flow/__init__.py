from video_analytics_tpu.flow.farneback import (  # noqa: F401
    farneback,
    farneback_jit,
)
from video_analytics_tpu.flow.tvl1 import (  # noqa: F401
    tvl1,
    tvl1_jit,
)
