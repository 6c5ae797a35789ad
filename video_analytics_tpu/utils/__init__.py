from video_analytics_tpu.utils.platform import (  # noqa: F401
    on_tpu,
    pallas_interpret,
    default_compute_dtype,
)
