from video_analytics_tpu.ops.pallas.warp import pallas_warp  # noqa: F401
