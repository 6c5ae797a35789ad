from video_analytics_tpu.ops.pallas.warp import pallas_warp, pallas_warp_cf  # noqa: F401
