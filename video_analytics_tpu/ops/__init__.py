from video_analytics_tpu.ops.preprocess import (  # noqa: F401
    resize_bilinear,
    resize_short_side,
    center_crop,
    random_crop_flip,
    normalize,
    preprocess_clip,
    preprocess_clip_jit,
    rgb_to_gray,
    stack_flow_windows,
    normalize_flow_stack,
    stacked_flow_input,
)
