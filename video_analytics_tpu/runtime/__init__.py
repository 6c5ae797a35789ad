from video_analytics_tpu.runtime.pipeline import (  # noqa: F401
    flow_from_frames,
    rgb_features,
    flow_features,
    classify_window,
    classify_batch,
    sample_window,
)
from video_analytics_tpu.runtime.checkpoint import (  # noqa: F401
    save_variables,
    load_variables,
)
from video_analytics_tpu.runtime.evaluate import (  # noqa: F401
    evaluate,
    classify_clip_file,
    EvalResult,
)
