"""video_analytics_tpu — a TPU-native video-analytics framework.

A ground-up rebuild of the capabilities of ``arindamrc/video_analytics``
(reference mounted at /root/reference; see SURVEY.md) designed TPU-first:

- decoded frames flow through a fused JAX/XLA preprocessing stage
  (resize, crop, normalize, frame stacking) straight into on-device
  per-frame CNN feature extraction;
- dense optical flow (Farneback, TV-L1: pyramidal warp-and-solve) is
  implemented as JAX/Pallas TPU kernels instead of OpenCV CPU calls;
- the two-stream (RGB + flow) architecture with temporal pooling and a
  classification head runs end-to-end on TPU with double-buffered HBM
  prefetch, so the host only does container demux and frame decode;
- scaling is expressed via ``jax.sharding.Mesh`` + ``NamedSharding``
  (data parallel over clips), with XLA collectives over ICI/DCN.

Public CLI surface (matches the reference scripts):
``extract-frames``, ``compute-flow``, ``extract-features``,
``classify-clip`` — see ``video_analytics_tpu.cli``.
"""

__version__ = "0.1.0"

from video_analytics_tpu.config import (  # noqa: F401
    FarnebackConfig,
    TVL1Config,
    PreprocessConfig,
    PipelineConfig,
)
