"""Test configuration: run everything on CPU with 8 fake devices.

Must set XLA flags BEFORE jax is imported anywhere (SURVEY.md §4.4:
distributed tests without a cluster).  Pallas kernels transparently fall
back to interpret mode off-TPU (utils.platform.pallas_interpret).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the tunneled
# TPU) and a site hook rewrites the env var back at jax import time, so
# the only reliable override is jax.config.update after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Flush silent numeric failures in any op/program the suite runs
# (SURVEY.md §4: jax_debug_nans in tests).
jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    """Fresh fixed-seed generator PER TEST: a session-scoped stateful
    generator made every tolerance-gated test's input depend on which
    tests ran before it (running a file alone vs in the suite changed
    the data — test_banded_solver_in_driver flaked exactly this way)."""
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def frame_pair():
    """A realistic-ish gray frame pair with smooth global motion.

    Smooth content (band-limited noise) + known translation, the regime
    where classical flow methods are accurate — good for oracle parity.
    """
    from tests.fixtures import smooth_pair
    return smooth_pair(np.random.default_rng(7), h=96, w=128,
                       dx=2.3, dy=-1.1)


@pytest.fixture(scope="session")
def tiny_clip(tmp_path_factory):
    """A small synthetic mp4 with a moving square, on disk."""
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.io.video import synthesize_video
    d = tmp_path_factory.mktemp("clips")
    frames = moving_square_frames(num=12, h=120, w=160, step=(2, 1))
    path = str(d / "square.mp4")
    synthesize_video(path, frames, fps=12.0)
    return path
