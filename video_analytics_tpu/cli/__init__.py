from video_analytics_tpu.cli.main import main  # noqa: F401
