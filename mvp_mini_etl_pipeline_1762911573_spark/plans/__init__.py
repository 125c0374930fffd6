from .pipeline import flagship_metrics_row, run_pipeline  # noqa: F401
