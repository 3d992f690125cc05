from .metrics import compute_metrics_batch, compute_metrics  # noqa: F401
