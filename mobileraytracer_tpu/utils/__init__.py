from .metrics import PhaseTimer, RunMetrics  # noqa: F401
