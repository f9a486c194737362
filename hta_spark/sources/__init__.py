from .store import HtaStore, Metric

__all__ = ["HtaStore", "Metric"]
