from .timer import PerformanceTimer, ZHPM
from .driver import CloudscDriver

__all__ = ["PerformanceTimer", "ZHPM", "CloudscDriver"]
