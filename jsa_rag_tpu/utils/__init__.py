from .schedulers import (  # noqa: F401
    IndexRefreshScheduler, make_lr_schedule,
)
from .stats import WeightedAvgStats  # noqa: F401
