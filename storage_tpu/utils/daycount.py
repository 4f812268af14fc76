"""Day-count conventions.

Replaces the reference's ``cmdty_storage/time_func.py`` (act_365) and the .NET
``TimeFunctions.Act365`` used by the spot-price simulator.
"""
from __future__ import annotations

import numpy as np

from .frequencies import PeriodLike, to_day


def act_365(start: PeriodLike, end: PeriodLike) -> float:
    """Act/365 year fraction between two date-likes.

    Reference: ``cmdty_storage/time_func.py:30-33``.
    """
    return (to_day(end) - to_day(start)).days / 365.0


def act_365_array(start: PeriodLike, ends) -> np.ndarray:
    """Vectorised Act/365 year fractions from ``start`` to each element of ``ends``."""
    start_day = to_day(start)
    return np.array([(to_day(e) - start_day).days / 365.0 for e in ends], dtype=np.float64)
