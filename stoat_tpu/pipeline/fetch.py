"""Device→host result fetching.

Every ``np.asarray`` on a device array pays a full transfer round trip —
over the axon tunnel that is tens of milliseconds of latency per array.
``fetch_all`` starts non-blocking host copies for EVERY output first, so
the transfers overlap and a whole result dict costs one round trip.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["fetch_all"]


def fetch_all(out: Dict[str, object]) -> Dict[str, np.ndarray]:
    for value in out.values():
        copy_async = getattr(value, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    return {key: np.asarray(value) for key, value in out.items()}
