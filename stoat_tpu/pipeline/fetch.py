"""Device→host result fetching.

Every ``np.asarray`` on a device array pays a full transfer round trip —
over the axon tunnel that is tens of milliseconds of latency per array.
``fetch_all`` starts non-blocking host copies for EVERY output first, so
the transfers overlap and a whole result dict costs one round trip.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["fetch_all", "fetch_async"]


def fetch_async(out: Dict[str, object]) -> Dict[str, object]:
    """Start non-blocking host copies for every output and return the
    dict of device arrays as-is.

    The pipelined writer (pipeline/runner.py) calls this on dispatch and
    materializes each array (``np.asarray``) on its own thread later, so
    device→host transfers of chunk N overlap the dispatch of chunk N+1
    and the next chromosome's ingest."""
    for value in out.values():
        copy_async = getattr(value, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
    return out


def fetch_all(out: Dict[str, object]) -> Dict[str, np.ndarray]:
    return {key: np.asarray(value)
            for key, value in fetch_async(out).items()}
