"""Worker-local broadcast cache.

The broadcast-small-side pattern: ``ray.put`` the payload once on the
driver, ship only the ObjectRef with each task, and deserialize the
payload at most once per worker process.  Plain map TASKS with this cache
beat actor pools for broadcast joins on warm clusters: tasks reuse warm
workers (no actor ramp-up, ~2-4 s per stage on a fresh session) and Ray
balances them freely across the cluster.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any

_CACHE: "OrderedDict[str, Any]" = OrderedDict()
_MAX_ENTRIES = 4


def cached_get(ref) -> Any:
    """``ray.get(ref)``, memoized per worker process (small LRU)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = ray.get(ref)
    _CACHE[key] = val
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val
