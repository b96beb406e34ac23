"""Path normalization for the sink surface.

Every durable-sink protocol in this package (dir swap markers,
partition-swap staging, snapshot manifests) records or derives
filesystem locations that may be re-resolved LATER — by a recovery
pass, a vacuum, or a reader — possibly from a different working
directory than the writer's. A caller-supplied RELATIVE path would
then silently point each of those phases at different absolute
locations (round 3's vacuum data-loss bug was exactly this class).

The fix is one contract, applied uniformly: every public sink API
normalizes its path argument(s) to absolute at entry, so all derived
state is cwd-independent no matter where recovery later runs.
"""

from __future__ import annotations

import functools
import inspect
import os


def normalizes_paths(*arg_names: str):
    """Decorator: ``os.path.abspath`` the named string arguments at
    call time (None and non-str values pass through untouched)."""
    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            for name in arg_names:
                val = bound.arguments.get(name)
                if isinstance(val, str):
                    bound.arguments[name] = os.path.abspath(val)
            return fn(*bound.args, **bound.kwargs)

        return wrapper

    return deco


__all__ = ["normalizes_paths"]
