"""Driver-side JSON config (reference: conf/config.json +
/root/reference/src/utils/config.py:5-11).

Note the reference config carries the key typo ``schdeule_interval``
while the app reads ``schedule_interval`` with a default of 60
(/root/reference/src/app/streamlit_app.py:41); ``get`` preserves that
defaulting behavior — unknown keys fall back rather than raise.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

DEFAULTS: dict[str, Any] = {
    "batch_size": 30_000,
    "schedule_interval": 60,
    "downsample_intervals": ["30m", "1h", "1d", "1mo", "1y"],
}


def load_config(path: str | Path | None = None) -> dict[str, Any]:
    cfg = dict(DEFAULTS)
    if path is not None and Path(path).exists():
        cfg.update(json.loads(Path(path).read_text()))
    return cfg


def get(cfg: dict[str, Any], key: str, default: Any = None) -> Any:
    return cfg.get(key, DEFAULTS.get(key, default))


__all__ = ["DEFAULTS", "load_config", "get"]
