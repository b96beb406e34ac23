"""Named-table CATALOG — the missing indirection between SQL names
and table paths.

Before this, every ``snapshot_sql`` call carried a ``{name: path}``
dict and every ``load_table`` call carried ``sf_dir`` — workable from
Python, hostile from SQL. A :class:`Catalog` is a tiny persistent
registry (one JSON file under a root directory) mapping table names
to ``{path, format}``:

* ``format='snapshot'`` — the native log (``_snapshots/``),
* ``format='delta'``   — a foreign Delta Lake directory read through
  the wire-format bridge,
* ``format='iceberg'`` — an Apache Iceberg v2 directory read through
  the wire-format bridge,
* ``format='auto'``    — decide per-read from what's on disk (a
  native log wins when both exist, matching ``snapshot_sql``).

``CREATE TABLE`` statements routed through :func:`snapshot_sql`
register new names here with a default location under the catalog
root, so a warehouse user never touches a path. The registry file is
swapped atomically (write-temp + ``os.replace``) and re-read per
operation — cheap (it is one small JSON document, not a manifest) and
safe under concurrent readers.

Reference parity note: the reference pipeline hard-codes its table
locations (src/serve/load.py wires one SQLite table name per flow);
a catalog is the generalization a multi-table lakehouse needs.
"""

from __future__ import annotations

import json
import os
import re
import uuid

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*$")
_FORMATS = ("auto", "snapshot", "delta", "iceberg")


class Catalog:
    """A persistent name → (path, format) registry rooted at a
    directory. New tables default to ``<root>/<name>``."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    @property
    def _file(self) -> str:
        return os.path.join(self.root, "catalog.json")

    def _load(self) -> dict:
        try:
            with open(self._file, encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {"tables": {}}

    def _store(self, doc: dict) -> None:
        tmp = self._file + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._file)

    def register(
        self, name: str, path: str | None = None, format: str = "auto",
        replace: bool = False,
    ) -> str:
        """Bind ``name`` to ``path`` (default: ``<root>/<name>``).
        Re-binding an existing name needs ``replace=True`` — a silent
        re-point would orphan the old table. Returns the bound path."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid table name {name!r}")
        if format not in _FORMATS:
            raise ValueError(f"format must be one of {_FORMATS}")
        doc = self._load()
        if name in doc["tables"] and not replace:
            have = doc["tables"][name]["path"]
            if path is not None and os.path.abspath(path) != have:
                raise ValueError(
                    f"table {name!r} is already registered at {have}; "
                    "pass replace=True to re-point it"
                )
            return have
        p = os.path.abspath(path) if path else os.path.join(
            self.root, name
        )
        doc["tables"][name] = {"path": p, "format": format}
        self._store(doc)
        return p

    def unregister(self, name: str) -> None:
        """Drop the NAME BINDING only — data stays on disk (the
        DROP TABLE here is metadata-only, like an external table)."""
        doc = self._load()
        if name not in doc["tables"]:
            raise KeyError(f"no table named {name!r} in this catalog")
        del doc["tables"][name]
        self._store(doc)

    def resolve(self, name: str) -> dict:
        """``{path, format}`` for ``name``; KeyError when unbound."""
        doc = self._load()
        if name not in doc["tables"]:
            raise KeyError(f"no table named {name!r} in this catalog")
        return dict(doc["tables"][name])

    def table_path(self, name: str) -> str:
        return self.resolve(name)["path"]

    def tables(self) -> dict[str, dict]:
        """Every binding, name → ``{path, format}``."""
        return {k: dict(v) for k, v in self._load()["tables"].items()}

    def __contains__(self, name: str) -> bool:
        return name in self._load()["tables"]


__all__ = ["Catalog"]
