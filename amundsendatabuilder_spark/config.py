"""Scoped-config shim (reference: databuilder/__init__.py:9-75 — HOCON
trees namespaced per component with fallbacks).

The engine itself takes constructor arguments, but users migrating from
the reference carry nested option dicts keyed the same way
('extractor.csv.file_location', 'publisher.neo4j.neo4j_transaction_size').
``Scoped`` gives those dicts the reference's scope()/fallback behavior
with zero dependencies.
"""

from __future__ import annotations

from typing import Any


class Scoped:
    """Dot-namespaced view over a flat or nested dict with fallbacks.

    >>> conf = Scoped({"publisher.neo4j.transaction_size": 500,
    ...                "job.identifier": "daily"})
    >>> conf.scope("publisher.neo4j").get("transaction_size")
    500
    >>> conf.scope("publisher.neo4j").get("missing", 10)
    10
    """

    def __init__(self, options: dict[str, Any], prefix: str = ""):
        flat: dict[str, Any] = {}

        def flatten(d: dict, path: str) -> None:
            for k, v in d.items():
                key = f"{path}.{k}" if path else str(k)
                if isinstance(v, dict):
                    flatten(v, key)
                else:
                    flat[key] = v

        flatten(options, "")
        self._flat = flat
        self._prefix = prefix

    def scope(self, prefix: str) -> "Scoped":
        full = f"{self._prefix}.{prefix}" if self._prefix else prefix
        out = Scoped({}, full)
        out._flat = self._flat
        return out

    def get(self, key: str, default: Any = None) -> Any:
        full = f"{self._prefix}.{key}" if self._prefix else key
        if full in self._flat:
            return self._flat[full]
        # reference fallback: unscoped default tree (Scoped.get_scoped_conf
        # with_fallback semantics)
        return self._flat.get(key, default)

    def with_fallback(self, other: "Scoped") -> "Scoped":
        merged = dict(other._flat)
        merged.update(self._flat)
        out = Scoped({}, self._prefix)
        out._flat = merged
        return out
