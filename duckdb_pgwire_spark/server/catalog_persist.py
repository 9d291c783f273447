"""Persistent wire-layer catalog (ENUM types, type aliases, macros,
sequence state).

DuckDB persists CREATE TYPE / CREATE MACRO / CREATE SEQUENCE — and a
sequence's counter — inside the database file, so they survive a
process restart (the reference reaches all of them through its
``conn.Prepare(query)`` delegation, duckdb_pgwire_extension.cpp:52).
The Spark analogue: Spark-native objects (tables, permanent views)
already persist in the Spark catalog / warehouse directory; the four
object kinds that live in THIS layer's process memory
(``compat.ENUM_TYPES`` / ``TYPE_ALIASES`` / ``MACROS`` /
``SEQUENCES``) are mirrored to one JSON sidecar in the same warehouse
directory — loaded when the server starts, rewritten (atomic
tmp+rename) after every DDL and every sequence-block reservation via
``compat.CATALOG_LISTENERS``.

A server without a catalog directory (``PgWireServer(catalog_dir=
None)``, the test default) keeps the old process-scope semantics —
DuckDB's ``:memory:`` connection behaves the same way.

One ACTIVE catalog per process (module-level ``_PATH``; the last
``enable()`` wins) — the deployment model is one server per process,
and the compat dicts being mirrored are process-global anyway.
"""

from __future__ import annotations

import json
import logging
import os
import threading

from . import compat

log = logging.getLogger("pgwire.catalog")

_LOCK = threading.Lock()
_PATH: str | None = None

CATALOG_FILENAME = "_pgwire_catalog.json"


def catalog_file(dir_: str) -> str:
    return os.path.join(dir_, CATALOG_FILENAME)


def enable(dir_: str) -> None:
    """Load any persisted catalog from ``dir_`` into the compat dicts
    and start mirroring every mutation back to it."""
    global _PATH
    os.makedirs(dir_, exist_ok=True)
    _PATH = catalog_file(dir_)
    load_into_memory(_PATH)
    if save not in compat.CATALOG_LISTENERS:
        compat.CATALOG_LISTENERS.append(save)


def disable() -> None:
    global _PATH
    _PATH = None
    try:
        compat.CATALOG_LISTENERS.remove(save)
    except ValueError:
        pass


def load_into_memory(path: str) -> None:
    """Merge a persisted catalog into the process dicts. Definitions
    already present in memory win (the running process is newer than
    the file it is about to overwrite)."""
    try:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
    except FileNotFoundError:
        return
    except (OSError, json.JSONDecodeError) as exc:
        # our own sidecar, so corruption means a crashed write — start
        # empty rather than refusing to boot, but say so
        log.warning("unreadable catalog sidecar %s: %s", path, exc)
        return
    if not isinstance(data, dict):
        log.warning("catalog sidecar %s is not an object; ignored", path)
        return
    for name, members in (data.get("enums") or {}).items():
        if name not in compat.ENUM_TYPES and isinstance(members, list):
            compat.ENUM_TYPES[name] = [str(m) for m in members]
    for name, spark_type in (data.get("type_aliases") or {}).items():
        if name not in compat.TYPE_ALIASES and isinstance(spark_type, str):
            compat.TYPE_ALIASES[name] = spark_type
    for name, mac in (data.get("macros") or {}).items():
        if name not in compat.MACROS and isinstance(mac, list) and len(mac) == 2:
            params_raw, body = mac
            params = [
                (str(p[0]), None if p[1] is None else str(p[1]))
                for p in params_raw
                if isinstance(p, list) and len(p) == 2
            ]
            compat.MACROS[name] = (params, str(body))
    for name, seq in (data.get("sequences") or {}).items():
        if name not in compat.SEQUENCES and isinstance(seq, dict):
            try:
                compat.SEQUENCES[name] = {
                    "next": int(seq["next"]),
                    "inc": int(seq["inc"]),
                    "cur": None if seq.get("cur") is None else int(seq["cur"]),
                }
            except (KeyError, TypeError, ValueError):
                log.warning("catalog sidecar: bad sequence %r skipped", name)


def save() -> None:
    if _PATH is None:
        return
    # snapshot under the compat-side catalog lock: statements run on a
    # thread pool, and iterating these dicts during a concurrent CREATE
    # TYPE/MACRO/SEQUENCE raises 'dictionary changed size' mid-query
    with compat.CATALOG_LOCK:
        data = {
            "enums": dict(compat.ENUM_TYPES),
            "type_aliases": dict(compat.TYPE_ALIASES),
            "macros": {
                k: [[list(p) for p in params], body]
                for k, (params, body) in compat.MACROS.items()
            },
            "sequences": {k: dict(v) for k, v in compat.SEQUENCES.items()},
        }
    with _LOCK:  # serialize the tmp+rename, file I/O outside CATALOG_LOCK
        tmp = _PATH + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, separators=(",", ":"))
        os.replace(tmp, _PATH)
