"""Engine (schema) pool with content-checksum reload.

The Spark analog of Mondrian's ``RolapSchemaPool`` as the reference wraps
it (``lib/mondrian/olap/connection.rb:120-181`` schema keys / flush
surface; ``:325-326`` ``UseContentChecksum=true`` is the default;
behavior ``test/query_test.rb:1162-1213``):

* connections against the same catalog SHARE one schema instance — and
  therefore its engines and aggregate caches — so a reconnect keeps
  serving cached cells (stale until a flush, exactly the reference's
  schema-cache test);
* the pool key is ``<content key, connection key>`` (Mondrian's
  ``SchemaKey = (SchemaContentKey, ConnectionKey)``): with
  ``use_content_checksum`` (the default) the content key is a digest of
  the catalog XML text, so EDITING the catalog yields a new key → a
  fresh schema with fresh caches, while the old entry stays pooled for
  connections still keyed to the old content;
* ``flush_schema`` (one key) and ``flush_schema_cache`` (whole pool)
  drop entries and flush their engines' aggregate caches — the next
  connect rebuilds from the loader (``flushSchema`` /
  ``RolapSchemaPool.clear`` in the reference).

The "connection key" stands in for the JDBC connection string: callers
pass whatever identifies the DATA binding (a warehouse path, an
environment name).  ``tables`` may be a ready mapping or a zero-arg
loader callable — the loader runs only on a pool MISS, mirroring the
reference where a pooled schema never re-reads the catalog or re-opens
the database.
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections.abc import Mapping

from .catalog_xml import from_mondrian_xml
from .star import CubeEngine


def _catalog_text(catalog: str) -> str:
    """The catalog XML text — ``catalog`` is a file path or the text
    itself (the same duality ``from_mondrian_xml`` accepts)."""
    if "<" in catalog:
        return catalog
    if not os.path.exists(catalog):
        raise FileNotFoundError(catalog)
    with open(catalog, encoding="utf-8") as f:
        return f.read()


class SchemaHandle:
    """A pooled schema: parsed model + shared per-cube engines.

    The analog of the reference connection's schema surface
    (``connection.rb`` ``cube_names`` / ``cube`` / ``schema_key`` /
    ``flush_schema``)."""

    def __init__(self, pool: "EnginePool", key: tuple, schema, virtuals,
                 tables: Mapping):
        self._pool = pool
        self._key = key
        self.schema = schema
        self.virtual_cubes = virtuals
        self._tables = tables
        self._engines: dict[str, CubeEngine] = {}
        self._lock = threading.Lock()

    @property
    def schema_key(self) -> str:
        """``<content key, connection key>`` — Mondrian's
        ``SchemaKey.toString`` shape (connection.rb:112-140)."""
        return f"<{self._key[0]}, {self._key[1]}>"

    @property
    def cube_names(self) -> list[str]:
        return [c.name for c in self.schema.cubes]

    def engine(self, cube_name: str) -> CubeEngine:
        """The shared engine for one cube — built once per pool entry,
        aggregate cache enabled so repeat queries (and repeat
        connections) serve cached cells until a flush."""
        with self._lock:
            eng = self._engines.get(cube_name)
            if eng is None:
                cube = self.schema.cube(cube_name)
                eng = CubeEngine(
                    cube,
                    self._tables,
                    parameters=self.schema.parameters,
                    roles=self.schema.roles,
                )
                eng.enable_cache()
                self._engines[cube_name] = eng
            return eng

    def flush_schema(self) -> None:
        """Remove THIS schema from the pool and flush its caches — the
        next connect rebuilds it (connection.rb:172-181 flush_schema;
        query_test.rb:1201-1205)."""
        self._pool.flush_schema(self.schema_key)

    def _flush_engines(self) -> None:
        for eng in self._engines.values():
            if eng.cache:
                eng.cache.flush_all()


class EnginePool:
    """The schema pool.  ``EnginePool.instance()`` is the process-wide
    singleton (``RolapSchemaPool.instance()``); independent pools can be
    constructed for isolation in tests."""

    _instance: "EnginePool | None" = None
    _instance_lock = threading.Lock()

    @classmethod
    def instance(cls) -> "EnginePool":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def __init__(self):
        self._pool: dict[tuple, SchemaHandle] = {}
        self._lock = threading.Lock()

    def connect(
        self,
        catalog: str,
        tables,
        connection_key: str = "",
        use_content_checksum: bool = True,
    ) -> SchemaHandle:
        """Get-or-create the schema for ``catalog`` + ``connection_key``.

        ``tables``: a mapping of table name → DataFrame, or a zero-arg
        callable returning one (invoked only on a pool miss).  With
        ``use_content_checksum`` (the reference default,
        connection.rb:325-326) the pool key digests the catalog CONTENT,
        so an edited catalog transparently builds a fresh schema; with
        ``False`` the key is the catalog string itself and an edited
        file keeps serving the stale pooled schema until a flush."""
        text = _catalog_text(catalog)
        content_key = (
            hashlib.md5(text.encode("utf-8")).hexdigest()
            if use_content_checksum
            else catalog
        )
        key = (content_key, connection_key)
        with self._lock:
            handle = self._pool.get(key)
        if handle is not None:
            return handle
        # build OUTSIDE the lock: catalog parsing and the table loader may
        # be slow (or re-enter the pool for a shared base schema) —
        # holding the pool-wide lock across them would serialize every
        # connect and deadlock re-entrant loaders.  Concurrent same-key
        # builds race benignly: first insert wins, the loser's handle is
        # dropped (Mondrian's pool makes the same trade).
        schema, virtuals = from_mondrian_xml(text)
        resolved = tables() if callable(tables) else tables
        handle = SchemaHandle(self, key, schema, virtuals, resolved)
        with self._lock:
            return self._pool.setdefault(key, handle)

    def flush_schema(self, schema_key: str) -> bool:
        """Remove one schema by its ``<content, connection>`` key string
        (connection.rb:176-181 class-level flush_schema)."""
        with self._lock:
            for key, handle in list(self._pool.items()):
                if handle.schema_key == schema_key:
                    del self._pool[key]
                    handle._flush_engines()
                    return True
            return False

    def flush_schema_cache(self) -> int:
        """Clear the whole pool (``RolapSchemaPool.clear`` —
        connection.rb:153-168); returns the number of schemas dropped."""
        with self._lock:
            n = len(self._pool)
            for handle in self._pool.values():
                handle._flush_engines()
            self._pool.clear()
            return n

    def size(self) -> int:
        with self._lock:
            return len(self._pool)
