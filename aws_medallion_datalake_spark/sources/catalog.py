"""File-backed table catalog: the Glue Data Catalog analogue.

The reference registers every layer's tables in the AWS Glue Data
Catalog so jobs and the SQL console resolve names to S3 locations
(/root/reference/scripts/silver_digit_clean.py:131-235,
terraform/glue_database.tf:2-19 — SURVEY.md §2.1 S5/S9). The engine's
:class:`~.tableformat.Table` carries its own schema/snapshots; what the
catalog adds is the NAME → table-root indirection shared by every
session and process.

:class:`Catalog` is that registry as a versioned JSON file, using the
same optimistic-concurrency pattern as table commits: each mutation
writes ``catalog-v{N+1}.json`` with ``open(…, "x")`` (the CAS — two
racing writers cannot both create the same version) and then moves the
``version-hint.text`` pointer; a lost race re-reads and retries the
mutation against the new head. Readers are wait-free (hint → one JSON
read). Entries are just ``{name: table_root}`` — the table's own
metadata stays authoritative for everything else, exactly like
Iceberg's catalog-pointer model (the catalog stores a pointer, never
schema copies that can drift like the reference's Glue DDL does,
SURVEY.md §1.4 note on schema drift).

It implements ``MutableMapping[str, Table]``, so ``EngineSQL(spark,
Catalog(path))`` gives the SQL surface durable CREATE/DROP: a second
process (or the ``python -m …sqlcmd --catalog`` CLI) sees the table
immediately.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import MutableMapping
from typing import Iterator

from .tableformat import Table


class CatalogConflictError(RuntimeError):
    """A catalog mutation lost too many CAS races."""


class Catalog(MutableMapping):
    """Durable ``{name: Table}`` mapping backed by ``<dir>/catalog-v*.json``.

    Names may be namespaced with dots (``gold.fact_images``). Values
    assigned must be :class:`Table` instances (their ``root`` is what's
    persisted); reads lazily ``Table.load`` and cache per root.
    """

    def __init__(self, path: str):
        self.dir = path
        os.makedirs(self.dir, exist_ok=True)
        self._cache: dict = {}
        if not os.path.exists(self._hint):
            try:
                self._write_version(0, {})
            except FileExistsError:  # racing initializer won; fine
                pass

    # ---------- versioned storage ----------

    @property
    def _hint(self) -> str:
        return os.path.join(self.dir, "version-hint.text")

    def _vpath(self, v: int) -> str:
        return os.path.join(self.dir, f"catalog-v{v}.json")

    def _current_version(self) -> int:
        try:
            with open(self._hint) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            # self-repair: an initializer (or hint writer) died between
            # creating catalog-v*.json and moving the hint — recover the
            # newest version file rather than staying bricked
            import re as _re

            versions = [
                int(m.group(1))
                for f_ in os.listdir(self.dir)
                if (m := _re.match(r"catalog-v(\d+)\.json$", f_))
            ]
            if not versions:
                raise
            v = max(versions)
            tmp = os.path.join(self.dir, f".hint-{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, self._hint)
            return v

    def _read(self, v: int) -> dict:
        with open(self._vpath(v)) as f:
            return json.load(f)

    def _write_version(self, v: int, entries: dict) -> None:
        # CAS: "x" fails if a racing writer already created this version
        with open(self._vpath(v), "x") as f:
            json.dump(entries, f, indent=1, sort_keys=True)
        tmp = os.path.join(self.dir, f".hint-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._hint)

    def _mutate(self, fn, max_retries: int = 10) -> None:
        for _ in range(max_retries):
            v = self._current_version()
            entries = dict(self._read(v))
            fn(entries)
            try:
                self._write_version(v + 1, entries)
                return
            except FileExistsError:
                time.sleep(0.01 * (1 + (uuid.uuid4().int & 7)))
        raise CatalogConflictError(
            f"catalog mutation still conflicting after {max_retries} attempts"
        )

    # ---------- named queries ----------
    # Stored in the same versioned JSON under a reserved key prefix —
    # Athena's workgroup named queries (reference terraform/athena.tf:31-53)
    # as catalog state: durable, CAS-consistent, visible to any session
    # opening the catalog directory.

    _NQ_PREFIX = "named_query:"

    def set_named_query(self, name: str, sql: str, *,
                        replace: bool = False) -> None:
        key = self._NQ_PREFIX + name

        def put(entries: dict) -> None:
            if not replace and key in entries:
                raise KeyError(f"named query {name!r} already exists")
            entries[key] = sql

        self._mutate(put)

    def get_named_query(self, name: str) -> str:
        raw = self._read(self._current_version())
        return raw[self._NQ_PREFIX + name]

    def drop_named_query(self, name: str) -> None:
        def drop(entries: dict) -> None:
            del entries[self._NQ_PREFIX + name]

        self._mutate(drop)

    def named_queries(self) -> dict:
        p = self._NQ_PREFIX
        raw = self._read(self._current_version())
        return {
            k[len(p):]: v for k, v in sorted(raw.items())
            if k.startswith(p)
        }

    # ---------- MutableMapping ----------

    def _entries(self) -> dict:
        ents = self._read(self._current_version())
        return {
            k: v for k, v in ents.items() if not k.startswith(self._NQ_PREFIX)
        }

    def __getitem__(self, name: str) -> Table:
        root = self._entries()[name]
        t = self._cache.get(root)
        if t is None:
            t = self._cache[root] = Table.load(root)
        return t

    def __setitem__(self, name: str, table: Table) -> None:
        if not isinstance(table, Table):
            raise TypeError(f"catalog values are Table instances, got {table!r}")

        def put(entries: dict) -> None:
            entries[name] = table.root

        self._mutate(put)
        self._cache[table.root] = table

    def __delitem__(self, name: str) -> None:
        def drop(entries: dict) -> None:
            # raising here aborts BEFORE any version write: a missing
            # key must not churn the version chain
            del entries[name]

        self._mutate(drop)

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._entries()))

    def __len__(self) -> int:
        return len(self._entries())

    def __contains__(self, name: object) -> bool:
        return name in self._entries()

    def _table_for(self, root: str) -> Table:
        t = self._cache.get(root)
        if t is None:
            t = self._cache[root] = Table.load(root)
        return t

    def items(self):
        """One catalog read for the whole listing (MutableMapping's
        default would re-read the JSON per key — O(N) file reads for a
        SELECT that registers every table)."""
        ents = self._entries()
        return [(k, self._table_for(ents[k])) for k in sorted(ents)]

    def values(self):
        return [t for _, t in self.items()]
