"""Name catalog for versioned tables (VERDICT r6 ask #3): the last
usability gap versus a real lakehouse — every CLI verb and reader so
far addressed tables by directory path; this maps ``name ->
table_dir`` (+ grants and comments) so users say ``table("events")``.

The catalog is ITSELF a versioned log: each state change commits a
full-state JSON document through the same :mod:`operators.commitstore`
CAS the data tables use (``v00001.json``, ``v00002.json``, ... + the
advance-only ``_latest`` pointer). That buys, for free and with zero
Spark dependency: atomic catalog updates under concurrent writers
(losers retry against the fresh state), a time-travelable history of
every create/drop/grant, and the same POSIX/object-store/HTTP backend
choices as data commits. Catalog documents are metadata-sized (one
entry per table), so full-state commits — not deltas — are the right
trade: O(tables) per change, O(1) reads.

Grants parity: the reference manages name->table + access out of band
over a psycopg2 DDL channel (``monkey_proc.py:98-120`` send_query,
``zoom_proc.py:482-486`` GRANT). Here grants are carried as catalog
metadata and rendered to GRANT statements on demand
(:meth:`Catalog.grant_statements`) for the in-band JDBC DDL channel
(``io.execute_jdbc_statements``) — same effect, transactional, and
auditable through catalog history.

Scale shape: pure driver-side metadata — no Spark job touches the
catalog; ``resolve`` is one commit-store read.
"""

from __future__ import annotations

import json
import os
import re

from .commitstore import get_commit_store
from .versioned import (
    CommitConflict,
    _advance_latest,
    _load_manifest,
    _manifest_name,
    current_version,
)

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.$-]*$")

_ENV_CATALOG = "DATALAKE_CATALOG_DIR"


def default_catalog_dir() -> str | None:
    """The ambient catalog location (env ``DATALAKE_CATALOG_DIR``), for
    ``catalog:`` name resolution without threading a path everywhere."""
    return os.environ.get(_ENV_CATALOG)


class TableNotFound(KeyError):
    def __init__(self, name: str, catalog_dir: str):
        super().__init__(f"table {name!r} not registered in {catalog_dir}")


class Catalog:
    """name -> versioned-table mapping, stored as its own CAS-committed
    versioned log under ``catalog_dir``."""

    def __init__(self, catalog_dir: str):
        self.catalog_dir = catalog_dir

    # -- state I/O ----------------------------------------------------
    def _state(self) -> tuple[int, dict]:
        v = current_version(self.catalog_dir)
        if v == 0:
            return 0, {}
        return v, _load_manifest(self.catalog_dir, v).get("tables", {})

    def _commit(self, base: int, tables: dict, op: dict) -> int:
        doc = {"version": base + 1, "tables": tables, "op": op}
        store = get_commit_store()
        store.ensure_log(self.catalog_dir)
        if not store.put_if_absent(
            self.catalog_dir, _manifest_name(base + 1), json.dumps(doc).encode()
        ):
            raise CommitConflict(self.catalog_dir, base + 1)
        _advance_latest(self.catalog_dir, base + 1)
        return base + 1

    def _mutate(self, fn, op_name: str, **op_args) -> int:
        """Optimistic-concurrency mutation: re-read state and retry on
        CommitConflict (the loser replays against the winner's state,
        so e.g. two concurrent creates of DIFFERENT names both land)."""
        for _ in range(16):
            base, tables = self._state()
            new_tables = fn(dict(tables))
            try:
                return self._commit(
                    base, new_tables, {"action": op_name, **op_args}
                )
            except CommitConflict:
                continue
        raise CommitConflict(self.catalog_dir, -1)

    # -- DDL ----------------------------------------------------------
    def create_table(
        self,
        name: str,
        table_dir: str,
        grants: list[str] | None = None,
        comment: str | None = None,
        if_not_exists: bool = False,
    ) -> int:
        """Register ``name`` -> ``table_dir``. The data directory need
        not exist yet (CREATE-then-write, like saveAsTable's first
        commit). Raises ValueError on duplicate names unless
        ``if_not_exists``."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid table name {name!r}")

        def _apply(tables: dict) -> dict:
            if name in tables:
                if if_not_exists:
                    return tables
                raise ValueError(
                    f"table {name!r} already registered -> "
                    f"{tables[name]['dir']}"
                )
            tables[name] = {
                "dir": os.path.abspath(table_dir),
                "grants": sorted(grants or []),
            }
            if comment:
                tables[name]["comment"] = comment
            return tables

        return self._mutate(_apply, "create", name=name)

    def create_view(
        self,
        name: str,
        sql: str,
        comment: str | None = None,
        if_not_exists: bool = False,
    ) -> int:
        """CREATE VIEW parity: register ``name`` as a SAVED SQL
        definition over catalog names (tables or earlier views). The
        text is stored, not the plan — each attach re-resolves it over
        the snapshot-pinned base views, so a view is always consistent
        with the snapshot its session attached. Views are resolved in
        CREATION ORDER at attach time, so a view may reference any view
        created before it (forward references fail at attach with
        Spark's own unresolved-relation error)."""
        if not _NAME_RE.match(name):
            raise ValueError(f"invalid view name {name!r}")

        def _apply(tables: dict) -> dict:
            if name in tables:
                if if_not_exists:
                    return tables
                raise ValueError(f"{name!r} already registered")
            entry = {"view_sql": sql, "grants": []}
            if comment:
                entry["comment"] = comment
            tables[name] = entry
            return tables

        return self._mutate(_apply, "create_view", name=name)

    def drop_table(self, name: str, if_exists: bool = False) -> int:
        """Unregister ``name`` — METADATA-ONLY, like an external-table
        DROP: data and its commit history stay on disk (vacuum/rmtree
        are deliberate separate acts)."""

        def _apply(tables: dict) -> dict:
            if name not in tables:
                if if_exists:
                    return tables
                raise TableNotFound(name, self.catalog_dir)
            del tables[name]
            return tables

        return self._mutate(_apply, "drop", name=name)

    def alter_grants(
        self,
        name: str,
        grant: list[str] | None = None,
        revoke: list[str] | None = None,
    ) -> int:
        """Add/remove grantee roles on a registered table."""

        def _apply(tables: dict) -> dict:
            if name not in tables:
                raise TableNotFound(name, self.catalog_dir)
            entry = dict(tables[name])
            roles = set(entry.get("grants", []))
            roles |= set(grant or [])
            roles -= set(revoke or [])
            entry["grants"] = sorted(roles)
            tables[name] = entry
            return tables

        return self._mutate(_apply, "alter_grants", name=name)

    # -- lookups ------------------------------------------------------
    def resolve(self, name: str) -> dict:
        _v, tables = self._state()
        if name not in tables:
            raise TableNotFound(name, self.catalog_dir)
        return tables[name]

    def table_dir(self, name: str) -> str:
        entry = self.resolve(name)
        if "view_sql" in entry:
            raise ValueError(
                f"{name!r} is a saved view (no table directory) — "
                "attach_views/sql resolve it; reads by dir cannot"
            )
        return entry["dir"]

    def tables(self) -> dict[str, dict]:
        """Current name -> entry mapping (sorted by name)."""
        _v, tables = self._state()
        return dict(sorted(tables.items()))

    def history(self) -> list[dict]:
        """Every catalog commit's op record, oldest first — the audit
        log of creates/drops/grant changes."""
        out = []
        for v in range(1, current_version(self.catalog_dir) + 1):
            doc = _load_manifest(self.catalog_dir, v)
            out.append({"version": v, **doc.get("op", {})})
        return out

    def grant_statements(self, name: str, sql_table: str | None = None) -> list[str]:
        """GRANT SELECT statements for the table's grantees, ready for
        ``io.execute_jdbc_statements`` — the in-band replacement for
        the reference's psycopg2 GRANT side-channel
        (zoom_proc.py:482-486)."""
        entry = self.resolve(name)
        tbl = sql_table or name
        return [f"GRANT SELECT ON {tbl} TO {role}" for role in entry["grants"]]

    # -- Spark-facing parity ------------------------------------------
    def save_as_table(
        self,
        spark,
        df,
        name: str,
        mode: str = "append",
        grants: list[str] | None = None,
        **write_kwargs,
    ) -> int:
        """``df.write.saveAsTable(name)`` parity: first save registers
        the name (data lands under ``<catalog_dir>/warehouse/<name>``
        unless already registered elsewhere), subsequent saves append/
        overwrite the registered table. Returns the data table's new
        version."""
        try:
            tdir = self.table_dir(name)
        except TableNotFound:
            tdir = os.path.join(self.catalog_dir, "warehouse", name)
            self.create_table(name, tdir, grants=grants, if_not_exists=True)
        from .versioned import write_versioned

        return write_versioned(spark, df, tdir, mode=mode, **write_kwargs)

    def table(self, spark, name: str, **read_kwargs):
        """``spark.table(name)`` parity over the versioned layer
        (version=/skip_filter=/contract= pass through)."""
        from .versioned import read_versioned

        return read_versioned(spark, self.table_dir(name), **read_kwargs)

    def attach_views(
        self,
        spark,
        names: list[str] | None = None,
        prefix: str = "",
        versions: dict[str, int] | None = None,
    ) -> list[str]:
        """Register catalog tables as Spark temp views so plain
        ``spark.sql`` works over the lake by NAME. Each view pins the
        manifest version current at attach time (or ``versions[name]``)
        — a multi-statement SQL session therefore gets snapshot
        isolation across every attached table; re-attach to advance.
        Saved VIEWS (:meth:`create_view`) re-resolve their stored SQL
        over those pinned tables, in creation order (a view may build
        on earlier views); because their SQL references bare catalog
        names, views require ``prefix=""``. Returns the names
        registered."""
        _, raw = self._state()
        chosen = names if names is not None else list(raw)
        view_names = [
            n for n in raw if n in set(chosen) and "view_sql" in raw[n]
        ]
        if view_names and prefix:
            raise ValueError(
                "saved views resolve bare catalog names — attach with "
                f"prefix='' (views selected: {view_names})"
            )
        out = []
        for n in chosen:
            if n in view_names:
                continue
            view = prefix + n
            kwargs = {}
            if versions and n in versions:
                kwargs["version"] = versions[n]
            else:
                # pin NOW: a view must not move underneath a query plan
                from .versioned import current_version

                kwargs["version"] = current_version(self.table_dir(n))
            self.table(spark, n, **kwargs).createOrReplaceTempView(view)
            out.append(view)
        for n in view_names:  # creation order (raw dict preserves it)
            spark.sql(raw[n]["view_sql"]).createOrReplaceTempView(n)
            out.append(n)
        return out

    def sql(self, spark, query: str, **attach_kwargs):
        """Attach every catalog table as a snapshot-pinned view and run
        ``query`` — the one-call ``SELECT ... FROM <name>`` surface
        (the reference's out-of-band DDL channel names tables the same
        way for its SQL consumers, monkey_proc.py:98-120)."""
        self.attach_views(spark, **attach_kwargs)
        return spark.sql(query)


def resolve_table_ref(ref: str, catalog_dir: str | None = None) -> str:
    """Accept either a plain directory path or ``catalog:<name>`` (the
    CLI/reader convention) and return the table directory. The catalog
    location comes from ``catalog_dir`` or ``$DATALAKE_CATALOG_DIR``."""
    if not ref.startswith("catalog:"):
        return ref
    cdir = catalog_dir or default_catalog_dir()
    if not cdir:
        raise ValueError(
            f"{ref!r} needs a catalog: pass --catalog or set "
            f"${_ENV_CATALOG}"
        )
    return Catalog(cdir).table_dir(ref[len("catalog:"):])
