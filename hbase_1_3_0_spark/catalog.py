"""Table / column-family metadata catalog.

The reference's schema system (SURVEY.md §1.2): ``HTableDescriptor``
(HTableDescriptor.java:67) holds the family set; ``HColumnDescriptor``
(HColumnDescriptor.java:58) holds the *semantic* per-family parameters that
parametrize the read view — maxVersions (default 1, HColumnDescriptor.java:149),
minVersions (default 0, :155), TTL (default FOREVER, :216), keepDeletedCells
(default FALSE, :171). Namespaces group tables (NamespaceDescriptor.java;
Admin.createNamespace, Admin.java:869).

Here the catalog is a plain in-memory/JSON registry; the values feed
:func:`hbase_1_3_0_spark.operators.read_view.read_view` directly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from pathlib import Path

from hbase_1_3_0_spark.cells import TTL_FOREVER


@dataclass(frozen=True)
class FamilyMeta:
    """HColumnDescriptor analog — read-view semantic parameters per family."""

    name: str = "d"
    max_versions: int = 1  # HColumnDescriptor.DEFAULT_VERSIONS (:149)
    min_versions: int = 0  # (:155)
    ttl_seconds: int = TTL_FOREVER  # (:216), seconds; FOREVER = Integer.MAX_VALUE
    keep_deleted_cells: str = "FALSE"  # FALSE | TRUE | TTL (:171)


@dataclass(frozen=True)
class TableMeta:
    """HTableDescriptor analog."""

    name: str
    namespace: str = "default"
    families: tuple[FamilyMeta, ...] = (FamilyMeta(),)
    # physical hints (writer-side; SURVEY.md §4 "disciplined physical layout")
    range_partitions: int | None = None
    #: pre-split boundaries (Admin.createTable(desc, splitKeys),
    #: Admin.java:259 / RegionSplitter): the writer pins one directory per
    #: region at these row-key boundaries instead of sampling the data
    split_points: tuple[bytes, ...] | None = None
    #: The log is known single-version and tombstone-free (fresh bulk load /
    #: post-compaction). Scans then skip the version-limit aggregation and
    #: tombstone joins — the analog of HBase skipping ScanQueryMatcher delete
    #: tracking when a store has no delete markers. Any mutation clears it.
    clean_log: bool = False
    #: Declared visibility-policy vocabulary (the VisibilityController's
    #: label-expression strings in use on this table). Full-grammar
    #: expressions (parens / quoted labels, ExpressionParser.java:41) are
    #: evaluated once per policy on the driver and enforced per cell as a
    #: broadcast-literal membership test; a parenthesized expression not
    #: declared here is denied (fail closed).
    visibility_policies: tuple[str, ...] | None = None

    def family(self, name: str) -> FamilyMeta:
        for f in self.families:
            if f.name == name:
                return f
        raise KeyError(f"no such column family: {name!r} in table {self.name!r}")

    @property
    def qualified_name(self) -> str:
        return f"{self.namespace}:{self.name}"


class Catalog:
    """In-memory namespace/table registry with optional JSON persistence."""

    def __init__(self, path: str | Path | None = None) -> None:
        self._tables: dict[str, TableMeta] = {}
        self._namespaces: set[str] = {"default", "hbase"}
        self._path = Path(path) if path else None
        if self._path and self._path.exists():
            self._load()

    # -- namespaces (Admin.createNamespace / deleteNamespace) --------------
    def create_namespace(self, name: str) -> None:
        self._namespaces.add(name)
        self._persist()

    def drop_namespace(self, name: str) -> None:
        if any(t.namespace == name for t in self._tables.values()):
            raise ValueError(f"namespace {name!r} is not empty")
        self._namespaces.discard(name)
        self._persist()

    def namespaces(self) -> list[str]:
        return sorted(self._namespaces)

    # -- tables (Admin.createTable / disable+deleteTable / describe) -------
    def create_table(self, meta: TableMeta) -> TableMeta:
        if meta.namespace not in self._namespaces:
            raise KeyError(f"no such namespace: {meta.namespace!r}")
        if meta.qualified_name in self._tables:
            raise ValueError(f"table exists: {meta.qualified_name}")
        self._tables[meta.qualified_name] = meta
        self._persist()
        return meta

    def alter_table(self, meta: TableMeta) -> TableMeta:
        if meta.qualified_name not in self._tables:
            raise KeyError(f"no such table: {meta.qualified_name}")
        self._tables[meta.qualified_name] = meta
        self._persist()
        return meta

    def drop_table(self, name: str, namespace: str = "default") -> None:
        del self._tables[f"{namespace}:{name}"]
        self._persist()

    def describe(self, name: str, namespace: str = "default") -> TableMeta:
        return self._tables[f"{namespace}:{name}"]

    def tables(self, namespace: str | None = None) -> list[str]:
        return sorted(
            q for q, t in self._tables.items() if namespace in (None, t.namespace)
        )

    # -- persistence -------------------------------------------------------
    def _persist(self) -> None:
        if not self._path:
            return
        self._path.parent.mkdir(parents=True, exist_ok=True)
        def encode(t: TableMeta) -> dict:
            d = asdict(t)
            if d.get("split_points"):
                d["split_points"] = [b.hex() for b in d["split_points"]]
            return d

        payload = {
            "namespaces": sorted(self._namespaces),
            "tables": [encode(t) for t in self._tables.values()],
        }
        self._path.write_text(json.dumps(payload, indent=2))

    def _load(self) -> None:
        payload = json.loads(self._path.read_text())
        self._namespaces = set(payload["namespaces"])
        for t in payload["tables"]:
            fams = tuple(FamilyMeta(**f) for f in t.pop("families"))
            if t.get("split_points"):
                t["split_points"] = tuple(
                    bytes.fromhex(s) for s in t["split_points"]
                )
            if t.get("visibility_policies"):
                t["visibility_policies"] = tuple(t["visibility_policies"])
            self._tables[f"{t['namespace']}:{t['name']}"] = TableMeta(
                families=fams, **t
            )
