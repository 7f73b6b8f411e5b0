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
    #: REPLICATION_SCOPE (:221): LOCAL(0) by default — a family never
    #: ships to replication peers unless marked GLOBAL(1)
    replication_scope: int = 0


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

    @property
    def num_regions(self) -> int:
        """Region count as the NamespaceAuditor counts it: pre-split
        boundaries + 1, else the physical range-partition hint, else 1."""
        if self.split_points:
            return len(self.split_points) + 1
        return self.range_partitions or 1


class QuotaExceededError(ValueError):
    """QuotaExceededException analog (NamespaceStateManager checks)."""


class Catalog:
    """In-memory namespace/table registry with optional JSON persistence."""

    def __init__(self, path: str | Path | None = None) -> None:
        self._tables: dict[str, TableMeta] = {}
        #: namespace -> quota props (NamespaceDescriptor configuration:
        #: hbase.namespace.quota.maxtables / maxregions)
        self._namespaces: dict[str, dict] = {"default": {}, "hbase": {}}
        #: peer_id -> tableCFs map (None = every table)
        self._peers: dict[str, dict | None] = {}
        self._path = Path(path) if path else None
        if self._path and self._path.exists():
            self._load()

    # -- namespaces (Admin.createNamespace / deleteNamespace) --------------
    def create_namespace(
        self,
        name: str,
        *,
        max_tables: int | None = None,
        max_regions: int | None = None,
    ) -> None:
        """createNamespace with optional NamespaceAuditor quotas
        (NamespaceDescriptor KEY_MAX_TABLES/KEY_MAX_REGIONS;
        TableNamespaceManager.java:304-308 rejects values <= 0)."""
        props = {}
        for key, v in (("maxtables", max_tables), ("maxregions", max_regions)):
            if v is None:
                continue
            if int(v) <= 0:
                raise ValueError(
                    f"hbase.namespace.quota.{key} must be positive: {v}"
                )
            props[key] = int(v)
        self._namespaces[name] = props
        self._persist()

    def drop_namespace(self, name: str) -> None:
        if any(t.namespace == name for t in self._tables.values()):
            raise ValueError(f"namespace {name!r} is not empty")
        self._namespaces.pop(name, None)
        self._persist()

    def namespaces(self) -> list[str]:
        return sorted(self._namespaces)

    # -- replication peers (ReplicationAdmin.addPeer / removePeer) ----------
    def add_replication_peer(
        self,
        peer_id: str,
        table_cfs: str | dict[str, list[str] | None] | None = None,
    ) -> None:
        """addPeer (ReplicationAdmin.java:183): registers a peer with an
        optional tableCFs subscription — either the reference's config
        string ("table1:cf1,cf2;table2") or the parsed map; None/empty
        means every table."""
        if peer_id in self._peers:
            raise ValueError(f"replication peer exists: {peer_id}")
        if isinstance(table_cfs, str):
            from hbase_1_3_0_spark.streaming.wal import parse_table_cfs

            table_cfs = parse_table_cfs(table_cfs)
        self._peers[peer_id] = table_cfs
        self._persist()

    def remove_replication_peer(self, peer_id: str) -> None:
        del self._peers[peer_id]
        self._persist()

    def replication_peer(self, peer_id: str):
        """The peer's tableCFs map (None = all tables)."""
        return self._peers[peer_id]

    def replication_peers(self) -> list[str]:
        return sorted(self._peers)

    # -- NamespaceAuditor (namespace/NamespaceAuditor.java:58,:76) ----------
    def _ns_state(self, namespace: str) -> tuple[int, int]:
        """(table count, region count) of the namespace — the
        NamespaceTableAndRegionInfo cache, recomputed from the registry."""
        tables = [t for t in self._tables.values() if t.namespace == namespace]
        return len(tables), sum(t.num_regions for t in tables)

    def _check_create_quota(self, meta: TableMeta) -> None:
        """checkAndUpdateNamespaceTableCount (NamespaceStateManager:148):
        table count at the limit, or region budget overflow, fails the
        create."""
        props = self._namespaces.get(meta.namespace) or {}
        if not props:
            return
        n_tables, n_regions = self._ns_state(meta.namespace)
        if "maxtables" in props and n_tables >= props["maxtables"]:
            raise QuotaExceededError(
                f"The table {meta.qualified_name} cannot be created as it "
                f"would exceed maximum number of tables allowed in the "
                f"namespace. The total number of tables permitted is "
                f"{props['maxtables']}"
            )
        if (
            "maxregions" in props
            and n_regions + meta.num_regions > props["maxregions"]
        ):
            raise QuotaExceededError(
                f"The table {meta.qualified_name} is not allowed to have "
                f"{meta.num_regions} regions. The total number of regions "
                f"permitted is only {props['maxregions']}, while current "
                f"region count is {n_regions}"
            )

    def _check_region_quota(self, meta: TableMeta) -> None:
        """checkAndUpdateNamespaceRegionCount (NamespaceStateManager:120):
        the namespace's region count with this table's NEW size swapped
        in must fit the budget (splits, merges, restores)."""
        props = self._namespaces.get(meta.namespace) or {}
        if "maxregions" not in props:
            return
        _, n_regions = self._ns_state(meta.namespace)
        old = self._tables[meta.qualified_name].num_regions
        if n_regions - old + meta.num_regions > props["maxregions"]:
            raise QuotaExceededError(
                f"The table {meta.qualified_name} region count cannot be "
                f"updated as it would exceed maximum number of regions "
                f"allowed in the namespace. The total number of regions "
                f"permitted is {props['maxregions']}"
            )

    # -- tables (Admin.createTable / disable+deleteTable / describe) -------
    def create_table(self, meta: TableMeta) -> TableMeta:
        if meta.namespace not in self._namespaces:
            raise KeyError(f"no such namespace: {meta.namespace!r}")
        if meta.qualified_name in self._tables:
            raise ValueError(f"table exists: {meta.qualified_name}")
        self._check_create_quota(meta)
        self._tables[meta.qualified_name] = meta
        self._persist()
        return meta

    def alter_table(self, meta: TableMeta) -> TableMeta:
        if meta.qualified_name not in self._tables:
            raise KeyError(f"no such table: {meta.qualified_name}")
        self._check_region_quota(meta)
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
            "namespaces": {
                n: self._namespaces[n] for n in sorted(self._namespaces)
            },
            "tables": [encode(t) for t in self._tables.values()],
            "peers": self._peers,
        }
        self._path.write_text(json.dumps(payload, indent=2))

    def _load(self) -> None:
        payload = json.loads(self._path.read_text())
        ns = payload["namespaces"]
        # pre-r8 catalogs persisted a bare name list (no quota props)
        self._namespaces = (
            dict(ns) if isinstance(ns, dict) else {n: {} for n in ns}
        )
        self._peers = payload.get("peers", {})
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
