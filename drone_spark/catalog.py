"""Versioned table catalog — the engine's Iceberg stand-in.

The north rule requires per-superstep state snapshots, per-partition
lineage and convergence metrics persisted to *Iceberg*, with resume from
the last checkpoint. This sandbox ships no Iceberg runtime jar and
installs are forbidden, so the catalog below provides the subset of
Iceberg semantics the engine needs — atomic versioned snapshots, append
logs, time-travel reads — as versioned parquet directories with an
atomically-renamed JSON manifest. On a real cluster, ``Catalog`` is the
only file that changes: each method maps 1:1 onto
``df.writeTo("db.t").createOrReplace() / .append()`` and
``spark.read.option("snapshot-id", ...).table("db.t")``.

Layout::

    <root>/<table>/_MANIFEST.json        # ordered snapshot log
    <root>/<table>/v=000007/*.parquet    # one directory per commit

Commit protocol (crash-safe, same idea as Iceberg's metadata swap):
write data to a temp dir, fsync-rename it to ``v=N``, then rename a new
manifest over the old one. A reader always sees either the old or the
new manifest, never a torn state; uncommitted ``v=N`` dirs without a
manifest entry are invisible garbage.

The reference engine has no storage layer at all — workers read
whitespace text from NFS and append TSV result files
(/root/reference/src/worker/PRWorker.go:341-364, :249-267); this module
replaces that and adds the checkpoint/lineage capability it lacked.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


@dataclass
class _Commit:
    version: int
    mode: str  # "snapshot" (full replacement) | "append"
    meta: dict[str, Any] = field(default_factory=dict)


class Catalog:
    """Versioned parquet tables under a root directory."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers -------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), MANIFEST)

    def _load_manifest(self, name: str) -> list[_Commit]:
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            raw = json.load(fh)
        return [_Commit(**entry) for entry in raw]

    def _store_manifest(self, name: str, commits: list[_Commit]) -> None:
        path = self._manifest_path(name)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump([commit.__dict__ for commit in commits], fh, indent=1)
        os.replace(tmp, path)  # atomic on POSIX

    # -- public API --------------------------------------------------------
    def exists(self, name: str) -> bool:
        return bool(self._load_manifest(name))

    def versions(self, name: str) -> list[int]:
        return [c.version for c in self._load_manifest(name)]

    def latest_version(self, name: str) -> int | None:
        versions = self.versions(name)
        return versions[-1] if versions else None

    def commit_meta(self, name: str, version: int) -> dict[str, Any]:
        for commit in self._load_manifest(name):
            if commit.version == version:
                return commit.meta
        raise KeyError(f"{name}@v{version}")

    def _commit(self, df: DataFrame, name: str, mode: str, meta: dict | None) -> int:
        commits = self._load_manifest(name)
        version = commits[-1].version + 1 if commits else 1
        table_dir = self._table_dir(name)
        os.makedirs(table_dir, exist_ok=True)
        tmp = os.path.join(table_dir, f".tmp-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        final = os.path.join(table_dir, f"v={version:06d}")
        os.replace(tmp, final)
        commits.append(_Commit(version=version, mode=mode, meta=meta or {}))
        self._store_manifest(name, commits)
        return version

    def write_snapshot(self, df: DataFrame, name: str, meta: dict | None = None) -> int:
        """Full-replacement commit (Iceberg ``createOrReplace``)."""
        return self._commit(df, name, "snapshot", meta)

    def append(self, df: DataFrame, name: str, meta: dict | None = None) -> int:
        """Append commit (Iceberg ``append``)."""
        return self._commit(df, name, "append", meta)

    def read(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        """Read table state as of ``version`` (default: latest).

        Resolves to the last full snapshot at-or-before ``version`` plus
        every append after it — i.e. Iceberg snapshot semantics.
        """
        commits = self._load_manifest(name)
        if version is not None:
            commits = [c for c in commits if c.version <= version]
        if not commits:
            raise FileNotFoundError(f"table {name!r} (version={version}) not in catalog")
        start = 0
        for i, commit in enumerate(commits):
            if commit.mode == "snapshot":
                start = i
        paths = [
            os.path.join(self._table_dir(name), f"v={c.version:06d}")
            for c in commits[start:]
        ]
        return spark.read.parquet(*paths)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)

    # -- maintenance (Iceberg expire_snapshots / remove_orphan_files) --
    def expire_snapshots(self, name: str, keep_last: int = 2) -> list[int]:
        """Expire history older than the last ``keep_last`` commits —
        the Iceberg ``expire_snapshots`` maintenance action. A long-run
        superstep engine commits per superstep, so without expiry the
        checkpoint table grows without bound; expiry keeps resume
        working (the latest chain survives intact) while capping
        storage.

        Every retained version must stay RESOLVABLE: :meth:`read` of
        version v needs the last full snapshot at-or-before v plus the
        appends after it, so the cut point is pulled back from the
        Nth-newest commit to the snapshot that anchors it. Time travel
        to an expired version raises (Iceberg parity).

        Returns the expired version numbers (may be empty)."""
        commits = self._load_manifest(name)
        if len(commits) <= keep_last:
            return []
        window = commits[-keep_last:] if keep_last > 0 else commits[-1:]
        anchor = 0
        for i, c in enumerate(commits):
            if c.mode == "snapshot" and c.version <= window[0].version:
                anchor = i
        expired = commits[:anchor]
        if not expired:
            return []
        kept = commits[anchor:]
        # manifest first: a reader that races sees the new manifest and
        # never resolves into a directory we are about to delete
        self._store_manifest(name, kept)
        out = []
        for c in expired:
            shutil.rmtree(
                os.path.join(self._table_dir(name), f"v={c.version:06d}"),
                ignore_errors=True,
            )
            out.append(c.version)
        return out

    def vacuum(self, name: str) -> list[str]:
        """Delete orphan directories — ``v=`` dirs absent from the
        manifest (expired or never-committed) and ``.tmp-*`` debris
        from crashed commits (Iceberg ``remove_orphan_files``). The
        commit protocol makes these invisible to readers already;
        vacuum reclaims the bytes. Returns removed directory names."""
        table_dir = self._table_dir(name)
        if not os.path.isdir(table_dir):
            return []
        live = {
            f"v={c.version:06d}" for c in self._load_manifest(name)
        }
        removed = []
        for entry in sorted(os.listdir(table_dir)):
            full = os.path.join(table_dir, entry)
            if not os.path.isdir(full):
                continue
            if entry.startswith(".tmp-") or (
                entry.startswith("v=") and entry not in live
            ):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(entry)
        return removed


# -- Iceberg verb parity: MERGE (upsert) and stats-based scan pruning ----
def _numeric_minmax(df: DataFrame) -> dict[str, list]:
    """Per-numeric-column [min, max] — the manifest statistics Iceberg
    keeps per data file; one Spark job, computed at write time."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    num_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType,
                                   T.DoubleType, T.FloatType, T.DecimalType))
    ]
    if not num_cols:
        return {}
    aggs = []
    for c in num_cols:
        aggs.append(F.min(c).alias(f"min__{c}"))
        aggs.append(F.max(c).alias(f"max__{c}"))
    row = df.agg(*aggs).collect()[0]

    def _lo(v):
        """Lossy conversions must round the min DOWN so pruning stays
        conservative: a Decimal min that float() rounds UP could make
        scan_plan skip a commit whose boundary rows match (ADVICE r5)."""
        import decimal
        import math

        if isinstance(v, int):
            return v
        f = float(v)
        if isinstance(v, decimal.Decimal) and decimal.Decimal(f) > v:
            f = math.nextafter(f, -math.inf)
        return f

    def _hi(v):
        import decimal
        import math

        if isinstance(v, int):
            return v
        f = float(v)
        if isinstance(v, decimal.Decimal) and decimal.Decimal(f) < v:
            f = math.nextafter(f, math.inf)
        return f

    out = {}
    for c in num_cols:
        lo, hi = row[f"min__{c}"], row[f"max__{c}"]
        if lo is not None:
            out[c] = [_lo(lo), _hi(hi)]
    return out


class StatsCatalog(Catalog):
    """Catalog with the two remaining Iceberg verbs:

    - :meth:`merge_upsert` — MERGE INTO semantics: rows whose key
      matches are replaced, the rest inserted, committed as one
      atomic snapshot.
    - column min/max stats recorded in every commit's manifest entry
      (``meta["stats"]``), and :meth:`scan_plan` — manifest-level
      data skipping: which committed directories can contain rows
      matching a column range predicate. This is Iceberg's
      scan-planning path (prune by file stats before touching data);
      the superstep engine's checkpoint reader uses it to locate the
      snapshot holding a vertex-id range without opening parquet
      footers.

    Kept as a subclass so the minimal catalog (used by the engine hot
    path, where the extra stats job per commit is unwanted overhead)
    stays stat-free; the write/read formats are identical and the two
    classes interoperate on the same root."""

    def _commit(self, df: DataFrame, name: str, mode: str, meta: dict | None) -> int:
        meta = dict(meta or {})
        meta["stats"] = _numeric_minmax(df)
        return super()._commit(df, name, mode, meta)

    def merge_upsert(
        self, df: DataFrame, name: str, key: str | list[str],
        meta: dict | None = None,
    ) -> int:
        """MERGE INTO: replace current rows whose ``key`` appears in
        ``df``, insert the rest of ``df``, commit as one snapshot.
        Exactly-once by construction: the result is a pure function of
        (latest snapshot, df), and the commit is the catalog's atomic
        rename."""
        keys = [key] if isinstance(key, str) else list(key)
        spark = df.sparkSession
        if self.exists(name) and self.versions(name):
            current = self.read(spark, name)
            kept = current.join(df.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(df)
        else:
            merged = df
        return self.write_snapshot(merged, name, meta)

    def scan_plan(
        self, name: str, column: str, lo, hi
    ) -> list[int]:
        """Versions (of the current read-resolution chain) whose
        recorded [min, max] for ``column`` overlaps [lo, hi] — the
        directories a range scan must open; everything else is
        skipped on stats alone. Commits with no stats for the column
        are conservatively kept."""
        commits = self._load_manifest(name)
        start = 0
        for i, c in enumerate(commits):
            if c.mode == "snapshot":
                start = i
        live = commits[start:]
        out = []
        for c in live:
            rng = (c.meta or {}).get("stats", {}).get(column)
            if rng is None or (rng[0] <= hi and rng[1] >= lo):
                out.append(c.version)
        return out
