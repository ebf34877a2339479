"""DML: copy-on-write and deletion-vector DELETE/UPDATE/MERGE.

Mechanical split of the original single-module ``deltalog.py`` (r13):
one mixin per concern, assembled into ``MiniDeltaTable`` by the
package ``__init__``. Zero behavior change — method bodies are
verbatim; see the package docstring for the protocol overview and
reference citations."""

from __future__ import annotations

import copy  # noqa: F401
import json  # noqa: F401
import os  # noqa: F401
import shutil  # noqa: F401
import time  # noqa: F401
import uuid  # noqa: F401
from typing import Any  # noqa: F401
from urllib.parse import unquote  # noqa: F401

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from . import _base
from ._base import (  # noqa: F401
    _LAST_CHECKPOINT,
    _LOG_DIR,
    _HIVE_NULL,
    _SIDECAR_DIR,
    CommitConflictError,
    ConcurrentAppendError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    ConcurrentTransactionError,
    ConcurrentWriteError,
    ConstraintViolationError,
    MetadataChangedError,
    ProtocolChangedError,
    SchemaMismatchError,
    Snapshot,
    _all_match,
    _atomic_publish,
    _checkpoint_arrow_schema,
    _column_nonnull_count,
    _parse_partition_values,
    _stats_overlap,
    _stats_value,
)


class _DmlMixin:
    def _touched_rewrite(
        self,
        condition: Column,
        rewrite,
        operation: str,
        parameters: dict[str, Any],
        isolation: str = "write_serializable",
    ) -> int | None:
        """Copy-on-write DML core shared by DELETE and UPDATE: one
        discovery scan finds the FILES containing rows matching
        ``condition`` (the real engine's touched-file scan — sound for
        arbitrary predicates, and it prunes automatically: untouched
        files are never rewritten), ``rewrite(sub)`` produces those
        files' replacement relation, and the commit pairs their
        removes with the new adds. Returns the new version, or None if
        nothing matched (a no-op, like the real commands)."""
        snap = self.snapshot()
        self._assert_not_append_only(snap, operation)
        if not snap.files:
            return None
        if any(os.path.isabs(r) for r in snap.files):
            # touched-file discovery keys on table-relative paths; a
            # clone still referencing source files has none — and the
            # rewrite would copy the source's data under the clone's
            # root anyway, which read() + write() does explicitly
            raise NotImplementedError(
                "copy-on-write DML on a shallow clone that still "
                "references its source's files is not supported; "
                "rewrite the clone first (optimize() or read()+write())"
            )
        scan = self._read_files_dv_aware(snap, snap.files, with_rel=True)
        # predicates are over LOGICAL names; the raw scan is physical
        scan = scan.select(
            "_rel",
            *self._logical_casts(snap.schema, set(scan.columns)),
        )
        touched_rels = sorted(
            r["_rel"]
            for r in scan.filter(condition).select("_rel").distinct().collect()
        )
        if not touched_rels:
            return None
        tracking = snap.configuration.get(self._RT_KEY) == "true"
        mat = snap.configuration.get(self._RT_MAT_KEY)
        if tracking:
            # row-tracked copy-on-write: surviving rows carry their
            # stable id through the rewrite (DELETE filters, UPDATE
            # reassigns values — neither touches identity) into the
            # replacement files' hidden materialized column
            sub = self._scan_with_row_ids(snap, touched_rels)
        else:
            sub = self._read_files_dv_aware(snap, touched_rels)
            sub = sub.select(
                *self._logical_casts(snap.schema, set(sub.columns))
            )
        replacement = rewrite(sub)
        # DML commits hold the same invariant as write(): no committed
        # version contains a row violating a CHECK constraint or a
        # generated column's expression. An UPDATE that breaks either
        # fails HERE, before any file is staged. (Real Delta
        # recomputes generated columns on UPDATE; this subset enforces
        # instead — the caller assigns consistent values or the commit
        # refuses loudly.)
        self._enforce_constraints(replacement, snap.configuration)
        self._enforce_generated(replacement, snap.schema)
        if tracking:
            replacement = replacement.withColumnRenamed("_row_id", mat)
        adds = self._stage_for_schema(
            replacement,
            snap.schema,
            snap.partition_columns,
            extra_cols=(mat,) if tracking else (),
        )
        if tracking:
            for add in adds:
                add["tags"] = {
                    **(add.get("tags") or {}),
                    self._RT_MAT_TAG: "true",
                }
        now_ms = int(time.time() * 1000)
        actions: list[dict[str, Any]] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": operation,
                    "operationParameters": {
                        **parameters,
                        "rewrittenFiles": len(touched_rels),
                        "prunedFiles": len(snap.files) - len(touched_rels),
                    },
                }
            }
        ]
        for rel in touched_rels:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
        actions.extend({"add": add} for add in adds)
        return self._commit_resolving(
            snap, actions, operation, isolation=isolation
        )

    def delete(
        self,
        condition: Column,
        use_dv: bool = False,
        isolation: str = "write_serializable",
    ) -> int | None:
        """DELETE FROM ... WHERE: remove rows where ``condition`` is
        TRUE (NULL keeps the row — SQL semantics), rewriting ONLY the
        files that contain matches. At 100 TB a targeted delete (GDPR
        erasure, a bad-batch rollback) touches a sliver of the table;
        the touched-file discovery keeps the rewrite proportional to
        that sliver, never the table. Returns the new version or None
        when nothing matched.

        ``use_dv=True`` switches to DELETION VECTORS (the modern Delta
        writer's default): instead of rewriting the touched files, the
        matching rows' file positions are written to a parquet sidecar
        and each touched add is re-committed carrying a
        ``deletionVector`` descriptor — readers anti-join the sidecar
        against ``_metadata.row_index``, so a delete's cost is the
        POSITION LIST, not even the touched files' bytes. The sidecar
        is hive-partitioned per touched file (the real protocol's
        per-file-bitmap shape), so write cost scales with touched
        files, not one funnel task. OPTIMIZE materializes DVs away
        (reading victims through the filter); ``changes()`` emits a DV
        commit as row-level delete events; ``clone()`` carries DV
        references absolutely (unpartitioned sources)."""
        cond = F.coalesce(condition, F.lit(False))
        if use_dv:
            return self._delete_with_dv(cond, isolation)
        return self._touched_rewrite(
            cond,
            lambda sub: sub.filter(~cond),
            "DELETE",
            {},
            isolation,
        )

    def _dv_positions(self, snap: Snapshot) -> DataFrame | None:
        """(rel, pos) union of every ACTIVE deletion vector, or None
        when the snapshot carries none."""
        sidecars = sorted(
            {
                add["deletionVector"]["storagePath"]
                for add in snap.files.values()
                if add.get("deletionVector")
            }
        )
        if not sidecars:
            return None
        out = None
        for sidecar in sidecars:
            dvp = self.spark.read.parquet(os.path.join(self.path, sidecar))
            out = dvp if out is None else out.unionByName(dvp)
        return out

    def _dv_scan(self, snap: Snapshot, rels=None) -> DataFrame:
        """Discovery scan for DV DML: (``_rel``, ``_pos``, logical
        columns) over the given files (default: all active)."""
        rels = sorted(snap.files if rels is None else rels)
        sub = (
            self._reader(
                {r: snap.files[r] for r in rels},
                self._needs_schema_merge(snap),
                self._tw_schema(
                    snap.schema, self._needs_schema_merge(snap)
                ),
            )
            .parquet(*(os.path.join(self.path, r) for r in rels))
            .withColumn("_rel", self._rel_from("_metadata.file_path"))
            .withColumn("_pos", F.col("_metadata.row_index"))
        )
        return sub.select(
            "_rel",
            "_pos",
            *self._logical_casts(snap.schema, set(sub.columns)),
        )

    def _dv_alive(
        self, matched: DataFrame, existing: DataFrame | None
    ) -> DataFrame:
        """Drop rows already dead under an active deletion vector —
        a DV DML must never re-delete (double-counted cardinality) or
        resurrect-then-replace them."""
        if existing is None:
            return matched
        return matched.join(
            existing.select(
                F.col("rel").alias("_rel"), F.col("pos").alias("_pos")
            ),
            ["_rel", "_pos"],
            "left_anti",
        )

    def _dv_commit(
        self,
        snap: Snapshot,
        matched: DataFrame,
        existing: DataFrame | None,
        operation: str,
        parameters: dict[str, Any],
        new_rows: DataFrame | None = None,
        isolation: str = "write_serializable",
    ) -> int | None:
        """Deletion-vector DML commit core shared by DELETE, UPDATE
        and MERGE: mark ``matched``'s (_rel, _pos) positions dead via
        a fresh hive-partitioned sidecar (each touched file's OLD DV
        positions folded in, so every add references exactly one
        sidecar and superseded sidecars become vacuumable) and — for
        UPDATE/MERGE — append ``new_rows`` as plain adds in the SAME
        commit. Zero touched-file rewrites: the write cost is the
        position lists plus the replacement rows, never the touched
        files' bytes. The change feed reconstructs such a commit as
        row-level deletes of exactly the position delta plus inserts
        of the new files (documented delete+insert in place of
        update_pre/postimage)."""
        # the matched relation feeds up to THREE jobs (touched-file
        # counts, the sidecar write, and — via new_rows — the
        # replacement staging); persist it so the discovery scan runs
        # ONCE, not three times. Storage is bounded by the matched
        # rows — the data volume the DML inherently moves — and
        # spills to disk.
        from pyspark import StorageLevel

        matched = matched.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._dv_commit_inner(
                snap,
                matched,
                existing,
                operation,
                parameters,
                new_rows,
                isolation,
            )
        finally:
            matched.unpersist()

    def _dv_commit_inner(
        self,
        snap: Snapshot,
        matched: DataFrame,
        existing: DataFrame | None,
        operation: str,
        parameters: dict[str, Any],
        new_rows: DataFrame | None = None,
        isolation: str = "write_serializable",
    ) -> int | None:
        positions = matched.select(
            F.col("_rel").alias("rel"), F.col("_pos").alias("pos")
        )
        touched = {
            r["rel"]: r["n"]
            for r in positions.groupBy("rel")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not touched and new_rows is None:
            return None
        now_ms = int(time.time() * 1000)
        actions: list[dict[str, Any]] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": operation,
                    "operationParameters": {
                        **parameters,
                        "mode": "deletion-vectors",
                        "dvFiles": len(touched),
                        "rewrittenFiles": 0,
                    },
                }
            }
        ]
        if touched:
            # DVs gate on reader 3 / writer 7 with the
            # "deletionVectors" table feature in the real protocol:
            # older readers must refuse the table rather than
            # resurrect deleted rows by scanning files directly.
            # _tf_upgrade emits the upgrade ONLY when the table is
            # not already there (versions AND feature names) — a
            # restated no-op protocol action would make every
            # concurrent loser raise ProtocolChangedError where the
            # conflict matrix promises a rebase (DML/OPTIMIZE over
            # untouched files), and the real writer only logs
            # protocol on an actual upgrade too.
            up = self._tf_upgrade(
                snap, {"deletionVectors"}, {"deletionVectors"}
            )
            if up is not None:
                actions.append({"protocol": up})
            pos_all = positions
            if existing is not None:
                pos_all = pos_all.unionByName(
                    existing.filter(F.col("rel").isin(*touched))
                )
            dv_rel = f"_dv/{uuid.uuid4().hex}"
            # per-file position lists, the real protocol's
            # per-file-bitmap shape: hive-partitioned by the data file
            # each DV belongs to, so a DML touching F files writes F
            # position lists in parallel — no single task ever
            # materializes the whole position set (the r8
            # repartition(1) funnel)
            pos_all.repartition("rel").write.partitionBy("rel").mode(
                "overwrite"
            ).parquet(os.path.join(self.path, dv_rel))
            cardinality = {
                r["rel"]: r["n"]
                for r in self.spark.read.parquet(
                    os.path.join(self.path, dv_rel)
                )
                .groupBy("rel")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            for rel in sorted(touched):
                actions.append(
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                        }
                    }
                )
                add = {
                    k: v
                    for k, v in snap.files[rel].items()
                    if k != "deletionVector"
                }
                add["dataChange"] = True
                add["deletionVector"] = {
                    "storagePath": dv_rel,
                    "cardinality": int(cardinality[rel]),
                }
                actions.append({"add": add})
        if new_rows is not None:
            # same commit invariant as write()/_touched_rewrite: no
            # committed version may violate a CHECK constraint or a
            # generated column's expression
            self._enforce_constraints(new_rows, snap.configuration)
            self._enforce_generated(new_rows, snap.schema)
            adds = self._stage_for_schema(
                new_rows, snap.schema, snap.partition_columns
            )
            # an empty replacement relation can still stage one
            # zero-row file — drop it rather than commit a pointless
            # add (and let a no-match UPDATE resolve to a no-op)
            adds = [
                a
                for a in adds
                if not (
                    a.get("stats")
                    and json.loads(a["stats"]).get("numRecords") == 0
                )
            ]
            if not adds and not touched:
                return None
            actions[0]["commitInfo"]["operationParameters"]["newFiles"] = (
                len(adds)
            )
            actions.extend({"add": add} for add in adds)
        return self._commit_resolving(
            snap, actions, operation, isolation=isolation
        )

    def _delete_with_dv(
        self, cond: Column, isolation: str = "write_serializable"
    ) -> int | None:
        snap = self.snapshot()
        self._assert_not_append_only(snap, "DELETE")
        if not snap.files:
            return None
        if any(os.path.isabs(r) for r in snap.files):
            raise NotImplementedError(
                "deletion vectors on tables with absolute file "
                "references (shallow clones) are not supported"
            )
        existing = self._dv_positions(snap)
        matched = self._dv_alive(
            self._dv_scan(snap).filter(cond), existing
        )
        return self._dv_commit(
            snap, matched, existing, "DELETE", {}, isolation=isolation
        )

    def update(
        self,
        condition: Column,
        assignments: dict[str, Column],
        use_dv: bool = False,
        isolation: str = "write_serializable",
    ) -> int | None:
        """UPDATE ... SET ... WHERE: apply ``assignments`` to rows
        where ``condition`` is TRUE, same touched-file copy-on-write
        shape as :meth:`delete`. Assigned expressions are cast to the
        column's logged type (schema enforcement: an UPDATE can change
        values, never the table's shape). Returns the new version or
        None when nothing matched.

        ``use_dv=True`` is the modern Delta writer's DV-based UPDATE:
        instead of rewriting every touched file, the matched rows'
        positions go dead in a deletion-vector sidecar and the
        REWRITTEN rows alone are appended as new files in the same
        commit — write cost scales with the MATCHED ROWS, never the
        touched files' bytes (a 1-row update of a 1 GB file writes
        one position and one row). The change feed surfaces it as
        delete(old row) + insert(new row) — the documented stand-in
        for update_pre/postimage. CHECK constraints and generated
        columns are enforced on the rewritten rows before anything
        commits."""
        snap = self.snapshot()
        self._assert_not_append_only(snap, "UPDATE")
        snap_schema = {f.name: f.dataType for f in snap.schema}
        unknown = sorted(set(assignments) - set(snap_schema))
        if unknown:
            raise SchemaMismatchError(
                f"UPDATE assigns columns not in the table: {unknown}"
            )
        for iname, fmeta in self._identity_fields(snap.schema).items():
            if iname in assignments:
                # rewriting identity VALUES would bypass the watermark
                # (GENERATED ALWAYS forbids it outright; BY DEFAULT
                # would need a watermark restate this path lacks)
                raise ValueError(
                    f"UPDATE may not assign identity column {iname!r}"
                )
        cond = F.coalesce(condition, F.lit(False))
        params = {"columns": json.dumps(sorted(assignments))}
        if use_dv:
            if not snap.files:
                return None
            if any(os.path.isabs(r) for r in snap.files):
                raise NotImplementedError(
                    "deletion vectors on tables with absolute file "
                    "references (shallow clones) are not supported"
                )
            existing = self._dv_positions(snap)
            matched = self._dv_alive(
                self._dv_scan(snap).filter(cond), existing
            )
            new_rows = matched.select(
                *[
                    (
                        assignments[f.name].cast(snap_schema[f.name])
                        if f.name in assignments
                        else F.col(f.name)
                    ).alias(f.name)
                    for f in snap.schema
                ]
            )
            return self._dv_commit(
                snap,
                matched,
                existing,
                "UPDATE",
                params,
                new_rows=new_rows,
                isolation=isolation,
            )

        def rewrite(sub: DataFrame) -> DataFrame:
            out = sub
            for name, expr in assignments.items():
                out = out.withColumn(
                    name,
                    F.when(cond, expr.cast(snap_schema[name])).otherwise(
                        F.col(name)
                    ),
                )
            return out

        return self._touched_rewrite(
            cond, rewrite, "UPDATE", params, isolation
        )

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        prune_files: bool = False,
        use_dv: bool = False,
        isolation: str = "write_serializable",
    ) -> int | None:
        """Copy-on-write MERGE (upsert): matched target rows are
        replaced by their source row, unmatched source rows are
        inserted — the semantic core of ``MERGE INTO``. Relational
        algebra shared with ``operators/scd.merge_upsert``.

        ``prune_files=False`` (default) commits the result as a full
        overwrite: every row's change-feed event count is then a pure
        function of the DATA (3 events for a surviving pre-merge row,
        1 for an upserted one), which is what lets
        ``ext_delta_merge_cdf`` pin per-row counts in its oracle.

        ``prune_files=True`` is the real engine's optimization of the
        same contract: only files whose stats range can contain a
        source key (plus statless files — conservative) are read and
        rewritten; untouched files stay committed as-is. At 100 TB an
        incremental upsert touches a sliver of the table, and
        rewriting only that sliver is the difference between a merge
        and a full rebuild. The RESULT relation is identical either
        way (tests pin it); per-row CDF event counts become
        layout-dependent (rows sharing a file with a matched row get
        delete+reinsert), but the change feed's NET fold still equals
        the snapshot — the layout-independent CDF invariant.

        Single-key pruning only: multi-key ranges compose poorly with
        per-column min/max, so multi-key merges fall back to the full
        overwrite.

        ``use_dv=True`` is the modern writer's DV-based MERGE: matched
        target rows go dead under a deletion-vector sidecar and the
        ENTIRE source relation (replacements + inserts) lands as new
        files in the same commit — zero target files rewritten, write
        cost ∝ |source| + matched positions. Rows merely SHARING a
        file with a matched row contribute no change-feed events (the
        copy-on-write paths' delete+reinsert of untouched neighbors
        disappears). Single-key sources additionally prune the
        match-discovery scan by file stats. Returns None when the
        source is empty (a no-op)."""
        from ...operators.scd import merge_upsert

        idents = self._identity_fields(self.snapshot().schema)
        if idents:
            # MERGE lands source rows carrying the identity column's
            # values verbatim, bypassing assignment — accepting them
            # without advancing the watermark would let a later
            # identity-omitting append re-mint a merged id. Refused
            # until merge learns to restate the watermark; route
            # inserts through write() (which assigns + advances) and
            # matched updates through update()
            raise NotImplementedError(
                f"MERGE into a table with identity columns "
                f"({sorted(idents)}) is not supported: merged values "
                "would bypass the watermark and risk duplicate ids; "
                "append new rows via write() and change matched rows "
                "via update()"
            )
        if use_dv:
            return self._merge_with_dv(source, keys, isolation)
        target = self.read()
        if not prune_files or len(keys) != 1:
            merged = merge_upsert(target, source.select(*target.columns), keys)
            return self.write(merged, mode="overwrite")

        key = keys[0]
        bounds = source.select(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        snap = self.snapshot()
        self._assert_not_append_only(snap, "MERGE")
        touched = set(self.files_for_range(key, bounds["lo"], bounds["hi"]))
        touched_rels = sorted(
            rel
            for rel in snap.files
            if os.path.join(self.path, rel) in touched
        )
        if touched_rels:
            sub = self._read_files_dv_aware(snap, touched_rels)
            sub = sub.select(
                *self._logical_casts(snap.schema, set(sub.columns))
            )
        else:
            sub = self.spark.createDataFrame([], snap.schema)
        merged_sub = merge_upsert(sub, source.select(*sub.columns), keys)
        # the pruned path bypasses write(), so it enforces the same
        # commit invariant itself: CHECK constraints and generated
        # columns hold on the replacement relation or nothing commits
        self._enforce_constraints(merged_sub, snap.configuration)
        self._enforce_generated(merged_sub, snap.schema)
        adds = self._stage_for_schema(
            merged_sub, snap.schema, snap.partition_columns
        )
        now_ms = int(time.time() * 1000)
        actions: list[dict[str, Any]] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "MERGE",
                    "operationParameters": {
                        "keys": json.dumps(keys),
                        "prunedFiles": len(snap.files) - len(touched_rels),
                        "rewrittenFiles": len(touched_rels),
                    },
                }
            }
        ]
        for rel in touched_rels:
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
        actions.extend({"add": add} for add in adds)
        return self._commit_resolving(
            snap, actions, "MERGE", isolation=isolation
        )

    def _merge_with_dv(
        self,
        source: DataFrame,
        keys: list[str],
        isolation: str = "write_serializable",
    ) -> int | None:
        snap = self.snapshot()
        self._assert_not_append_only(snap, "MERGE")
        if snap.files and any(os.path.isabs(r) for r in snap.files):
            raise NotImplementedError(
                "deletion vectors on tables with absolute file "
                "references (shallow clones) are not supported"
            )
        src = source.select(*[f.name for f in snap.schema])
        if src.isEmpty():
            return None  # nothing to match, nothing to insert
        scan_rels = sorted(snap.files)
        if len(keys) == 1 and scan_rels:
            # single-key stats pruning of the DISCOVERY scan: only
            # files whose min/max range can contain a source key need
            # reading for matched positions (statless files stay in —
            # conservative). NULL-keyed source rows match nothing per
            # SQL join semantics, so the bounds may ignore them.
            bounds = src.select(
                F.min(keys[0]).alias("lo"), F.max(keys[0]).alias("hi")
            ).collect()[0]
            if bounds["lo"] is None:
                scan_rels = []
            else:
                in_range = set(
                    self.files_for_range(keys[0], bounds["lo"], bounds["hi"])
                )
                scan_rels = sorted(
                    rel
                    for rel in snap.files
                    if os.path.join(self.path, rel) in in_range
                )
        existing = self._dv_positions(snap)
        if scan_rels:
            matched = self._dv_alive(
                # AQE picks broadcast for a small key set; an explicit
                # hint would be wrong for a table-scale source
                self._dv_scan(snap, scan_rels).join(
                    src.select(*keys).distinct(), on=keys, how="left_semi"
                ),
                existing,
            )
        else:
            matched = self.spark.createDataFrame(
                [], "`_rel` string, `_pos` bigint"
            )
        return self._dv_commit(
            snap,
            matched,
            existing,
            "MERGE",
            {
                "keys": json.dumps(keys),
                "prunedFiles": len(snap.files) - len(scan_rels),
            },
            new_rows=src,
            isolation=isolation,
        )

