"""Write side: write()/staging, in-commit timestamps, row tracking injection, OCC commit-with-rebase, the raw commit.

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


class _CommitMixin:
    # -- write ----------------------------------------------------------

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest ``txn`` version committed by ``app_id``, or None if
        the app never committed (or the table does not exist yet) —
        the read half of the protocol's streaming-idempotence ledger:
        a foreachBatch sink skips any batch id ≤ this value."""
        if not self.exists():
            return None
        return self.snapshot().app_versions.get(app_id)

    @staticmethod
    def _matching_rels(
        snap: Snapshot, replace_where: dict[str, Any]
    ) -> set[str]:
        """Active files whose partitionValues match the filter, in the
        hive string domain (same rule as files_for)."""
        wanted = {
            k: (None if v is None else str(v))
            for k, v in replace_where.items()
        }
        return {
            rel
            for rel, add in snap.files.items()
            if all(
                (add.get("partitionValues") or {}).get(k) == v
                for k, v in wanted.items()
            )
        }

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        overwrite_schema: bool = False,
        merge_schema: bool = False,
        txn: tuple[str, int] | None = None,
        replace_where: dict[str, Any] | None = None,
    ) -> int:
        """Commit ``df`` as the next table version; returns it.

        ``mode="overwrite"`` removes every previously active file in
        the same commit (the reference's full-rewrite materialization,
        02_silver_transform.py:33-35); ``mode="append"`` only adds.
        Existing-table writes enforce the logged schema unless
        ``overwrite_schema=True`` (overwrite only), which commits a new
        ``metaData`` action — the ``overwriteSchema`` contract.

        ``merge_schema=True`` (append only) is the ``mergeSchema``
        contract: columns the incoming frame ADDS evolve the table
        schema (appended after the existing fields, nullable), while
        every existing column must still arrive with its logged type —
        widening only, never dropping. Older files simply lack the new
        columns; reads fill them with NULL via parquet footer merging,
        turned on per-table by the ``minidelta.appendSchemaEvolved``
        marker this write sets (only evolved tables pay the
        footer-merge cost; the marker persists — a conservative
        constant). Refused on column-mapped tables (new fields would
        need physical-name assignment) and on partition-layout
        changes, like the real option.

        ``replace_where={col: value, ...}`` scopes an overwrite to the
        matching PARTITIONS (the ``replaceWhere`` contract): only
        active files whose ``partitionValues`` match are removed,
        every incoming row must match the filter (validated before
        staging — the real option rejects strays too), and a lost
        put-if-absent race REBASES when the winner left the scoped
        partitions untouched — two concurrent daily-partition
        backfills over disjoint dates both land; overlapping ones
        still raise ConcurrentWriteError.

        ``txn=(app_id, version)`` stamps the commit with the
        protocol's ``txn`` action, recording that this application has
        committed through ``version`` — the ledger a streaming sink
        consults (``last_txn_version``) to make epoch replays
        idempotent. The stamp rides in the SAME atomic commit as the
        data, so a replayed epoch either fully committed (and is
        skipped) or never happened — there is no torn state."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode: {mode}")
        if merge_schema and mode != "append":
            raise ValueError("merge_schema applies to mode='append' only")
        tbl_exists = self.exists()
        prior = self.snapshot() if tbl_exists else None
        if prior is not None:
            self._assert_writer_features(prior)
            if mode == "overwrite":
                self._assert_not_append_only(prior, "overwrite")
        evolved_append: T.StructType | None = None
        # True only when the evolution ADDED columns (footer-merge /
        # null-fill territory) — a pure type widening sets
        # evolved_append for the metaData commit but must not set the
        # appendSchemaEvolved marker (reads handle widening via the
        # explicit scan schema, not footer merging)
        evolved_added_cols = False
        if (
            prior is not None
            and overwrite_schema
            and self._mapping_enabled(prior)
        ):
            raise NotImplementedError(
                "overwrite_schema on a column-mapped table is not "
                "supported (new fields would need physical-name "
                "assignment); evolve with rename_column/drop_column"
            )
        if replace_where is not None:
            if mode != "overwrite" or overwrite_schema:
                raise ValueError(
                    "replace_where requires mode='overwrite' without "
                    "overwrite_schema"
                )
            if prior is None:
                raise FileNotFoundError(
                    f"replace_where needs an existing table: {self.path}"
                )
            missing = sorted(
                set(replace_where) - set(prior.partition_columns)
            )
            if missing:
                raise SchemaMismatchError(
                    f"replace_where keys {missing} are not partition "
                    f"columns {prior.partition_columns}"
                )
            stray = df.filter(
                ~_all_match(
                    [
                        F.col(k).cast("string").eqNullSafe(
                            F.lit(None if v is None else str(v))
                        )
                        for k, v in replace_where.items()
                    ]
                )
            ).count()
            if stray:
                raise ConstraintViolationError(
                    f"replace_where {replace_where}: {stray} incoming "
                    "row(s) fall outside the replaced partitions"
                )
        # an explicit schema evolution REPLACES the metaData, so the
        # prior schema's generated columns must not be injected into
        # (or reordered onto) the evolved frame — a dropped or
        # redefined generated column would otherwise silently
        # resurrect, or fail on a stale expression whose inputs the
        # evolution removed
        if prior is not None and not (overwrite_schema and mode == "overwrite"):
            gen = self._generation_exprs(prior.schema)
            dft = self._default_exprs(prior.schema)
            if gen or dft:
                types = {f.name: f.dataType for f in prior.schema}
                for gname, gsql in gen.items():
                    if gname not in df.columns:
                        # the writer omitted the generated column:
                        # compute it (the protocol's convenience half)
                        df = df.withColumn(
                            gname, F.expr(gsql).cast(types[gname])
                        )
                for dname, dsql in dft.items():
                    if dname not in df.columns:
                        # omitted defaulted column: fill it (column
                        # defaults fill; provided values pass as-is)
                        df = df.withColumn(
                            dname, F.expr(dsql).cast(types[dname])
                        )
                if set(df.columns) == {f.name for f in prior.schema}:
                    df = df.select(*[f.name for f in prior.schema])
        # identity columns: an identity-omitting batch gets values
        # assigned (watermark + k*step via the two-pass distributed
        # row number) and this commit restates the advanced watermark;
        # GENERATED ALWAYS rejects writer-provided values, BY DEFAULT
        # accepts them and bumps the watermark past them
        identity_hwms: dict[str, int] = {}
        # identity columns whose watermark derives from the STAGED
        # files' footer stats after the write lands — both the
        # writer-assigned (sparse-assignment) and the BY DEFAULT
        # explicit-value cases: a pre-write aggregate job would
        # re-evaluate the frame, and a non-deterministic input
        # (rand(), sampling, unstable shuffle) could stage values
        # past the collected extreme, leaving the watermark behind
        # and letting a later identity-omitting append mint
        # duplicate ids. Deriving from what was actually staged also
        # removes the extra aggregate job.
        identity_pending: dict[str, dict] = {}
        identity_explicit: dict[str, dict] = {}
        if prior is not None and not (overwrite_schema and mode == "overwrite"):
            for iname, fmeta in self._identity_fields(prior.schema).items():
                if iname not in df.columns:
                    df, _ = self._assign_identity(df, iname, fmeta)
                    identity_pending[iname] = fmeta
                elif not fmeta.get(self._ID_EXPLICIT):
                    raise ValueError(
                        f"column {iname!r} is GENERATED ALWAYS AS "
                        "IDENTITY: writer-provided values are "
                        "rejected (declare it with "
                        "allow_explicit=True for BY DEFAULT semantics)"
                    )
                else:
                    identity_explicit[iname] = fmeta
            # realign column ORDER for any identity-bearing batch —
            # including BY DEFAULT batches that PROVIDE values
            # (identity_explicit): those add no new columns, so a
            # writer listing the same columns in a different order
            # must get the positional realign here, not fall through
            # to the schema comparison and a spurious
            # SchemaMismatchError (identity_hwms is always empty at
            # this point — explicit columns classify into
            # identity_explicit now)
            if (identity_pending or identity_explicit) and set(
                df.columns
            ) == {f.name for f in prior.schema}:
                df = df.select(*[f.name for f in prior.schema])
        if prior is not None:
            if (
                partition_by is not None
                and list(partition_by) != prior.partition_columns
                and not (overwrite_schema and mode == "overwrite")
            ):
                # real Delta rejects partition-layout changes outside
                # overwrite+overwriteSchema: mixing hive layouts under
                # one root breaks partition discovery on read and makes
                # files_for() pruning silently exclude the old files
                raise SchemaMismatchError(
                    f"partition columns {list(partition_by)} differ from "
                    f"the table's {prior.partition_columns}; pass "
                    "overwrite_schema=True with mode='overwrite' to "
                    "change the partition layout"
                )
            partition_by = partition_by or prior.partition_columns
            same = [(f.name, f.dataType) for f in df.schema] == [
                (f.name, f.dataType) for f in prior.schema
            ]
            if not same:
                if merge_schema and mode == "append":
                    if self._mapping_enabled(prior):
                        raise NotImplementedError(
                            "merge_schema on a column-mapped table is "
                            "not supported (new fields need physical-"
                            "name assignment); evolve via "
                            "overwrite_schema instead"
                        )
                    prior_types = {f.name: f.dataType for f in prior.schema}
                    df_types = {f.name: f.dataType for f in df.schema}
                    missing = sorted(set(prior_types) - set(df_types))
                    if missing:
                        raise SchemaMismatchError(
                            "merge_schema append may ADD columns, "
                            f"never drop: missing {missing}"
                        )
                    conflict = sorted(
                        n
                        for n, t in prior_types.items()
                        if df_types[n] != t
                    )
                    tw_on = (
                        prior.configuration.get(self._TW_KEY) == "true"
                    )
                    widened: dict[str, T.DataType] = {}
                    for n in conflict:
                        if self._is_type_widening(
                            df_types[n], prior_types[n]
                        ):
                            # NARROWER input (int batch into a long
                            # column): safe upcast of the batch to the
                            # table type — enforcement, not evolution
                            df = df.withColumn(
                                n, F.col(n).cast(prior_types[n])
                            )
                        elif tw_on and self._is_type_widening(
                            prior_types[n], df_types[n]
                        ):
                            # WIDER input under the typeWidening
                            # feature: the TABLE evolves (protocol
                            # "Type Widening"); old files upcast
                            # in-scan via the explicit read schema
                            widened[n] = df_types[n]
                        else:
                            hint = (
                                f" ({n} would widen: enable the "
                                "typeWidening feature via "
                                "enable_type_widening() to accept it)"
                                if self._is_type_widening(
                                    prior_types[n], df_types[n]
                                )
                                else ""
                            )
                            raise SchemaMismatchError(
                                "merge_schema append cannot change "
                                f"existing column types: {conflict}"
                                + hint
                            )
                    new_fields = [
                        T.StructField(f.name, f.dataType, True)
                        for f in df.schema
                        if f.name not in prior_types
                    ]
                    if not new_fields and not widened:
                        # merely REORDERED (or safely upcast) columns,
                        # nothing new: align to the table schema and
                        # write as a plain append — committing a no-op
                        # metaData action here would permanently set
                        # the appendSchemaEvolved marker and tax every
                        # future read with parquet footer merging
                        df = df.select(*[f.name for f in prior.schema])
                    else:
                        base_fields = []
                        for f in prior.schema:
                            if f.name in widened:
                                # record the change in the field's
                                # metadata, the protocol's
                                # delta.typeChanges shape — reads key
                                # explicit-schema upcasting off it,
                                # and time travel to an older version
                                # naturally reads the narrow type
                                md = dict(f.metadata or {})
                                changes = list(
                                    md.get(self._TYPE_CHANGES_META, [])
                                )
                                changes.append(
                                    {
                                        "fromType": (
                                            f.dataType.simpleString()
                                        ),
                                        "toType": (
                                            widened[f.name].simpleString()
                                        ),
                                        "tableVersion": prior.version + 1,
                                    }
                                )
                                md[self._TYPE_CHANGES_META] = changes
                                base_fields.append(
                                    T.StructField(
                                        f.name, widened[f.name], True, md
                                    )
                                )
                            else:
                                base_fields.append(f)
                        evolved_append = T.StructType(
                            base_fields + new_fields
                        )
                        evolved_added_cols = bool(new_fields)
                        df = df.select(*[f.name for f in evolved_append])
                elif not (overwrite_schema and mode == "overwrite"):
                    raise SchemaMismatchError(
                        "write schema differs from table schema "
                        f"(table {prior.schema.simpleString()}, "
                        f"write {df.schema.simpleString()}); pass "
                        "overwrite_schema=True with mode='overwrite' "
                        "to evolve (or merge_schema=True with "
                        "mode='append' to add columns)"
                    )
        partition_by = partition_by or []
        if prior is not None:
            # CHECK constraints live in the configuration, which
            # SURVIVES a schema evolution (the new metaData restates
            # it below) — always enforced. Generation expressions live
            # in the prior schema's column metadata, which an explicit
            # evolution REPLACES — skipped exactly when the injection
            # block above is.
            self._enforce_constraints(df, prior.configuration)
            if not (overwrite_schema and mode == "overwrite"):
                self._enforce_generated(df, prior.schema)

        adds = self._stage_for_schema(
            df,
            evolved_append
            if evolved_append is not None
            else (prior.schema if prior is not None else df.schema),
            partition_by,
        )
        for iname, fmeta in {**identity_pending, **identity_explicit}.items():
            # the staged files' own footer stats carry the extreme
            # assigned/provided value — the watermark advance costs
            # zero jobs and reflects exactly what was committed
            step = int(fmeta[self._ID_STEP])
            key = "maxValues" if step > 0 else "minValues"
            pname = self._phys_column(prior.schema, iname)
            vals = []
            for a in adds:
                st = json.loads(a["stats"]) if a.get("stats") else None
                if st is not None and int(st.get("numRecords", 0) or 0) == 0:
                    continue  # verifiably empty file
                v = None if st is None else st.get(key, {}).get(pname)
                if v is None:
                    # No usable min/max for this file. "All-NULL"
                    # (legal for BY DEFAULT explicit values — nothing
                    # to advance past) must be DISTINGUISHED from
                    # "stat unavailable" (footer-read error, or one
                    # stat-less row group poisoning the column in
                    # _file_stats_json): silently treating the latter
                    # as all-NULL leaves the watermark behind the
                    # committed values, and a later identity-omitting
                    # append would mint duplicate ids.
                    apath = os.path.join(self.path, a["path"])
                    nonnull = _column_nonnull_count(apath, pname)
                    if nonnull == 0:
                        if iname in identity_explicit:
                            continue  # verifiably all-NULL file
                        raise RuntimeError(
                            f"assigned identity column {iname!r} came "
                            f"back all-NULL in staged file "
                            f"{a['path']!r} — writer bug"
                        )
                    # non-null values exist (or the footer can't say):
                    # recover the true extreme with one bounded
                    # single-file aggregate over the staged file —
                    # O(one file), only on this rare fallback path
                    agg = F.max if step > 0 else F.min
                    row = (
                        self.spark.read.parquet(apath)
                        .agg(agg(F.col(pname)))
                        .first()
                    )
                    if row is None or row[0] is None:
                        if iname in identity_explicit:
                            continue  # all-NULL after all
                        raise RuntimeError(
                            "identity watermark needs a value for "
                            f"{iname!r}; none recoverable from "
                            f"{a['path']!r}"
                        )
                    vals.append(int(row[0]))
                else:
                    vals.append(int(v))
            if vals:
                ext = max(vals) if step > 0 else min(vals)
                hwm = fmeta.get(self._ID_HWM)
                # only-advance: explicit values BELOW the watermark
                # must not rewind it (assigned values are always past
                # it, so the guard is a no-op for that case)
                if (
                    hwm is None
                    or (step > 0 and ext > int(hwm))
                    or (step < 0 and ext < int(hwm))
                ):
                    identity_hwms[iname] = ext
        version = (prior.version + 1) if prior is not None else 0
        now_ms = int(time.time() * 1000)
        actions: list[dict[str, Any]] = [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "WRITE",
                    "operationParameters": {
                        "mode": mode.upper(),
                        "partitionBy": json.dumps(partition_by),
                        **(
                            {
                                "replaceWhere": json.dumps(
                                    {
                                        k: None if v is None else str(v)
                                        for k, v in replace_where.items()
                                    },
                                    sort_keys=True,
                                )
                            }
                            if replace_where is not None
                            else {}
                        ),
                    },
                }
            }
        ]
        new_meta = (
            prior is None
            or overwrite_schema
            or evolved_append is not None
            or partition_by != prior.partition_columns
        )
        meta_schema = (
            evolved_append if evolved_append is not None else df.schema
        )
        if identity_hwms:
            # the advanced watermark rides THIS commit's metaData —
            # atomically with the rows it covers, so a crash between
            # the two can never replay ids
            src = (
                evolved_append
                if evolved_append is not None
                else prior.schema
            )
            meta_schema = T.StructType(
                [
                    (
                        T.StructField(
                            f.name,
                            f.dataType,
                            f.nullable,
                            {
                                **(f.metadata or {}),
                                self._ID_HWM: identity_hwms[f.name],
                            },
                        )
                        if f.name in identity_hwms
                        else f
                    )
                    for f in src
                ]
            )
            new_meta = True
        if prior is None:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if new_meta:
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": meta_schema.json(),
                        "partitionColumns": partition_by,
                        # table properties (CHECK constraints included)
                        # survive a schema evolution
                        "configuration": {
                            **(prior.configuration if prior else {}),
                            **(
                                {self._EVOLVED_KEY: "true"}
                                if evolved_added_cols
                                else {}
                            ),
                        },
                        "createdTime": now_ms,
                    }
                }
            )
        if txn is not None:
            actions.append(
                {"txn": {"appId": str(txn[0]), "version": int(txn[1])}}
            )
        victims: set[str] = set()
        if mode == "overwrite" and prior is not None:
            victims = (
                set(prior.files)
                if replace_where is None
                else self._matching_rels(prior, replace_where)
            )
            for rel in sorted(victims):
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
        # Conflict resolution on a lost put-if-absent race, per the
        # Delta protocol's read-set rules:
        # - BLIND APPENDS read nothing, so they conflict only with a
        #   concurrent metadata/protocol change — detected by
        #   re-checking schema and partition layout against the new
        #   latest snapshot before retrying at the next version.
        # - PARTITION-SCOPED OVERWRITES (replace_where) read exactly
        #   the scoped partitions: if the winner left the matching
        #   file set untouched (a disjoint-partition backfill), the
        #   commit rebases; if the set changed — the winner wrote
        #   into or removed from our partitions — the conflict
        #   surfaces.
        # Full overwrites (which read every file they remove) and
        # table-creating writes still surface the conflict to the
        # caller.
        rebasable = (
            prior is not None
            and (mode == "append" or replace_where is not None)
            # an identity-assigning commit must NOT rebase: its values
            # and watermark were computed against the lost snapshot,
            # and replaying them past the winner would mint duplicates
            # — the conflict surfaces and the caller's retry re-assigns
            and not identity_hwms
        )
        attempts = 0
        # each attempt commits a pristine copy: the commit-time
        # injectors (row-id watermark, in-commit timestamp) mutate the
        # action list against the attempt's predecessor, and a rebase
        # must recompute them against the WINNER's chain — retrying
        # the mutated list would reuse a stale row-id watermark and
        # hand two writers overlapping ids
        pristine = copy.deepcopy(actions)
        while True:
            try:
                attempt = copy.deepcopy(pristine)
                self._commit(version, attempt)
                return version
            except ConcurrentWriteError:
                attempts += 1
                if not rebasable or attempts > 50:
                    raise
                latest = self.snapshot()
                if txn is not None:
                    # the idempotent-sink ledger: a winner advancing
                    # the SAME app id means our batch may already be
                    # applied — rebasing would double-apply it
                    for w in range(version, latest.version + 1):
                        for a in self._read_actions(w):
                            wt = a.get("txn")
                            if wt and wt.get("appId") == str(txn[0]):
                                raise ConcurrentTransactionError(
                                    "append lost to a concurrent "
                                    "transaction for app "
                                    f"{txn[0]!r} at version {w}",
                                    winning_version=w,
                                )
                if [(f.name, f.dataType) for f in latest.schema] != [
                    (f.name, f.dataType) for f in df.schema
                ] or latest.partition_columns != list(partition_by):
                    # winner changed the table's shape under us
                    raise MetadataChangedError(
                        f"{mode.upper()} lost to a schema or "
                        "partition-layout change",
                        winning_version=latest.version,
                    )
                if replace_where is not None:
                    now_matching = self._matching_rels(
                        latest, replace_where
                    )
                    if now_matching - victims:
                        raise ConcurrentAppendError(
                            "replaceWhere lost to a winner that "
                            "ADDED files into the replaced scope",
                            winning_version=latest.version,
                        )
                    if victims - now_matching:
                        raise ConcurrentDeleteReadError(
                            "replaceWhere lost to a winner that "
                            "REMOVED files from the replaced scope",
                            winning_version=latest.version,
                        )
                version = latest.version + 1

    def _stage_data_files(
        self,
        df: DataFrame,
        partition_by: list[str],
        max_records_per_file: int | None = None,
    ) -> list[dict[str, Any]]:
        """Write the data through the stock Spark parquet writer into a
        temp dir, then move the part files into the table root
        (preserving hive partition subdirs) and return their ``add``
        payloads. Distributed write first, driver-side metadata move
        second — the move touches one inode per FILE, never data."""
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".staging-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite").format("parquet")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(tmp)
        adds: list[dict[str, Any]] = []
        try:
            for root, _dirs, names in os.walk(tmp):
                for name in names:
                    if name.startswith((".", "_")) or not name.endswith(
                        ".parquet"
                    ):
                        continue
                    src = os.path.join(root, name)
                    rel = os.path.relpath(src, tmp)
                    dst = os.path.join(self.path, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(src, dst)
                    st = os.stat(dst)
                    adds.append(
                        {
                            "path": rel,
                            "partitionValues": _parse_partition_values(rel),
                            "size": st.st_size,
                            "modificationTime": int(st.st_mtime * 1000),
                            "dataChange": True,
                            # per-file min/max from the footer the
                            # writer just produced — fuels data
                            # skipping (files_for_range)
                            "stats": _base._file_stats_json(dst),
                        }
                    )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return adds

    _ICT_KEY = "delta.enableInCommitTimestamps"

    def _inject_in_commit_timestamp(
        self, version: int, actions: list[dict[str, Any]]
    ) -> None:
        """When the table feature is on, stamp this commit's
        ``commitInfo`` with a MONOTONIC ``inCommitTimestamp`` =
        max(clock now, previous commit's effective timestamp + 1) —
        the protocol's in-commit-timestamps contract (PROTOCOL.md
        "In-Commit Timestamps"): readers then trust the log, not file
        mtimes or writer clocks, so time travel can never be reordered
        by clock skew. Feature detection is O(1): the enabling commit
        carries a metaData action with the config flag; every later
        commit sees its predecessor's ICT (the chain property). Only
        when the predecessor's JSON has been expired does this fall
        back to a snapshot replay for the config."""
        info = next(
            (a["commitInfo"] for a in actions if "commitInfo" in a), None
        )
        if info is None or "inCommitTimestamp" in info:
            return
        meta = next(
            (a["metaData"] for a in actions if "metaData" in a), None
        )
        prev_info: dict[str, Any] = {}
        if version > 0:
            try:
                prev_info = next(
                    (
                        a["commitInfo"]
                        for a in self._read_actions(version - 1)
                        if "commitInfo" in a
                    ),
                    {},
                )
            except OSError:
                prev_info = {}
        if meta is not None:
            enabled = (
                meta.get("configuration", {}).get(self._ICT_KEY) == "true"
            )
        elif "inCommitTimestamp" in prev_info:
            enabled = True
        elif version > 0 and not prev_info:
            # predecessor expired: the config is the source of truth
            try:
                enabled = (
                    self.snapshot().configuration.get(self._ICT_KEY)
                    == "true"
                )
            except Exception:
                enabled = False
        else:
            enabled = False
        if not enabled:
            return
        prev_eff = int(
            prev_info.get(
                "inCommitTimestamp", prev_info.get("timestamp", 0)
            )
        )
        info["inCommitTimestamp"] = max(
            int(time.time() * 1000), prev_eff + 1
        )

    _RT_KEY = "delta.enableRowTracking"
    _RT_MAT_KEY = "delta.rowTracking.materializedRowIdColumnName"
    _RT_DOMAIN = "delta.rowTracking"
    _RT_MAT_TAG = "delta.rowTracking.materialized"

    def _inject_row_tracking(
        self, version: int, actions: list[dict[str, Any]]
    ) -> None:
        """When row tracking is on, assign ``baseRowId`` to every add
        action that lacks one (fresh files: row id = baseRowId + file
        row index, the protocol's fresh-row-id formula) and restate
        the row-id high watermark as a ``domainMetadata`` action
        (domain ``delta.rowTracking``) — PROTOCOL.md "Row Tracking".
        Restating the domain every commit keeps feature detection O(1)
        (the chain property, same trick as the ICT injector): the
        enabling commit carries the metaData flag, every later commit
        sees its predecessor's domainMetadata. Re-committed adds (DV
        re-adds, bloom tag re-commits, RESTORE, checkpoint restates)
        carry their original baseRowId in the copied payload, so the
        assignment is idempotent."""
        if any(
            a.get("domainMetadata", {}).get("domain") == self._RT_DOMAIN
            for a in actions
        ):
            return  # caller managed the ROW-TRACKING domain itself
            # (enable path); an unrelated domainMetadata action must
            # not suppress baseRowId assignment, or later
            # read(with_row_ids=True) raises on adds without one
        meta = next(
            (a["metaData"] for a in actions if "metaData" in a), None
        )
        prev_dm: str | None = None
        prev_readable = False
        if version > 0:
            try:
                for a in self._read_actions(version - 1):
                    prev_readable = True
                    dm = a.get("domainMetadata")
                    if dm and dm["domain"] == self._RT_DOMAIN and not dm.get(
                        "removed"
                    ):
                        prev_dm = dm.get("configuration")
            except OSError:
                prev_readable = False
        if meta is not None:
            enabled = (
                meta.get("configuration", {}).get(self._RT_KEY) == "true"
            )
            if enabled and prev_dm is None and version > 0:
                # metadata commit on an already-tracked table: the
                # watermark lives in the predecessor chain / snapshot
                snap = self.snapshot()
                prev_dm = snap.domain_metadata.get(self._RT_DOMAIN)
        elif prev_dm is not None:
            enabled = True
        elif version > 0 and not prev_readable:
            try:
                snap = self.snapshot()
                enabled = snap.configuration.get(self._RT_KEY) == "true"
                prev_dm = snap.domain_metadata.get(self._RT_DOMAIN)
            except Exception:
                enabled = False
        else:
            enabled = False
        if not enabled:
            return
        hwm = -1
        if prev_dm:
            hwm = int(json.loads(prev_dm).get("rowIdHighWaterMark", -1))
        for a in actions:
            add = a.get("add")
            if add is None or add.get("baseRowId") is not None:
                continue
            stats = json.loads(add["stats"]) if add.get("stats") else {}
            n = stats.get("numRecords")
            if n is None:
                raise RuntimeError(
                    "row tracking requires numRecords stats on every "
                    f"add; missing for {add['path']!r}"
                )
            add["baseRowId"] = hwm + 1
            hwm += int(n)
        actions.append(
            {
                "domainMetadata": {
                    "domain": self._RT_DOMAIN,
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": hwm}
                    ),
                    "removed": False,
                }
            }
        )

    def _commit_resolving(
        self,
        snap: Snapshot,
        actions: list[dict[str, Any]],
        operation: str,
        isolation: str = "write_serializable",
        read_rels: set[str] | None = None,
        max_attempts: int = 50,
    ) -> int:
        """Commit ``actions`` at ``snap.version + 1``, resolving lost
        put-if-absent races with the public Delta protocol's conflict
        rules: replay every winning commit's actions against this
        transaction's READ and REMOVE sets and either REBASE (retry
        verbatim at the next version — the staged files are already
        on disk and still valid) or raise the matching typed conflict:

        * ``protocol`` action        → :class:`ProtocolChangedError`
          (unless it restates exactly the gates this transaction's
          read snapshot already held — a no-op restate changes
          nothing the loser depended on)
        * ``metaData`` action        → :class:`MetadataChangedError`
        * ``txn`` for our app id     → :class:`ConcurrentTransactionError`
        * remove ∩ our removes       → :class:`ConcurrentDeleteDeleteError`
        * remove ∩ our reads         → :class:`ConcurrentDeleteReadError`
        * dataChange add, isolation ``serializable``, and we read
          anything                   → :class:`ConcurrentAppendError`
          (the default ``write_serializable`` level admits blind
          appends against DML — Delta's documented anomaly; pass
          ``isolation="serializable"`` for strict behavior)

        The REMOVE set is derived from ``actions`` (their remove
        paths); ``read_rels`` defaults to it — the touched-file model
        of predicate DML, where untouched files neither constrain nor
        are constrained by the winner. Each attempt re-commits a
        pristine deep copy of ``actions`` so the commit-time injectors
        (row-id assignment against the WINNER's high watermark,
        in-commit timestamps against the winner's clock chain) always
        compute against the true predecessor."""
        if isolation not in ("write_serializable", "serializable"):
            raise ValueError(
                "isolation must be 'write_serializable' or "
                f"'serializable', got {isolation!r}"
            )
        self._assert_writer_features(snap)
        removed = {
            a["remove"]["path"] for a in actions if "remove" in a
        }
        reads = removed if read_rels is None else set(read_rels)
        my_apps = {a["txn"]["appId"] for a in actions if "txn" in a}
        pristine = copy.deepcopy(actions)
        version = snap.version + 1
        attempts = 0
        while True:
            try:
                attempt = copy.deepcopy(pristine)
                self._commit(version, attempt)
                return version
            except ConcurrentWriteError:
                attempts += 1
                vs = self.versions()
                latest = vs[-1] if vs else None
                if latest is None or latest < version:
                    raise
                for w in range(version, latest + 1):
                    for a in self._read_actions(w):
                        if "protocol" in a:
                            # a protocol action that merely RESTATES
                            # the gates this transaction already read
                            # is not a protocol change — only an
                            # actual upgrade invalidates the loser's
                            # snapshot (belt to _dv_commit_inner's
                            # emit-only-on-upgrade braces: a foreign
                            # writer's restate must not break the
                            # conflict matrix either)
                            won = a["protocol"]
                            if (
                                int(won.get("minReaderVersion", 1))
                                == snap.min_reader
                                and int(won.get("minWriterVersion", 1))
                                == snap.min_writer
                                and frozenset(
                                    won.get("readerFeatures") or ()
                                )
                                == snap.reader_features
                                and frozenset(
                                    won.get("writerFeatures") or ()
                                )
                                == snap.writer_features
                            ):
                                continue
                            raise ProtocolChangedError(
                                f"{operation} lost to a protocol "
                                f"upgrade at version {w}",
                                winning_version=w,
                            )
                        if "metaData" in a:
                            raise MetadataChangedError(
                                f"{operation} lost to a metadata "
                                f"change at version {w}",
                                winning_version=w,
                            )
                        txn = a.get("txn")
                        if txn and txn.get("appId") in my_apps:
                            raise ConcurrentTransactionError(
                                f"{operation} lost to a concurrent "
                                f"transaction for app "
                                f"{txn['appId']!r} at version {w}",
                                winning_version=w,
                            )
                        rm = a.get("remove")
                        if rm and rm["path"] in removed:
                            raise ConcurrentDeleteDeleteError(
                                f"{operation} and the version-{w} "
                                "winner both remove "
                                f"{rm['path']!r}",
                                winning_version=w,
                            )
                        if rm and rm["path"] in reads:
                            raise ConcurrentDeleteReadError(
                                f"version-{w} winner removed "
                                f"{rm['path']!r}, which "
                                f"{operation} read",
                                winning_version=w,
                            )
                        add = a.get("add")
                        if (
                            add
                            and add.get("dataChange", True)
                            and isolation == "serializable"
                            and reads
                        ):
                            raise ConcurrentAppendError(
                                f"version-{w} winner appended "
                                f"{add['path']!r} under serializable "
                                f"isolation while {operation} read "
                                "the table",
                                winning_version=w,
                            )
                if attempts >= max_attempts:
                    raise
                version = latest + 1

    def _commit(self, version: int, actions: list[dict[str, Any]]) -> None:
        self._inject_row_tracking(version, actions)
        self._inject_in_commit_timestamp(version, actions)
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            for action in actions:
                fh.write(json.dumps(action, separators=(",", ":")) + "\n")
        _atomic_publish(tmp, self._version_file(version))
        self._maybe_checkpoint(version)

