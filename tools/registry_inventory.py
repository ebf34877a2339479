"""Generate REGISTRY.md: one line per registered query, grouped by
key prefix family, first docstring sentence as the description.

Run after registering/renaming queries:

    python tools/registry_inventory.py > REGISTRY.md

tests/test_registry_inventory.py pins REGISTRY.md's key set against
the live registry, so a stale inventory fails the suite instead of
shipping."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Library surface with NO external driver row — the registry sits at
# its 150 = 50-slot × 3-round capacity (registry.py's capacity
# invariant), so these operators are proven by the pytest anchors
# below instead of a DuckDB oracle row in a CORRECTNESS_r*.json.
# "Not externally gated" ≠ "not checked": every anchor runs in the
# standard suite. Each entry: (capability, implementation module,
# pytest anchor "file::test"). test_registry_inventory.py pins that
# every anchor still exists.
PYTEST_ONLY = [
    (
        "SQ8 scalar quantization (calibrate / encode / dequantize / "
        "brute-force compressed top-k; the IVF×SQ8 composition is "
        "externally gated as `ext_sq8_ivf_topk` since r9)",
        "ecommerce_lakehouse_platform_spark/operators/quantize.py",
        "tests/test_quantize.py::test_sq8_codes_and_dequant_match_reference",
    ),
    (
        "Delta CHECK constraints (ADD/DROP CONSTRAINT, write-path and "
        "DML-path enforcement)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_check_constraints_enforced_on_write",
    ),
    (
        "Delta generated columns (declare, compute-when-omitted, "
        "enforce-when-provided, evolution drop)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_generated_columns_computed_and_enforced",
    ),
    (
        "Deletion vectors (position-sidecar DELETE, per-file sidecar "
        "layout, DV-aware CDF, DV clone, protocol gate)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_deletion_vectors_delete_without_rewrite",
    ),
    (
        "DV-backed UPDATE (matched positions die under a sidecar, "
        "rewritten rows append in the same commit — zero file "
        "rewrites; CDF delete+insert; constraints gate)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_dv_update_without_rewrite",
    ),
    (
        "DV-backed MERGE (stats-pruned match discovery, source lands "
        "as new files, neighbors emit no CDF events; streamed feed "
        "== batch feed)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_dv_merge_upsert_without_rewrite",
    ),
    (
        "CDF streaming admission control (maxVersionsPerTrigger + "
        "soft maxBytesPerTrigger with a >=1-version floor, composing) "
        "+ expiry-safe resume guards",
        "ecommerce_lakehouse_platform_spark/streaming/cdf_source.py",
        "tests/test_cdf_stream_source.py::"
        "test_max_versions_per_trigger_bounds_batches",
    ),
    (
        "Table streaming source minidelta_stream (append tail — the "
        "plain format('delta') readStream contract: change commits "
        "raise unless skipChangeCommits / remove-only ignoreDeletes, "
        "housekeeping invisible, checkpointed resume)",
        "ecommerce_lakehouse_platform_spark/streaming/cdf_source.py",
        "tests/test_cdf_stream_source.py::test_table_stream_tails_appends",
    ),
    (
        "REORG TABLE APPLY (PURGE) — materialize deletion vectors by "
        "rewriting only the DV-carrying files (clean neighbors keep "
        "their add entries verbatim, fully-dead files leave the "
        "layout, dataChange=false, vacuum reclaims the sidecars)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_reorg_purge_materializes_dvs",
    ),
    (
        "DESCRIBE DETAIL (metadata-only table profile)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_describe_detail",
    ),
    (
        "TIMESTAMP AS OF time travel (+ clock-skew monotonizing)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_timestamp_as_of_monotonizes_clock_skew",
    ),
    (
        "In-commit timestamps (monotonic authoritative commit time "
        "under writer clock skew; time travel + CDF stamp by it)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_in_commit_timestamps_monotonic_and_authoritative",
    ),
    (
        "BPE tokenizer training, full merge loop (train_bpe: one "
        "corpus scan -> vocab-sized iterations, exact greedy "
        "array-fold merges, deterministic tiebreak, early stop; "
        "apply_merges = the encode half, one nested JVM fold)",
        "ecommerce_lakehouse_platform_spark/operators/bpe.py",
        "tests/test_bpe.py::test_train_bpe_matches_reference",
    ),
    (
        "mergeSchema append (write(merge_schema=True): added columns "
        "evolve the schema, older files read/stream as NULL via "
        "marker-gated footer merging + availability-aware casts; DML/"
        "OPTIMIZE/CDF compose across the evolution)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_merge_schema_append_evolves_and_reads_null",
    ),
    (
        "Column DEFAULT values (CURRENT_DEFAULT metadata; omitted "
        "columns fill at write, provided values pass as-is, "
        "constant-foldable-only, DROP DEFAULT; r13: add_column(..., "
        "default_sql=) freezes the EXISTS_DEFAULT read half — files "
        "physically predating the column surface the frozen default "
        "via per-file footer presence + a broadcast membership join, "
        "post-add stored NULLs stay NULL, rewrites materialize the "
        "default, SET DEFAULT re-points only the write half)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_add_column_exists_default_read_and_write_halves",
    ),
    (
        "Row tracking (baseRowId per add + domainMetadata high "
        "watermark; read(with_row_ids=True); ids preserved across DV "
        "deletes, copy-on-write DELETE/UPDATE, OPTIMIZE, ZORDER, and "
        "REORG PURGE via the hidden materialized column; "
        "checkpoint/expiry-safe)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_row_tracking.py::"
        "test_ids_stable_across_every_preserving_rewrite",
    ),
    (
        "RESTORE TABLE ... VERSION/TIMESTAMP AS OF (history-forward "
        "restore, file-set + schema rebind, configuration carried; "
        "externally gated r5–r8 as `ext_delta_restore`, retired r10 "
        "for `stream_cdf_source`)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_restore_commits_old_snapshot_forward",
    ),
    (
        "replaceWhere partition-scoped overwrite with "
        "disjoint-partition conflict rebase",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_replace_where_disjoint_race_rebases",
    ),
    (
        "Exactly-once streaming sink (txn-stamped foreachBatch into "
        "the mini Delta log)",
        "ecommerce_lakehouse_platform_spark/streaming/delta_sink.py",
        "tests/test_streaming_ingest.py::"
        "test_stream_ingest_into_minidelta_exactly_once",
    ),
    (
        "OPTIMIZE ZORDER BY (Morton-curve clustering + stats "
        "tightening for data skipping)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_optimize_zorder_clusters_both_dimensions",
    ),
    (
        "Real raster codecs (netpbm P5/P6 + BMP decode/resample/"
        "re-encode beyond the externally-gated PGM path)",
        "ecommerce_lakehouse_platform_spark/multimodal/binary.py",
        "tests/test_multimodal.py::test_real_resize_bmp_payloads",
    ),
    (
        "Column mapping mode=name (metadata-only RENAME/DROP COLUMN, "
        "physical-name staging, stats translation, mapped DML)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_column_mapping_rename_and_drop_without_rewrite",
    ),
    (
        "Bloom filter file index (point-lookup pruning on unordered "
        "high-cardinality columns; add-action tags, CDF-invisible)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_bloom_index_point_lookup_pruning",
    ),
    (
        "VACUUM retention window (RETAIN N: time travel inside the "
        "window survives reclamation)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_vacuum_retention_window",
    ),
    (
        "IVF×PQ composition (pq_adc_topk_ivf: trained coarse buckets "
        "restrict candidates, ADC scores the compressed domain; "
        "bit-identical to plain ADC at full probe width)",
        "ecommerce_lakehouse_platform_spark/operators/kmeans.py",
        "tests/test_kmeans.py::test_pq_adc_topk_ivf_composition",
    ),
    (
        "Broadcast Bloom filter as a plan literal + zero-join "
        "benchmark decontamination (no-false-negative guarantee, "
        "shuffle-free and join-free corpus pass, plan-asserted)",
        "ecommerce_lakehouse_platform_spark/operators/bloom_filter.py",
        "tests/test_bloom_filter.py::"
        "test_bloom_decontaminate_no_false_negatives",
    ),
    (
        "Streaming CDF source: format('minidelta_cdf') via Spark 4's "
        "Python DataSource API — log versions as offsets, "
        "checkpointed restart resumes at the next commit, DV-aware",
        "ecommerce_lakehouse_platform_spark/streaming/cdf_source.py",
        "tests/test_cdf_stream_source.py::"
        "test_cdf_stream_equals_batch_changes_with_dvs",
    ),
    (
        "Identity columns (GENERATED ALWAYS / BY DEFAULT AS IDENTITY: "
        "watermark in schema metadata, sparse map-side block "
        "assignment; r12: BOTH the assigned and the BY DEFAULT "
        "explicit-value watermark derive from the staged files' "
        "footer stats in the same atomic commit (only-advance; "
        "explicit NULLs legal), ALWAYS rejects explicit values, "
        "race surfaces instead of minting duplicate ids; externally "
        "gated by ext_delta_identity since r12)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_identity_column_assignment_and_guards",
    ),
    (
        "V2 checkpoints (manifest + content-hash-named sidecars under "
        "_delta_log/_sidecars, pow2-hysteresis path-hash buckets; "
        "unchanged buckets reuse their sidecar byte-for-byte, so "
        "checkpoint write cost is the changed slice, not the table; "
        "v1 chaining, expiry GC, pyarrow-only reads)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::"
        "test_v2_checkpoint_roundtrip_and_sidecar_reuse",
    ),
    (
        "Optimistic concurrency control (the protocol's conflict "
        "matrix: losers REBASE past logically disjoint winners — "
        "blind appends, DML/OPTIMIZE over untouched files — and "
        "raise the typed Delta taxonomy otherwise: ConcurrentAppend "
        "(serializable only), ConcurrentDeleteRead, "
        "ConcurrentDeleteDelete, MetadataChanged, ProtocolChanged, "
        "ConcurrentTransaction; retries re-inject row-id watermarks "
        "and in-commit timestamps against the winner's chain; r12: "
        "a protocol action restating exactly the loser's snapshot "
        "gates rebases instead of raising, and DV commits emit the "
        "3/7 upgrade only when the table is not already there)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_concurrency.py::"
        "test_dml_rebases_past_disjoint_append",
    ),
    (
        "Table features (PROTOCOL.md 'Table Features', r12: protocol "
        "upgrades to reader 3 / writer 7 carry CUMULATIVE "
        "readerFeatures/writerFeatures name lists — every feature in "
        "use enumerated, including legacy-version ones; feature "
        "enables (type widening, v2 checkpoints, in-commit "
        "timestamps, identity columns, column defaults, row "
        "tracking, column mapping, DV DML) each ride their enabling "
        "commit; readers refuse unknown readerFeatures loudly, "
        "writers refuse to commit under unknown writerFeatures while "
        "reads keep working; lists survive checkpoint/expiry replay "
        "and the streaming sources' schema resolution; a winner "
        "restating versions AND lists exactly still rebases "
        "concurrent losers; delta.appendOnly enforced via "
        "set/unset_table_property — overwrite/DELETE/UPDATE/MERGE "
        "refuse, appends and OPTIMIZE pass)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_table_features.py::"
        "test_feature_enables_upgrade_cumulatively",
    ),
    (
        "Type widening (protocol 'Type Widening': merge-schema "
        "appends accept the widening lattice, delta.typeChanges "
        "provenance per column, narrow-era files upcast in ONE "
        "explicit-schema scan — no rewrite, no per-era branches; "
        "narrower batches upcast on write; composes with DML, CDF, "
        "OPTIMIZE, row tracking, stats skipping, checkpoint/expiry, "
        "and full-history streaming replays; externally gated by "
        "ext_delta_widened_read since r12)",
        "ecommerce_lakehouse_platform_spark/sources/deltalog/",
        "tests/test_deltalog.py::test_type_widening_append_read_dml_cdf",
    ),
]

FAMILIES = [
    ("op_", "Reference core operators"),
    ("dq_", "Data-quality gates"),
    ("gold_", "Gold aggregate models"),
    ("dash_", "BI dashboard queries"),
    ("stream_", "Structured Streaming"),
    ("ext_delta_", "Table format (mini Delta log)"),
    ("ext_dedup_", "Deduplication"),
    ("ext_dup_", "Duplicated-span analysis"),
    ("ext_media_", "Multimodal"),
    ("ext_text_", "Text analysis"),
    ("ext_bpe_", "Tokenizer training"),
    ("ext_sample_", "Sampling"),
    ("ext_", "Extensions (relational, ML, graph, curation)"),
]


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    m = re.match(r"(.+?[.!?])(\s|$)", text)
    return (m.group(1) if m else text)[:220]


def main() -> None:
    from ecommerce_lakehouse_platform_spark import registry

    groups: dict[str, list[str]] = {title: [] for _, title in FAMILIES}
    for name, fn in registry.QUERIES.items():
        for prefix, title in FAMILIES:
            if name.startswith(prefix):
                oracle = "oracle" if name in registry.ORACLES else "rows-only"
                groups[title].append(
                    f"| `{name}` | {oracle} | {first_sentence(fn.__doc__)} |"
                )
                break
    out = sys.stdout
    print("# Registry inventory", file=out)
    print(file=out)
    print(
        f"{len(registry.QUERIES)} registered queries, "
        f"{len(registry.ORACLES)} with DuckDB oracles. Generated by "
        "`python tools/registry_inventory.py > REGISTRY.md`; "
        "`tests/test_registry_inventory.py` pins the key set.",
        file=out,
    )
    for _, title in FAMILIES:
        rows = sorted(groups[title])
        if not rows:
            continue
        print(f"\n## {title} ({len(rows)})\n", file=out)
        print("| query | check | description |", file=out)
        print("|---|---|---|", file=out)
        for row in rows:
            print(row, file=out)
    print(
        f"\n## Pytest-only library surface ({len(PYTEST_ONLY)})\n",
        file=out,
    )
    print(
        "The registry sits at its 150 = 50-slot × 3-round staleness "
        "capacity (see the capacity invariant in registry.py), so "
        "these operators carry NO external driver row by design — "
        "each is proven by the pytest anchor listed, which runs in "
        "the standard suite. Not externally gated ≠ not checked.",
        file=out,
    )
    print(file=out)
    print("| capability | implementation | pytest anchor |", file=out)
    print("|---|---|---|", file=out)
    for cap, mod, anchor in PYTEST_ONLY:
        print(f"| {cap} | `{mod}` | `{anchor}` |", file=out)


if __name__ == "__main__":
    main()
