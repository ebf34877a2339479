"""Generate tests/fixtures/real_delta_table — a tiny Delta table whose
``_delta_log`` is hand-assembled in the PUBLIC delta-spark on-disk
format (the Delta Transaction Log Protocol), NOT written by this
repo's MiniDeltaTable.

Purpose: reader interop without the delta-spark runtime (absent from
this sandbox). The commit JSONs mirror what delta-spark 3.x emits —
commitInfo with engineInfo/isBlindAppend/txnId, adds carrying
partitionValues + stats (numRecords/minValues/maxValues/nullCount),
removes carrying extendedFileMetadata — including fields MiniDeltaTable
itself never writes, so the test proves the reader parses a FOREIGN
log, not its own dialect. tests/test_formats.py asserts snapshot,
time travel, and the CDF fold replay it byte-for-byte.

Run once; the output is committed. Fixture 1 (real_delta_table):
  v0  WRITE (overwrite): part-00000 (k=0,1), part-00001 (k=2,3)
  v1  WRITE (append, blind): part-00002 (k=4)
  v2  DELETE w/ rewrite: remove part-00001, add part-00003 (k=3 only)
  + a CLASSIC CHECKPOINT at v2 in the delta-spark parquet dialect
    (one row per action; txn/add/remove/metaData/protocol struct
    columns — including a remove TOMBSTONE row and add fields the
    minidelta writer never emits) and the `_last_checkpoint` pointer,
    so checkpoint-seeded replay of a FOREIGN checkpoint is exercised.
Expected final relation: k ∈ {0,1,3,4}; v0 relation: k ∈ {0,1,2,3}.

Fixture 2 (real_delta_partitioned): a hive-partitioned table in the
same dialect — partitionValues in the log, hive-encoded paths
(`part_col=a%20b/...` for a value with a space), one commit — so
partition-column restoration from a foreign log is exercised.

Out of scope (documented, not silently skipped): real deletion-vector
sidecars (delta-spark stores RoaringBitmapArray files under a
z-ordered path — a different physical format from the minidelta DV
sidecar).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "real_delta_table",
)

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {},
            },
            {
                "name": "s",
                "type": "string",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
)

# delta-spark part-file naming: part-<task>-<uuid>-c000.snappy.parquet
PARTS = {
    "part-00000-8b0086f9-7a53-4a35-a199-10a80a59d9f1-c000.snappy.parquet": [
        (0, "alpha"),
        (1, "bravo"),
    ],
    "part-00001-2c1d22f3-9a41-4c5e-8f0e-5a11c2b2ce44-c000.snappy.parquet": [
        (2, "charlie"),
        (3, "delta"),
    ],
    "part-00002-6e8edc41-30c2-4b63-a5bc-90a1a6a3c9d2-c000.snappy.parquet": [
        (4, "echo"),
    ],
    "part-00003-f3a6a9de-5a3f-4df1-bb5b-7e2c4a7ad18b-c000.snappy.parquet": [
        (3, "delta"),
    ],
}


def _write_part(name: str, rows) -> int:
    ks = [r[0] for r in rows]
    ss = [r[1] for r in rows]
    table = pa.table({"k": pa.array(ks, pa.int64()), "s": pa.array(ss)})
    dst = os.path.join(ROOT, name)
    pq.write_table(table, dst, compression="snappy")
    return os.path.getsize(dst)


def _stats(rows) -> str:
    ks = [r[0] for r in rows]
    ss = [r[1] for r in rows]
    return json.dumps(
        {
            "numRecords": len(rows),
            "minValues": {"k": min(ks), "s": min(ss)},
            "maxValues": {"k": max(ks), "s": max(ss)},
            "nullCount": {"k": 0, "s": 0},
        }
    )


def _add(name: str, size: int, rows, ts: int) -> dict:
    return {
        "add": {
            "path": name,
            "partitionValues": {},
            "size": size,
            "modificationTime": ts,
            "dataChange": True,
            "stats": _stats(rows),
        }
    }


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    log = os.path.join(ROOT, "_delta_log")
    os.makedirs(log)
    sizes = {n: _write_part(n, rows) for n, rows in PARTS.items()}
    names = list(PARTS)

    t0, t1, t2 = 1700000000000, 1700000060000, 1700000120000
    v0 = [
        {
            "commitInfo": {
                "timestamp": t0,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Overwrite",
                    "partitionBy": "[]",
                },
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {
                    "numFiles": "2",
                    "numOutputRows": "4",
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "f8274232-54a4-4bc1-9dfa-b1a1f4f11dc7",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "d9c15b2e-9c3a-4f51-8b20-2b2ad3c3f7ab",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": SCHEMA_STRING,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": t0,
            }
        },
        _add(names[0], sizes[names[0]], PARTS[names[0]], t0),
        _add(names[1], sizes[names[1]], PARTS[names[1]], t0),
    ]
    v1 = [
        {
            "commitInfo": {
                "timestamp": t1,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Append",
                    "partitionBy": "[]",
                },
                "readVersion": 0,
                "isolationLevel": "Serializable",
                "isBlindAppend": True,
                "operationMetrics": {
                    "numFiles": "1",
                    "numOutputRows": "1",
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "0d2c7c5b-7776-4f80-9f0c-8e2a3b9a61f2",
            }
        },
        _add(names[2], sizes[names[2]], PARTS[names[2]], t1),
    ]
    v2 = [
        {
            "commitInfo": {
                "timestamp": t2,
                "operation": "DELETE",
                "operationParameters": {
                    "predicate": '["(k = 2L)"]',
                },
                "readVersion": 1,
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "operationMetrics": {
                    "numRemovedFiles": "1",
                    "numAddedFiles": "1",
                    "numDeletedRows": "1",
                    "numCopiedRows": "1",
                },
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "6a7e38cb-31b1-4e0c-9c3e-dc2a7c10b9aa",
            }
        },
        {
            "remove": {
                "path": names[1],
                "deletionTimestamp": t2,
                "dataChange": True,
                "extendedFileMetadata": True,
                "partitionValues": {},
                "size": sizes[names[1]],
            }
        },
        _add(names[3], sizes[names[3]], PARTS[names[3]], t2),
    ]
    for v, actions in enumerate([v0, v1, v2]):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    _write_classic_checkpoint(log, names, sizes, t2)
    print(f"wrote {ROOT}: {len(PARTS)} parts + 3 commits + checkpoint")
    _write_partitioned_fixture()


def _write_classic_checkpoint(
    log: str, names, sizes, ts: int
) -> None:
    """00000000000000000002.checkpoint.parquet in the delta-spark
    classic single-file dialect: one row per consolidated action,
    non-matching struct columns null. Includes a remove TOMBSTONE row
    (retained for vacuum in the real layout; state replay must skip
    it) and add fields (stats, tags, modificationTime) the minidelta
    writer's own checkpoints do not carry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            (
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                        ("tags", pa.map_(pa.string(), pa.string())),
                    ]
                ),
            ),
            (
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("extendedFileMetadata", pa.bool_()),
                        ("size", pa.int64()),
                    ]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("name", pa.string()),
                        ("description", pa.string()),
                        ("format", pa.struct([
                            ("provider", pa.string()),
                            ("options", pa.map_(pa.string(), pa.string())),
                        ])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
        ]
    )
    active = [names[0], names[2], names[3]]  # state as of v2
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "d9c15b2e-9c3a-4f51-8b20-2b2ad3c3f7ab",
                "name": None,
                "description": None,
                "format": {"provider": "parquet", "options": []},
                "schemaString": SCHEMA_STRING,
                "partitionColumns": [],
                "configuration": [],
                "createdTime": 1700000000000,
            }
        },
        # the real writer checkpoints the streaming txn ledger too
        {"txn": {"appId": "some-stream", "version": 4,
                 "lastUpdated": ts}},
        # tombstone of the v2-removed file: state replay must SKIP it
        {
            "remove": {
                "path": names[1],
                "deletionTimestamp": ts,
                "dataChange": True,
                "extendedFileMetadata": True,
                "size": sizes[names[1]],
            }
        },
    ] + [
        {
            "add": {
                "path": n,
                "partitionValues": [],
                "size": sizes[n],
                "modificationTime": ts,
                "dataChange": True,
                "stats": _stats(PARTS[n]),
                "tags": [],
            }
        }
        for n in active
    ]
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(
        table, os.path.join(log, f"{2:020d}.checkpoint.parquet")
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 2, "size": len(rows)}, fh)


PART_ROOT = os.path.join(
    os.path.dirname(ROOT), "real_delta_partitioned"
)

PART_SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {
                "name": "part_col",
                "type": "string",
                "nullable": True,
                "metadata": {},
            },
        ],
    }
)


def _write_partitioned_fixture() -> None:
    """Hive-partitioned foreign table: partition values live in the
    LOG's partitionValues (data files do NOT store the column — the
    real layout) and the paths are hive-encoded, including a value
    with a space."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(PART_ROOT, ignore_errors=True)
    log = os.path.join(PART_ROOT, "_delta_log")
    os.makedirs(log)
    parts = {
        (
            "part_col=red/part-00000-5b9ae5f2-0c3e-47a8-9e1a-"
            "7e92f7b1a001-c000.snappy.parquet"
        ): ("red", [10, 11]),
        (
            "part_col=a%20b/part-00000-9d7c2f10-6c1b-4f23-8c4d-"
            "1a2b3c4d5e6f-c000.snappy.parquet"
        ): ("a b", [20]),
    }
    adds = []
    for rel, (pv, ks) in parts.items():
        dst = os.path.join(PART_ROOT, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}), dst,
            compression="snappy",
        )
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"part_col": pv},
                    "size": os.path.getsize(dst),
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": len(ks),
                            "minValues": {"k": min(ks)},
                            "maxValues": {"k": max(ks)},
                            "nullCount": {"k": 0},
                        }
                    ),
                }
            }
        )
    actions = [
        {
            "commitInfo": {
                "timestamp": 1700000000000,
                "operation": "WRITE",
                "operationParameters": {
                    "mode": "Overwrite",
                    "partitionBy": '["part_col"]',
                },
                "isolationLevel": "Serializable",
                "isBlindAppend": False,
                "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
                "txnId": "9b1deb4d-3b7d-4bad-9bdd-2b0d7b3dcb6d",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "7e4b2f60-52c1-4b01-9c3e-0d7a8e6f1a2b",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": PART_SCHEMA_STRING,
                "partitionColumns": ["part_col"],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
    ] + adds
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    print(f"wrote {PART_ROOT}: {len(parts)} parts + 1 commit")


if __name__ == "__main__":
    main()
