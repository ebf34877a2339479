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

Run once; the output (3 JSON commits + 4 parquet parts, ~6 KB) is
committed. History:
  v0  WRITE (overwrite): part-00000 (k=0,1), part-00001 (k=2,3)
  v1  WRITE (append, blind): part-00002 (k=4)
  v2  DELETE w/ rewrite: remove part-00001, add part-00003 (k=3 only)
Expected final relation: k ∈ {0,1,3,4}; v0 relation: k ∈ {0,1,2,3}.

Out of scope (documented, not silently skipped): real deletion-vector
sidecars (delta-spark stores RoaringBitmapArray files under a
z-ordered path — a different physical format from the minidelta DV
sidecar) and real checkpoint parquet (column layout differences are
exactly what the interop test must not hand-wave).
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
    print(f"wrote {ROOT}: {len(PARTS)} parts + 3 commits")


if __name__ == "__main__":
    main()
