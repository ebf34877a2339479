"""Optimistic concurrency control (sources/deltalog.py): lost
put-if-absent races resolve with the public Delta protocol's conflict
rules — rebase when the winner is logically disjoint, raise the
matching typed conflict when it is not, under both isolation levels
(write_serializable default, serializable strict).

Races are simulated deterministically by wrapping ``_commit`` to let
a rival land the contested version first — the loser's commit then
hits the put-if-absent failure exactly as a real concurrent writer
would.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.sources.deltalog import (
    ConcurrentAppendError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    ConcurrentTransactionError,
    MetadataChangedError,
    MiniDeltaTable,
)


@pytest.fixture()
def base(spark):
    d = tempfile.mkdtemp(prefix="occ_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 2).alias("v")
    )


def _race(t, rival_move):
    """Arrange for ``rival_move()`` to commit first: the next _commit
    call on ``t`` fires it once, then proceeds (and loses)."""
    orig = t._commit
    state = {"fired": False}

    def racing(version, actions):
        if not state["fired"]:
            state["fired"] = True
            rival_move()
        orig(version, actions)

    t._commit = racing


def _two_file_table(spark, base):
    """v0 holds keys 0..19 in file A, v1 holds keys 20..39 in file B —
    disjoint files with known contents, so predicates map to files."""
    t = MiniDeltaTable(spark, os.path.join(base, "t"))
    t.write(_df(spark, 0, 20).coalesce(1))
    t.write(_df(spark, 20, 40).coalesce(1), mode="append")
    return t


def test_dml_rebases_past_disjoint_append(spark, base):
    """DELETE losing to a blind append rebases (write_serializable
    admits appends against DML — the protocol's documented anomaly);
    both effects land in consecutive versions."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.write(_df(spark, 100, 105), mode="append"))
    v = t.delete(F.col("k") == "3")
    assert v == 3  # rebased past the rival's v2
    got = t.read()
    assert got.count() == 44  # 40 - 1 + 5
    assert got.filter(F.col("k") == "3").count() == 0
    assert got.filter(F.col("k") == "100").count() == 1


def test_dml_append_conflicts_under_serializable(spark, base):
    """The same race under isolation='serializable' surfaces
    ConcurrentAppendError: the appended rows could have matched the
    predicate this transaction read."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.write(_df(spark, 100, 105), mode="append"))
    with pytest.raises(ConcurrentAppendError):
        t.delete(F.col("k") == "3", isolation="serializable")
    # nothing committed by the loser
    assert t.read().count() == 45
    assert t.read().filter(F.col("k") == "3").count() == 1


def test_delete_delete_conflict_same_file(spark, base):
    """Two DELETEs whose touched-file sets intersect: the loser gets
    ConcurrentDeleteDeleteError, never a silent double-remove."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.delete(F.col("k") == "5"))  # same file A
    with pytest.raises(ConcurrentDeleteDeleteError):
        t.delete(F.col("k") == "3")
    assert t.read().filter(F.col("k") == "5").count() == 0  # winner's
    assert t.read().filter(F.col("k") == "3").count() == 1  # loser's not


def test_delete_rebases_past_disjoint_delete(spark, base):
    """DELETEs touching DISJOINT files compose: the loser rebases and
    both deletes land."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.delete(F.col("k") == "25"))  # file B only
    v = t.delete(F.col("k") == "3")  # file A only
    assert v == 3
    got = t.read()
    assert got.count() == 38
    assert got.filter(F.col("k").isin("3", "25")).count() == 0


def test_metadata_change_conflicts_dml(spark, base):
    """A winner that changes table metadata (here: adding a CHECK
    constraint — config-only, no protocol action) invalidates any
    in-flight DML plan: MetadataChangedError. A winner that enables a
    TABLE FEATURE (type widening) now also upgrades the protocol
    (r12), so the loser surfaces the stronger ProtocolChangedError."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.set_constraint("vnn", "v IS NOT NULL"))
    with pytest.raises(MetadataChangedError):
        t.delete(F.col("k") == "3")

    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        ProtocolChangedError,
    )

    t2 = _two_file_table(spark, os.path.join(base, "b"))
    rival2 = MiniDeltaTable(spark, t2.path)
    _race(t2, lambda: rival2.enable_type_widening())
    with pytest.raises(ProtocolChangedError):
        t2.delete(F.col("k") == "3")


def test_dv_delete_conflict_and_rebase(spark, base):
    """Deletion-vector DML obeys the same matrix: a DV delete whose
    touched file the winner also touched conflicts (the DV's position
    list is against a file that no longer exists as read); DV deletes
    over disjoint files rebase."""
    t = _two_file_table(spark, base)
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.delete(F.col("k") == "5"))  # rewrites file A
    with pytest.raises(
        (ConcurrentDeleteDeleteError, ConcurrentDeleteReadError)
    ):
        t.delete(F.col("k") == "3", use_dv=True)  # DV against file A

    t2 = _two_file_table(spark, os.path.join(base, "b"))
    rival2 = MiniDeltaTable(spark, t2.path)
    _race(t2, lambda: rival2.delete(F.col("k") == "25"))  # file B
    v = t2.delete(F.col("k") == "3", use_dv=True)  # DV on file A
    assert v == 3
    got = t2.read()
    assert got.count() == 38
    assert got.filter(F.col("k").isin("3", "25")).count() == 0


def test_dml_rebases_past_disjoint_dv_winner(spark, base):
    """A DV-based winner on an ALREADY reader-3/writer-7 table must
    not block disjoint losers: the first DV delete upgrades the
    protocol once; later DV commits emit NO protocol action (nothing
    to upgrade), so a logically disjoint copy-on-write DELETE losing
    the race REBASES per the conflict matrix instead of raising a
    spurious ProtocolChangedError."""
    t = _two_file_table(spark, base)
    assert t.delete(F.col("k") == "0", use_dv=True) == 2  # → 3/7
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.delete(F.col("k") == "25", use_dv=True))  # B
    v = t.delete(F.col("k") == "3")  # copy-on-write, file A only
    assert v == 4  # rebased past the rival's v3
    # the already-upgraded rival restated no protocol action
    assert not any("protocol" in a for a in t._read_actions(3))
    got = t.read()
    assert got.count() == 37
    assert got.filter(F.col("k").isin("0", "3", "25")).count() == 0


def test_foreign_protocol_restate_rebases_but_upgrade_raises(spark, base):
    """Belt to the emit-only-on-upgrade braces: a FOREIGN writer that
    restates the exact protocol gates the loser's snapshot already
    held does not invalidate anything — the disjoint loser still
    rebases; an actual upgrade keeps raising ProtocolChangedError."""
    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        ProtocolChangedError,
    )
    import json as _json

    t = _two_file_table(spark, base)
    assert t.delete(F.col("k") == "0", use_dv=True) == 2  # → 3/7
    rival = MiniDeltaTable(spark, t.path)

    def append_with_restate():
        v = rival.write(_df(spark, 100, 103), mode="append")
        path = rival._version_file(v)
        with open(path, "a", encoding="utf-8") as fh:
            fh.write(
                _json.dumps(
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            # must restate the FEATURE LISTS too —
                            # a lists-dropping "restate" is a real
                            # protocol change and still conflicts
                            "readerFeatures": ["deletionVectors"],
                            "writerFeatures": ["deletionVectors"],
                        }
                    },
                    separators=(",", ":"),
                )
                + "\n"
            )

    _race(t, append_with_restate)
    v = t.delete(F.col("k") == "3")
    assert v == 4  # rebased past the restating winner
    assert t.read().count() == 41  # 40 - 1(dv) + 3 - 1

    # a GENUINE upgrade still conflicts, even when file-disjoint:
    # first-DV-delete winner moves 1/2 → 3/7 under the loser
    t2 = _two_file_table(spark, os.path.join(base, "b"))
    rival2 = MiniDeltaTable(spark, t2.path)
    _race(t2, lambda: rival2.delete(F.col("k") == "25", use_dv=True))
    with pytest.raises(ProtocolChangedError):
        t2.delete(F.col("k") == "3")  # file A only — still raises


def test_optimize_rebases_past_append(spark, base):
    """Compaction losing to an append rebases; the appended file is
    untouched and stays active alongside the compacted layout."""
    t = MiniDeltaTable(spark, os.path.join(base, "t"))
    t.write(_df(spark, 0, 30).repartition(4))
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.write(_df(spark, 100, 110), mode="append"))
    v = t.optimize(max_file_bytes=1 << 30)
    assert v == 2  # rebased past the rival's v1
    got = t.read()
    assert got.count() == 40
    assert got.filter(F.col("k") == "105").count() == 1


def test_optimize_conflicts_when_source_compacted_away(spark, base):
    """Two overlapping compactions: the loser's source files are gone
    — typed conflict, not a corrupt double-compaction."""
    t = MiniDeltaTable(spark, os.path.join(base, "t"))
    t.write(_df(spark, 0, 30).repartition(4))
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.optimize(max_file_bytes=1 << 30))
    with pytest.raises(
        (ConcurrentDeleteDeleteError, ConcurrentDeleteReadError)
    ):
        t.optimize(max_file_bytes=1 << 30)
    assert t.read().count() == 30  # winner's layout intact


def test_txn_ledger_conflict_on_append(spark, base):
    """An idempotent-sink append (txn action) losing to a winner that
    advanced the SAME app id's ledger must surface
    ConcurrentTransactionError — rebasing would double-apply the
    batch the winner already recorded."""
    t = MiniDeltaTable(spark, os.path.join(base, "t"))
    t.write(_df(spark, 0, 10))
    rival = MiniDeltaTable(spark, t.path)
    _race(
        t,
        lambda: rival.write(
            _df(spark, 50, 55), mode="append", txn=("sink-app", 7)
        ),
    )
    with pytest.raises(ConcurrentTransactionError):
        t.write(_df(spark, 60, 65), mode="append", txn=("sink-app", 7))
    # a DIFFERENT app id rebases fine
    t2 = MiniDeltaTable(spark, t.path)
    _race(
        t2,
        lambda: rival.write(
            _df(spark, 70, 75), mode="append", txn=("sink-app", 8)
        ),
    )
    v = t2.write(_df(spark, 80, 85), mode="append", txn=("other-app", 1))
    assert v == t2.snapshot().version
    assert t2.read().count() == 25


def test_row_ids_unique_across_racing_tracked_appends(spark, base):
    """A rebased append on a row-tracked table recomputes its row-id
    assignment against the WINNER's high watermark (each retry
    re-injects from a pristine action list) — ids never overlap."""
    t = MiniDeltaTable(spark, os.path.join(base, "t"))
    t.write(_df(spark, 0, 10))
    t.enable_row_tracking()
    rival = MiniDeltaTable(spark, t.path)
    _race(t, lambda: rival.write(_df(spark, 20, 30), mode="append"))
    t.write(_df(spark, 40, 50), mode="append")
    got = t.read(with_row_ids=True)
    ids = [r["_row_id"] for r in got.collect()]
    assert len(ids) == 30
    assert sorted(ids) == list(range(30)), "dense, no overlap"
