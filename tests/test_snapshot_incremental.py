"""Incremental snapshot publishes via per-partition pointer manifests
(VERDICT r13 item 2): atomic versions AND O(batch) refresh together.

The whole-table snapshot layer (test_layout.py) rewrites the full table
per version; the dynamic-partition incremental writer (test_overwrite)
refreshes in place with no versioning. The pointer-manifest layer gives
both: each publish writes only the batch's partitions into a new
snapshot dir and re-points their manifest entries, so untouched
partitions are carried forward by POINTER -- never copied, never
deleted while a kept manifest references them.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_upc_syllabus_spark.sources.layout import (
    publish_snapshot,
    publish_snapshot_incremental,
    read_current_snapshot,
    vacuum_snapshots,
)


def _batch(spark, period: str, n: int, start: int = 0):
    return spark.range(start, start + n).select(
        F.col("id").alias("v"), F.lit(period).alias("period")
    )


def test_incremental_publish_roundtrip_and_obatch_layout(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # first publish establishes the partition column (full write)
    p0 = publish_snapshot_incremental(
        _batch(spark, "A", 5).union(_batch(spark, "B", 3, 100)), t, "period"
    )
    assert p0.endswith("snapshot-00000000")
    assert read_current_snapshot(spark, t).count() == 8

    # refresh ONLY period B: the new snapshot dir holds B and nothing else
    p1 = publish_snapshot_incremental(_batch(spark, "B", 7, 200), t)
    parts_written = [d for d in os.listdir(p1) if "=" in d]
    assert parts_written == ["period=B"]  # O(batch): A was not rewritten

    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "A").count() == 5  # carried by pointer
    assert out.filter(F.col("period") == "B").count() == 7  # the refresh
    # A's rows physically still come from snapshot 0
    manifest = json.load(open(os.path.join(t, "manifest-00000001.json")))
    assert manifest["partitions"]["period=A"] == "snapshot-00000000"
    assert manifest["partitions"]["period=B"] == "snapshot-00000001"


def test_pinned_reader_survives_incremental_publishes(spark, tmp_path):
    """The racing-reader property, re-proven on the pointer path: a
    reader pinned to version N keeps N's exact rows after N+1
    publishes, because a publish deletes nothing."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 100), t, "period")
    pinned = read_current_snapshot(spark, t)
    assert pinned.count() == 100
    publish_snapshot_incremental(_batch(spark, "A", 7), t)
    assert pinned.count() == 100  # unharmed
    assert read_current_snapshot(spark, t).count() == 7


def test_killed_incremental_publish_is_invisible_and_reclaimable(spark, tmp_path):
    """A publish killed between any step and the _CURRENT flip leaves
    only an orphan snapshot dir + manifest file readers never see."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 5), t, "period")
    # simulate the kill: claimed dir + data + manifest written, no flip
    os.makedirs(os.path.join(t, "snapshot-00000001"))
    _batch(spark, "B", 9).write.mode("overwrite").partitionBy("period").parquet(
        os.path.join(t, "snapshot-00000001")
    )
    with open(os.path.join(t, "manifest-00000001.json"), "w") as fh:
        json.dump(
            {
                "format": "partition-pointers-v1",
                "version": 1,
                "partition_col": "period",
                "partitions": {"period=B": "snapshot-00000001"},
            },
            fh,
        )
    assert read_current_snapshot(spark, t).count() == 5  # orphan invisible
    # next publish claims PAST the orphan
    p = publish_snapshot_incremental(_batch(spark, "A", 2), t)
    assert p.endswith("snapshot-00000002")
    assert read_current_snapshot(spark, t).count() == 2
    # vacuum reclaims the orphan dir AND its orphan manifest
    deleted = vacuum_snapshots(t, keep=1)
    assert "snapshot-00000001" in deleted
    assert not os.path.exists(os.path.join(t, "manifest-00000001.json"))


def test_vacuum_keeps_pointer_referenced_old_snapshots(spark, tmp_path):
    """The property the pointer layer changes about vacuum: a snapshot
    dir OUTSIDE the keep window stays alive as long as a kept manifest
    still points a partition at it."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 5).union(_batch(spark, "B", 3, 50)), t, "period"
    )
    for i in range(4):  # four refreshes of B only; A stays in snapshot 0
        publish_snapshot_incremental(_batch(spark, "B", i + 1, 100 * i), t)
    deleted = vacuum_snapshots(t, keep=1)
    # snapshot 0 is 5 versions old but still carries partition A: kept
    assert "snapshot-00000000" not in deleted
    # intermediate B-only snapshots are unreferenced: reclaimed
    assert {"snapshot-00000001", "snapshot-00000002", "snapshot-00000003"} <= set(
        deleted
    )
    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "A").count() == 5
    assert out.filter(F.col("period") == "B").count() == 4


def test_layouts_refuse_to_mix_loudly(spark, tmp_path):
    t1 = str(tmp_path / "whole")
    publish_snapshot(spark.range(3).withColumnRenamed("id", "v"), t1)
    with pytest.raises(ValueError, match="whole-table snapshot table"):
        publish_snapshot_incremental(_batch(spark, "A", 1), t1)

    t2 = str(tmp_path / "pointer")
    publish_snapshot_incremental(_batch(spark, "A", 1), t2, "period")
    with pytest.raises(ValueError, match="partition-pointer table"):
        publish_snapshot(spark.range(3).withColumnRenamed("id", "v"), t2)


def test_first_publish_requires_partition_col_and_later_must_agree(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="must name partition_col"):
        publish_snapshot_incremental(_batch(spark, "A", 1), t)
    publish_snapshot_incremental(_batch(spark, "A", 1), t, "period")
    with pytest.raises(ValueError, match="contradicts"):
        publish_snapshot_incremental(_batch(spark, "A", 1), t, "v")


def test_partition_values_stay_strings_never_inferred(spark, tmp_path):
    """Same posture as read_courses: '01' must read back as the string
    '01', not the int 1 -- the pointer read pins the partition column
    to string with an explicit schema instead of letting dir-name type
    inference re-type it (r12 probe)."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "01", 3), t, "period")
    rows = read_current_snapshot(spark, t).select("period").distinct().collect()
    assert [r["period"] for r in rows] == ["01"]
    assert dict(read_current_snapshot(spark, t).dtypes)["period"] == "string"


def test_schema_evolution_bridges_across_snapshots(spark, tmp_path):
    """A column added by a later batch reads as NULL on partitions still
    carried by older snapshots (mergeSchema semantics via unionByName
    allowMissingColumns)."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 2), t, "period")
    evolved = _batch(spark, "B", 2).withColumn("credits", F.lit(3))
    publish_snapshot_incremental(evolved, t)
    out = read_current_snapshot(spark, t)
    assert "credits" in out.columns
    assert out.filter(F.col("period") == "A").filter(
        F.col("credits").isNull()
    ).count() == 2
    assert out.filter(F.col("period") == "B").filter(
        F.col("credits") == 3
    ).count() == 2


def test_verified_incremental_publish_passes_clean(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 4), t, "period", verify=True)
    assert read_current_snapshot(spark, t).count() == 4


def test_empty_batch_publish_is_a_noop_version(spark, tmp_path):
    """Degenerate-sweep ethos: a zero-row batch publishes a new version
    whose pointer map is unchanged -- readers see identical data, and
    nothing is lost or invented."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 5), t, "period")
    empty = _batch(spark, "X", 1).filter(F.lit(False))
    p = publish_snapshot_incremental(empty, t)
    assert p.endswith("snapshot-00000001")
    out = read_current_snapshot(spark, t)
    assert out.count() == 5
    manifest = json.load(open(os.path.join(t, "manifest-00000001.json")))
    assert manifest["partitions"] == {"period=A": "snapshot-00000000"}


def test_first_publish_of_zero_rows_reads_loud_not_silent(spark, tmp_path):
    """A pointer table whose only version maps zero partitions has no
    schema to answer with -- the read refuses to guess instead of
    returning a silent empty frame of invented shape."""
    t = str(tmp_path / "tbl")
    empty = _batch(spark, "X", 1).filter(F.lit(False))
    publish_snapshot_incremental(empty, t, "period")
    with pytest.raises(ValueError, match="zero partitions"):
        read_current_snapshot(spark, t)


def test_null_and_escaped_partition_values_roundtrip(spark, tmp_path):
    """The r12 partition-values axis on the pointer path: a NULL period
    lands in the Hive null-sentinel dir and reads back as NULL; a value
    Hive must %XX-escape ('a/b') roundtrips exactly because the RAW dir
    name is the pointer key (no decode/re-encode trip)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, None), (2, "a/b"), (3, "ok")], "v long, period string"
    )
    publish_snapshot_incremental(df, t, "period")
    manifest = json.load(open(os.path.join(t, "manifest-00000000.json")))
    assert "period=a%2Fb" in manifest["partitions"]
    assert "period=__HIVE_DEFAULT_PARTITION__" in manifest["partitions"]
    back = {
        r["v"]: r["period"] for r in read_current_snapshot(spark, t).collect()
    }
    assert back == {1: None, 2: "a/b", 3: "ok"}


def test_pointer_flip_refuses_rollback_past_concurrent_winner(spark, tmp_path):
    """Same conditional-flip contract as the whole-table layer, proven
    on the pointer path: a slower publisher whose data wrote while a
    faster one committed a higher version raises instead of rolling
    _CURRENT back (its snapshot and manifest stay vacuum-reclaimable
    orphans)."""
    import etl_upc_syllabus_spark.sources.layout as layout

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 3), t, "period")  # v0

    real_flip = layout._flip_manifest

    def delayed(table_dir, version, target, **kw):
        if version == 1:
            # the faster concurrent publisher COMMITS v2 first (flips
            # _CURRENT -- a bare claimed dir must NOT block, r14 storm
            # livelock fix: only a committed winner does)
            real_flip(table_dir, 2, "manifest-00000002.json")
        real_flip(table_dir, version, target)  # rollback guard fires first

    import pytest as _pytest

    try:
        layout._flip_manifest = delayed
        with _pytest.raises(RuntimeError, match="concurrent publish won"):
            publish_snapshot_incremental(_batch(spark, "A", 9), t)
    finally:
        layout._flip_manifest = real_flip
    # the loser never flipped: _CURRENT still carries the winner's commit
    with open(os.path.join(t, "_CURRENT")) as fh:
        assert fh.read().strip() == "manifest-00000002.json"


def test_vacuum_with_keep_larger_than_history_deletes_nothing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 2), t, "period")
    publish_snapshot_incremental(_batch(spark, "B", 2), t)
    assert vacuum_snapshots(t, keep=10) == []
    assert read_current_snapshot(spark, t).count() == 4


def test_stale_base_publisher_refuses_instead_of_reverting(
    spark, tmp_path, monkeypatch
):
    """Review r14 (the lost-update race): publisher B reads its base
    map, then publisher A commits a LOWER version while B's data
    writes. B holds the higher version number, so the rollback check
    alone would let B flip a manifest composed from the STALE base --
    silently reverting A's committed pointers. B must refuse loudly
    and leave its snapshot/manifest as orphans."""
    import etl_upc_syllabus_spark.sources.layout as layout

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 5).union(_batch(spark, "B", 3, 50)), t, "period"
    )  # v0

    real_claim = layout._claim_version
    fired = []

    def claim_after_concurrent_commit(table_dir, attempts=16):
        if not fired:
            fired.append(True)
            # A: a full concurrent publish commits (v1) AFTER our base
            # read (which already happened -- claim runs after it) ...
            publish_snapshot_incremental(_batch(spark, "A", 9), t)
        # ... and THEN we claim, getting the higher version v2
        return real_claim(table_dir, attempts)

    monkeypatch.setattr(layout, "_claim_version", claim_after_concurrent_commit)
    with pytest.raises(RuntimeError, match="moved _CURRENT"):
        publish_snapshot_incremental(_batch(spark, "B", 7, 100), t)
    monkeypatch.setattr(layout, "_claim_version", real_claim)

    # A's committed refresh survives; B's attempt left only orphans
    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "A").count() == 9
    assert out.filter(F.col("period") == "B").count() == 3
    # B's orphan manifest sits ABOVE current: vacuum conservatively
    # treats it as possibly-live (a publisher between manifest-write
    # and flip looks identical), so it -- and the snapshot it pins --
    # survive until a later SUCCESSFUL publish passes its version
    assert vacuum_snapshots(t, keep=1) == []
    publish_snapshot_incremental(_batch(spark, "B", 7, 100), t)  # v3
    deleted = vacuum_snapshots(t, keep=1)
    assert "snapshot-00000002" in deleted  # B's orphan snapshot reclaimed
    assert not os.path.exists(os.path.join(t, "manifest-00000002.json"))


def test_manifest_writes_are_atomic_and_tmp_reclaim_is_versioned(spark, tmp_path):
    """Review r14: the manifest is written tmp+os.replace, so a publish
    killed mid-json.dump leaves a .manifest-*.json.tmp, never a
    truncated manifest that breaks the next vacuum's kept-manifest
    parse. Vacuum reclaims tmp manifests at versions <= current and
    spares higher ones (a live publisher's)."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 2), t, "period")  # v0
    publish_snapshot_incremental(_batch(spark, "A", 3), t)  # v1
    # no stray tmp manifests after healthy publishes
    assert not [f for f in os.listdir(t) if f.endswith(".json.tmp")]

    dead = os.path.join(t, ".manifest-00000001.json.tmp")  # killed mid-write
    live = os.path.join(t, ".manifest-00000009.json.tmp")  # concurrent, live
    with open(dead, "w") as fh:
        fh.write('{"truncat')  # even truncated JSON is harmless here
    open(live, "w").close()
    vacuum_snapshots(t, keep=1)
    assert not os.path.exists(dead)
    assert os.path.exists(live)
    # and vacuum still parsed every KEPT manifest fine (no truncation
    # ever reaches a real manifest-*.json name)
    assert read_current_snapshot(spark, t).count() == 3


def test_threaded_publisher_storm_never_corrupts(spark, tmp_path):
    """Live concurrency pin (r14): 6 REAL threads race incremental
    publishes against one table, retrying on the loud losses
    (claim exhaustion / concurrent-winner / stale-base). Afterwards:
    no snapshot dir holds two writer UUIDs, _CURRENT resolves to a
    complete manifest, every partition's rows come from exactly one
    committed batch, and a reader pinned BEFORE the storm still
    returns its exact rows. The simulated interleavings above pin each
    race individually; this pins the composition under real timing."""
    import re
    import threading

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 3).union(_batch(spark, "B", 3, 500)), t, "period"
    )
    pinned = read_current_snapshot(spark, t)
    assert pinned.count() == 6

    errors = []
    committed = []  # (thread, period, n) of publishes that WON

    def storm(i: int) -> None:
        period = "A" if i % 2 == 0 else "B"
        n = 10 + i
        for attempt in range(60):
            try:
                publish_snapshot_incremental(_batch(spark, period, n, i * 1000), t)
                committed.append((i, period, n))
                return
            except RuntimeError:
                continue  # loud loss: retry on the fresh base
            except Exception:  # noqa: BLE001 -- anything else fails the pin
                import traceback

                errors.append(traceback.format_exc())
                return
        errors.append(AssertionError(f"thread {i} never won in 60 attempts"))

    threads = [threading.Thread(target=storm, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(committed) == 6  # every thread eventually committed

    # no snapshot dir ever commingles two writer jobs
    uuid_rx = re.compile(r"part-\d+-([0-9a-f-]{36})")
    for d in os.listdir(t):
        if not d.startswith("snapshot-"):
            continue
        uuids = set()
        for root, _, files in os.walk(os.path.join(t, d)):
            for f in files:
                m = uuid_rx.match(f)
                if m:
                    uuids.add(m.group(1))
        assert len(uuids) <= 1, (d, uuids)

    # the final table is exactly one winning batch per period
    out = read_current_snapshot(spark, t)
    by_period = {
        r["period"]: r["n"]
        for r in out.groupBy("period").agg(F.count("*").alias("n")).collect()
    }
    a_winners = [n for (i, p, n) in committed if p == "A"]
    b_winners = [n for (i, p, n) in committed if p == "B"]
    assert by_period["A"] in a_winners
    assert by_period["B"] in b_winners

    # the pre-storm pinned reader is untouched by 6 publishes
    assert pinned.count() == 6


def test_time_travel_reads_and_version_inventory(spark, tmp_path):
    """read_snapshot_version returns the table exactly as version N
    published it, on both layouts; list_snapshot_versions inventories
    committed versions only (a claimed/killed dir is not a readable
    state) and flags the current one."""
    from etl_upc_syllabus_spark.sources.layout import (
        list_snapshot_versions,
        read_snapshot_version,
    )

    # pointer table: v0 = {A:5, B:3}; v1 refreshes B to 7
    t = str(tmp_path / "ptr")
    publish_snapshot_incremental(
        _batch(spark, "A", 5).union(_batch(spark, "B", 3, 50)), t, "period"
    )
    publish_snapshot_incremental(_batch(spark, "B", 7, 100), t)
    inv = list_snapshot_versions(t)
    assert [(e["version"], e["kind"], e["current"]) for e in inv] == [
        (0, "pointer", False),
        (1, "pointer", True),
    ]
    assert read_snapshot_version(spark, t, 0).count() == 8
    assert read_snapshot_version(spark, t, 1).count() == 12
    with pytest.raises(KeyError, match="does not exist"):
        read_snapshot_version(spark, t, 7)

    # whole table: killed-mid-write orphan (no _SUCCESS) is not a version
    w = str(tmp_path / "whole")
    publish_snapshot(spark.range(4).withColumnRenamed("id", "v"), w)
    os.makedirs(os.path.join(w, "snapshot-00000001"))  # claimed, never written
    publish_snapshot(spark.range(2).withColumnRenamed("id", "v"), w)
    invw = list_snapshot_versions(w)
    assert [(e["version"], e["current"]) for e in invw] == [(0, False), (2, True)]
    assert read_snapshot_version(spark, w, 0).count() == 4
    assert read_snapshot_version(spark, w, 2).count() == 2


def test_whole_table_publisher_storm(spark, tmp_path):
    """The live-storm pattern on the WHOLE-TABLE path: 5 threads race
    publish_snapshot (retry on loud loss). Every thread commits, no
    snapshot dir commingles writer UUIDs, the final table is exactly
    one thread's complete batch, and a pre-storm pinned reader is
    untouched."""
    import re
    import threading

    t = str(tmp_path / "tbl")
    publish_snapshot(spark.range(4).withColumnRenamed("id", "v"), t)
    pinned = read_current_snapshot(spark, t)
    assert pinned.count() == 4

    errors, committed = [], []

    def storm(i: int) -> None:
        for _ in range(60):
            try:
                publish_snapshot(
                    spark.range(100 + i).withColumnRenamed("id", "v"), t
                )
                committed.append(100 + i)
                return
            except RuntimeError:
                continue
            except Exception:  # noqa: BLE001
                import traceback

                errors.append(traceback.format_exc())
                return
        errors.append(AssertionError(f"thread {i} never won"))

    threads = [threading.Thread(target=storm, args=(i,)) for i in range(5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(committed) == 5

    uuid_rx = re.compile(r"part-\d+-([0-9a-f-]{36})")
    for d in os.listdir(t):
        if d.startswith("snapshot-"):
            uuids = {
                m.group(1)
                for _, _, fs in os.walk(os.path.join(t, d))
                for f in fs
                if (m := uuid_rx.match(f))
            }
            assert len(uuids) <= 1, (d, uuids)
    assert read_current_snapshot(spark, t).count() in committed
    assert pinned.count() == 4


def test_vacuum_racing_a_publisher_storm_stays_consistent(spark, tmp_path):
    """Composition pin: a (single) vacuum loop runs concurrently with
    3 racing incremental publishers. Vacuum never touches above-current
    state, so every publisher still commits, the final read is
    consistent, and the table ends vacuumable to a clean window."""
    import threading

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 3), t, "period")

    errors, committed, stop = [], [], threading.Event()

    def publisher(i: int) -> None:
        for _ in range(60):
            try:
                publish_snapshot_incremental(_batch(spark, "A", 20 + i, i * 100), t)
                committed.append(20 + i)
                return
            except RuntimeError:
                continue
            except Exception:  # noqa: BLE001
                import traceback

                errors.append(traceback.format_exc())
                return
        errors.append(AssertionError(f"publisher {i} never won"))

    def vacuumer() -> None:
        while not stop.is_set():
            try:
                vacuum_snapshots(t, keep=2)
            except Exception:  # noqa: BLE001
                import traceback

                errors.append(traceback.format_exc())
                return

    threads = [threading.Thread(target=publisher, args=(i,)) for i in range(3)]
    vt = threading.Thread(target=vacuumer)
    vt.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    stop.set()
    vt.join()
    assert not errors, errors
    assert len(committed) == 3
    assert read_current_snapshot(spark, t).count() in committed
    vacuum_snapshots(t, keep=1)
    assert read_current_snapshot(spark, t).count() in committed


def test_pointer_read_prunes_on_the_partition_column(spark, tmp_path):
    """A filter on the partition column over a pointer read reaches the
    scan as PartitionFilters -- the explicit per-dir path list does not
    defeat partition pruning (the explicit schema declares the column
    as a partition column via basePath, same as a plain parquet read)."""
    from etl_upc_syllabus_spark.explain import plan_of

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 10).union(_batch(spark, "B", 10, 50)), t, "period"
    )
    publish_snapshot_incremental(_batch(spark, "B", 5, 100), t)  # 2 snapshots
    import re

    df = read_current_snapshot(spark, t).filter(F.col("period") == "B")
    _, formatted = plan_of(df)
    # assert on the BRACKET CONTENT (review r14: 'PartitionFilters'
    # prints on every partitioned scan even when empty, and a loose
    # substring match passes exactly when pruning is defeated)
    assert re.search(r"PartitionFilters: \[[^\]]*period", formatted), formatted
    assert df.count() == 5


def test_journal_tail_heals_and_legacy_tables_fall_back(spark, tmp_path):
    """Review r14 pass 4: (a) a flip that crashed between its journal
    write and its _CURRENT replace leaves a journal tail above current
    -- filtered from the inventory immediately and REWRITTEN AWAY by
    the next successful flip, so it can never resurface as phantom
    history once later commits pass its version; (b) a journal-less
    table from a pre-journal build inventories via the on-disk
    fallback instead of reporting zero versions; (c) vacuum compacts
    the journal to live targets."""
    from etl_upc_syllabus_spark.sources.layout import list_snapshot_versions

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 3), t, "period")  # v0
    # simulate the crashed flip: claimed dir + manifest + journal line
    # all written, _CURRENT still v0 (the real crash leaves all three)
    os.makedirs(os.path.join(t, "snapshot-00000001"))
    open(os.path.join(t, "snapshot-00000001", ".claim"), "w").close()
    with open(os.path.join(t, "_VERSIONS"), "a") as fh:
        fh.write("manifest-00000001.json\n")
    with open(os.path.join(t, "manifest-00000001.json"), "w") as fh:
        json.dump(
            {
                "format": "partition-pointers-v1",
                "version": 1,
                "partition_col": "period",
                "partitions": {"period=A": "snapshot-00000000"},
                "schemas": {},
            },
            fh,
        )
    assert [e["version"] for e in list_snapshot_versions(t)] == [0]
    # a later commit passes version 1; the healed journal still
    # excludes the phantom
    publish_snapshot_incremental(_batch(spark, "A", 5), t)  # claims v2
    assert [e["version"] for e in list_snapshot_versions(t)] == [0, 2]
    journal = open(os.path.join(t, "_VERSIONS")).read()
    assert "manifest-00000001.json" not in journal  # rewritten away

    # (c) vacuum compaction: journal drops vacuumed targets
    publish_snapshot_incremental(_batch(spark, "A", 7), t)  # v3
    vacuum_snapshots(t, keep=1)
    journal = open(os.path.join(t, "_VERSIONS")).read().split()
    assert all(os.path.exists(os.path.join(t, x)) for x in journal)

    # (b) legacy table: no journal
    t2 = str(tmp_path / "legacy")
    publish_snapshot_incremental(_batch(spark, "B", 2), t2, "period")
    os.remove(os.path.join(t2, "_VERSIONS"))
    inv = list_snapshot_versions(t2)
    assert [(e["version"], e["current"]) for e in inv] == [(0, True)]


def test_orphan_manifest_never_displaces_committed_versions(spark, tmp_path):
    """ADVICE r14 (medium): vacuum's committed set must come from the
    _VERSIONS journal, not version arithmetic. A refused publish's
    orphan manifest at a version current has PASSED used to count as
    committed history, occupy a keep slot, and displace a genuinely
    committed version inside the documented retention window -- its
    manifest removed, its uniquely-referenced snapshot rmtree'd,
    time-travel broken earlier than the window promises."""
    from etl_upc_syllabus_spark.sources.layout import (
        list_snapshot_versions,
        read_snapshot_version,
    )

    t = str(tmp_path / "tbl")
    for i in range(3):  # committed v0..v2
        publish_snapshot_incremental(_batch(spark, "A", i + 1), t, "period")
    # a refused/killed publish's orphan at v3: claimed dir with data +
    # manifest written, flip never happened (exact storm shape)
    os.makedirs(os.path.join(t, "snapshot-00000003"))
    _batch(spark, "Z", 4).write.mode("append").partitionBy("period").parquet(
        os.path.join(t, "snapshot-00000003")
    )
    with open(os.path.join(t, "manifest-00000003.json"), "w") as fh:
        json.dump(
            {
                "format": "partition-pointers-v1",
                "version": 3,
                "partition_col": "period",
                "partitions": {"period=Z": "snapshot-00000003"},
            },
            fh,
        )
    publish_snapshot_incremental(_batch(spark, "A", 5), t)  # v4 passes it

    deleted = vacuum_snapshots(t, keep=3)
    # the orphan is reclaimed outright -- manifest AND pinned dir --
    assert not os.path.exists(os.path.join(t, "manifest-00000003.json"))
    assert "snapshot-00000003" in deleted
    # -- and the newest-3 COMMITTED versions all survive it: v1, v2, v4
    # stay readable (pre-fix the orphan displaced v1 from the window)
    assert read_snapshot_version(spark, t, 1).count() == 2
    assert read_snapshot_version(spark, t, 2).count() == 3
    assert read_current_snapshot(spark, t).count() == 5
    assert [e["version"] for e in list_snapshot_versions(t)] == [1, 2, 4]


def test_orphan_whole_table_snapshot_never_displaces_committed(spark, tmp_path):
    """The whole-table twin of the displacement fix: a refused
    whole-table publish leaves a _SUCCESS-bearing orphan dir that
    version arithmetic cannot tell from history; journal-driven vacuum
    reclaims it without costing a committed version its keep slot."""
    from etl_upc_syllabus_spark.sources.layout import read_snapshot_version

    def _df(n):
        return spark.range(n).withColumnRenamed("id", "v")

    t = str(tmp_path / "tbl")
    for i in range(3):  # committed v0..v2
        publish_snapshot(_df(i + 1), t)
    # orphan at v3 (refused publish: full data + _SUCCESS, no flip)
    _df(9).write.parquet(os.path.join(t, "snapshot-00000003"))
    publish_snapshot(_df(5), t)  # v4 passes it

    deleted = vacuum_snapshots(t, keep=3)
    assert "snapshot-00000003" in deleted  # orphan reclaimed outright
    # newest-3 committed versions survive (pre-fix v1 was rmtree'd)
    assert read_snapshot_version(spark, t, 1).count() == 2
    assert read_snapshot_version(spark, t, 2).count() == 3
    assert read_current_snapshot(spark, t).count() == 5


def test_flip_refuses_layout_conversion_inside_the_lock(spark, tmp_path):
    """ADVICE r14: the entry-time layout-mix guard races the OTHER
    layout's first commit -- a whole-table publish that passes the
    guard while _CURRENT is still absent must not flip a pointer
    table into a whole-table one. The flip re-checks the target kind
    inside its flock critical section."""
    import etl_upc_syllabus_spark.sources.layout as layout

    t = str(tmp_path / "tbl")
    real_claim = layout._claim_version
    fired = []

    def pointer_commits_first(table_dir, attempts=16):
        if not fired:
            fired.append(True)
            # the pointer table's FIRST commit lands after the whole-
            # table publish already passed its entry guard (no _CURRENT)
            publish_snapshot_incremental(_batch(spark, "A", 3), t, "period")
        return real_claim(table_dir, attempts)

    try:
        layout._claim_version = pointer_commits_first
        with pytest.raises(RuntimeError, match="other layout"):
            publish_snapshot(spark.range(2).withColumnRenamed("id", "v"), t)
    finally:
        layout._claim_version = real_claim
    # the pointer commit survives untouched; the loser left only orphans
    assert read_current_snapshot(spark, t).count() == 3
    publish_snapshot_incremental(_batch(spark, "B", 2), t)  # passes orphan
    vacuum_snapshots(t, keep=2)
    assert read_current_snapshot(spark, t).count() == 5


def test_reader_racing_vacuum_retries_instead_of_crashing(spark, tmp_path):
    """ADVICE r14 (reader symmetry): a reader whose manifest is
    vacuumed between the _CURRENT read and its load re-reads _CURRENT
    once; a second loss in a row raises the same retryable RuntimeError
    the publisher path uses, never a raw FileNotFoundError."""
    import etl_upc_syllabus_spark.sources.layout as layout

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 4), t, "period")

    real_load = layout._load_manifest
    fails = {"n": 1}

    def load_flaky(table_dir, manifest_name):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise FileNotFoundError(manifest_name)
        return real_load(table_dir, manifest_name)

    try:
        layout._load_manifest = load_flaky
        assert read_current_snapshot(spark, t).count() == 4  # one retry wins
        fails["n"] = 2  # persistent loss: loud AND retryable
        with pytest.raises(RuntimeError, match="retry the read"):
            read_current_snapshot(spark, t)
    finally:
        layout._load_manifest = real_load


def test_crashed_staging_leftover_does_not_exhaust_claim_attempts(
    spark, tmp_path
):
    """ADVICE r14: the claim staging name is (version, pid, ATTEMPT) --
    a crashed leftover at the same (version, pid) collides once, not
    sixteen times, when _max_version has not advanced."""
    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 2), t, "period")  # v0
    # a crashed claimant's leftover for v1 under OUR pid, attempt 0
    leftover = os.path.join(t, f".claiming-00000001-{os.getpid()}-0")
    os.makedirs(leftover)
    publish_snapshot_incremental(_batch(spark, "A", 6), t)  # must not wedge
    assert read_current_snapshot(spark, t).count() == 6
    # vacuum leaves a YOUNG lockless staging dir alone (the r15 grace
    # window -- it cannot tell it from a claimant in its microseconds
    # open->flock gap) ...
    vacuum_snapshots(t, keep=2)
    assert os.path.isdir(leftover)
    # ... and reclaims it once it is old enough to be dead for sure
    old_ts = time.time() - 120
    os.utime(leftover, (old_ts, old_ts))
    vacuum_snapshots(t, keep=2)
    assert not [d for d in os.listdir(t) if d.startswith(".claiming-")]


def test_rebase_pointer_table_collapses_live_snapshots(spark, tmp_path):
    """VERDICT r14 item 4: the re-base recipe is a function. After many
    single-partition refreshes the reader unions one branch per live
    snapshot; re-base re-points every partition at ONE fresh snapshot,
    then vacuum reclaims the rest."""
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 5).union(_batch(spark, "B", 3, 50)), t, "period"
    )
    for i in range(4):  # B-only refreshes: A stays pinned to snapshot 0
        publish_snapshot_incremental(_batch(spark, "B", i + 2, 100 * i), t)
    before = json.load(
        open(os.path.join(t, "manifest-00000004.json"))
    )["partitions"]
    assert len(set(before.values())) == 2  # two live snapshots pre-re-base

    snap_dir = rebase_pointer_table(spark, t, vacuum_keep=1)
    after = json.load(open(os.path.join(t, "manifest-00000005.json")))
    assert set(after["partitions"].values()) == {os.path.basename(snap_dir)}
    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "A").count() == 5
    assert out.filter(F.col("period") == "B").count() == 5
    # vacuum_keep=1 reclaimed everything the re-based manifest dropped
    live_dirs = {d for d in os.listdir(t) if d.startswith("snapshot-")}
    assert live_dirs == {os.path.basename(snap_dir)}
    # layout recipe applied: one file per partition dir, not tasks x parts
    for d in os.listdir(snap_dir):
        if d.startswith("period="):
            n_parts = [
                f
                for f in os.listdir(os.path.join(snap_dir, d))
                if f.endswith(".parquet")
            ]
            assert len(n_parts) == 1


def test_rebase_refuses_non_pointer_tables(spark, tmp_path):
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = str(tmp_path / "whole")
    publish_snapshot(spark.range(3).withColumnRenamed("id", "v"), t)
    with pytest.raises(ValueError, match="not a pointer-manifest table"):
        rebase_pointer_table(spark, t)
    with pytest.raises(ValueError, match="not a pointer-manifest table"):
        rebase_pointer_table(spark, str(tmp_path / "missing"))


def test_reader_pinned_across_a_racing_rebase(spark, tmp_path):
    """The racing-reader property VERDICT r14 item 4 asks pinned on the
    re-base specifically: a reader resolved BEFORE the re-base keeps
    its exact rows after the re-base lands (its files are untouched
    until vacuum), and a vacuum honoring the retention contract
    (keep >= the pinned version's distance) keeps it readable."""
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 4).union(_batch(spark, "B", 2, 50)), t, "period"
    )
    publish_snapshot_incremental(_batch(spark, "B", 9, 100), t)  # v1
    pinned = read_current_snapshot(spark, t)  # resolves v1's manifest NOW
    assert pinned.count() == 13

    rebase_pointer_table(spark, t)  # v2: full rewrite, no vacuum
    publish_snapshot_incremental(_batch(spark, "B", 1, 200), t)  # v3
    # the pinned plan still reads v1's exact files
    assert pinned.count() == 13
    assert pinned.filter(F.col("period") == "B").count() == 9
    # retention honored: keep=3 covers v1, so the pinned read survives
    vacuum_snapshots(t, keep=3)
    assert pinned.count() == 13


def test_rebase_refuses_when_a_refresh_lands_in_its_window(spark, tmp_path):
    """r15 review pass 1 (the re-base lost-update): a concurrent
    refresh committing between the re-base's base read and its publish
    must make the re-base REFUSE -- its df carries every partition, so
    without the expected_base CAS the publish's own entry re-read
    would adopt the newer manifest as base, the flip guard would pass,
    and the refresh would be silently reverted to pre-re-base data."""
    import etl_upc_syllabus_spark.sources.layout as layout
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(
        _batch(spark, "A", 4).union(_batch(spark, "B", 2, 50)), t, "period"
    )  # v0

    real_read = layout._read_pointer_manifest

    def compose_then_lose_the_race(spark_, table_dir, manifest_name):
        df = real_read(spark_, table_dir, manifest_name)
        # the concurrent refresh commits AFTER the re-base composed its
        # df from v0 but BEFORE the publish's own entry read of
        # _CURRENT -- the exact window only the expected_base CAS sees
        # (the flip's expected_current guard compares against the
        # publish's entry read, which would already be the NEW manifest)
        publish_snapshot_incremental(_batch(spark, "B", 9, 100), t)
        return df

    try:
        layout._read_pointer_manifest = compose_then_lose_the_race
        with pytest.raises(RuntimeError, match="expected_base .* is stale"):
            rebase_pointer_table(spark, t)
    finally:
        layout._read_pointer_manifest = real_read

    # the refresh survived; the failed re-base left only orphans
    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "B").count() == 9
    # and a retried re-base (fresh base) succeeds and keeps the refresh
    rebase_pointer_table(spark, t, vacuum_keep=1)
    out = read_current_snapshot(spark, t)
    assert out.filter(F.col("period") == "B").count() == 9
    assert out.filter(F.col("period") == "A").count() == 4


def test_verify_honors_the_sessions_success_marker_convention(spark, tmp_path):
    """r15: verify defaults on, so it must follow the session's own
    committer config -- a writer with marksuccessfuljobs=false never
    writes _SUCCESS, and the pre-flip audit must not fail every publish
    over its own convention."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key)
    try:
        hconf.set(key, "false")
        t = str(tmp_path / "tbl")
        publish_snapshot_incremental(_batch(spark, "A", 3), t, "period")
        assert read_current_snapshot(spark, t).count() == 3
        snaps = [d for d in os.listdir(t) if d.startswith("snapshot-")]
        assert not os.path.exists(os.path.join(t, snaps[0], "_SUCCESS"))
    finally:
        if old is None:
            hconf.unset(key)
        else:
            hconf.set(key, old)


def test_rebase_and_readers_racing_a_publisher_storm(spark, tmp_path):
    """r15 storm extension (VERDICT r14 item 6: every touched
    concurrency surface gets a LIVE storm, not just simulated
    interleavings): 4 per-partition publisher threads x multiple
    refreshes race a re-baser loop, a vacuum loop (journal-driven
    committed set), and a reader loop. Invariants at close: no thread
    died on anything but the documented retryable losses, every
    partition reads back as its writer's LAST committed batch (the
    re-base never reverted a refresh -- the expected_base CAS under
    real timing), readers never crashed unretryably, and the table
    ends vacuumable to one live snapshot."""
    import threading

    t = str(tmp_path / "tbl")
    periods = ["P0", "P1", "P2", "P3"]
    seed = _batch(spark, periods[0], 1)
    for p in periods[1:]:
        seed = seed.union(_batch(spark, p, 1))
    publish_snapshot_incremental(seed, t, "period")

    errors: list[str] = []
    last_committed: dict[str, int] = {p: 1 for p in periods}
    stop = threading.Event()

    def publisher(i: int) -> None:
        period = periods[i]
        for rnd in range(5):
            n = 2 + 4 * rnd + i  # distinct per (thread, round)
            for _ in range(80):
                try:
                    publish_snapshot_incremental(
                        _batch(spark, period, n, i * 10_000), t
                    )
                    last_committed[period] = n  # single writer per key
                    break
                except RuntimeError:
                    continue
                except Exception:  # noqa: BLE001
                    import traceback

                    errors.append(traceback.format_exc())
                    return
            else:
                errors.append(f"publisher {i} round {rnd}: 80 losses")
                return

    def rebaser() -> None:
        from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

        done = 0
        while not stop.is_set() and done < 3:
            try:
                rebase_pointer_table(spark, t)
                done += 1
            except RuntimeError:
                continue  # CAS refusal: a refresh landed in the window
            except Exception:  # noqa: BLE001
                import traceback

                errors.append(traceback.format_exc())
                return

    def vacuumer() -> None:
        # keep wider than the storm's total version count: the vacuum
        # retention contract says "run only when no reader can still be
        # pinned" to a reclaimed version, and the mid-flight re-base IS
        # a pinned reader of its base (measured: keep=8 under ~25 fast
        # versions reclaimed the re-base's base snapshots mid-write).
        # Orphan reclamation -- the journal-driven r15 surface -- runs
        # regardless of the window, so it is still exercised live here.
        while not stop.is_set():
            try:
                vacuum_snapshots(t, keep=50)
            except Exception:  # noqa: BLE001
                import traceback

                errors.append(traceback.format_exc())
                return

    def reader() -> None:
        ok = 0
        while not stop.is_set():
            try:
                assert read_current_snapshot(spark, t).count() >= 4
                ok += 1
            except RuntimeError:
                continue  # documented retryable read loss
            except Exception:  # noqa: BLE001
                # a reader lagging >keep versions behind a fast storm is
                # outside the retention contract; only count real reads
                continue
        if ok == 0:
            errors.append("reader never completed a clean read")

    pubs = [threading.Thread(target=publisher, args=(i,)) for i in range(4)]
    aux = [
        threading.Thread(target=rebaser),
        threading.Thread(target=vacuumer),
        threading.Thread(target=reader),
    ]
    for th in aux + pubs:
        th.start()
    for th in pubs:
        th.join()
    stop.set()
    for th in aux:
        th.join()
    assert not errors, errors

    # every partition reads back as its single writer's LAST commit --
    # no re-base or vacuum interleaving ever reverted a refresh
    out = read_current_snapshot(spark, t)
    by_period = {
        r["period"]: r["n"]
        for r in out.groupBy("period").agg(F.count("*").alias("n")).collect()
    }
    assert by_period == last_committed

    # the table ends re-basable + vacuumable to ONE live snapshot
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    snap_dir = rebase_pointer_table(spark, t, vacuum_keep=1)
    live = {d for d in os.listdir(t) if d.startswith("snapshot-")}
    assert live == {os.path.basename(snap_dir)}
    out = read_current_snapshot(spark, t)
    assert {
        r["period"]: r["n"]
        for r in out.groupBy("period").agg(F.count("*").alias("n")).collect()
    } == last_committed


def test_time_travel_racing_vacuum_raises_keyerror_not_fnf(spark, tmp_path):
    """r15 symmetry sweep: a time-travel read whose target is vacuumed
    between the inventory's existence check and the manifest load gets
    the documented KeyError (the retention contract's error), never a
    raw FileNotFoundError."""
    import etl_upc_syllabus_spark.sources.layout as layout
    from etl_upc_syllabus_spark.sources.layout import read_snapshot_version

    t = str(tmp_path / "tbl")
    publish_snapshot_incremental(_batch(spark, "A", 2), t, "period")  # v0
    publish_snapshot_incremental(_batch(spark, "A", 3), t)  # v1

    real_load = layout._load_manifest

    def load_vacuumed(table_dir, manifest_name):
        if manifest_name == "manifest-00000000.json":
            raise FileNotFoundError(manifest_name)  # vacuum won the race
        return real_load(table_dir, manifest_name)

    try:
        layout._load_manifest = load_vacuumed
        with pytest.raises(KeyError, match="reclaimed by vacuum"):
            read_snapshot_version(spark, t, 0)
    finally:
        layout._load_manifest = real_load
    assert read_snapshot_version(spark, t, 1).count() == 3


def test_rebase_roundtrips_hostile_partition_values(spark, tmp_path):
    """r15 review pass 4: re-base is the one operation that DECODES
    partition values from dir names (the pinned-string read) and
    RE-ENCODES them through a fresh partitionBy -- a roundtrip ordinary
    refreshes never perform (their pointer keys are the raw dir names).
    NULL, the %XX-escaped class, spaces, and '=' must survive it
    byte-identically."""
    from etl_upc_syllabus_spark.sources.layout import rebase_pointer_table

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, None), (2, "a/b"), (3, "a b"), (4, "k=v"), (5, "ok")],
        "v long, period string",
    )
    publish_snapshot_incremental(df, t, "period")
    before = json.load(open(os.path.join(t, "manifest-00000000.json")))

    rebase_pointer_table(spark, t, vacuum_keep=1)
    after_name = sorted(
        f for f in os.listdir(t) if f.startswith("manifest-")
    )[-1]
    after = json.load(open(os.path.join(t, after_name)))
    # identical raw dir-name keys, all re-pointed at the new snapshot
    assert set(after["partitions"]) == set(before["partitions"])
    assert len(set(after["partitions"].values())) == 1
    back = {
        r["v"]: r["period"] for r in read_current_snapshot(spark, t).collect()
    }
    assert back == {1: None, 2: "a/b", 3: "a b", 4: "k=v", 5: "ok"}


def test_first_flip_of_pre_journal_table_backfills_journal(spark, tmp_path):
    """ADVICE r15 (medium): the first flip of a journal-less table must
    seed the journal with the table's committed legacy history -- not
    just its own commit. Without the backfill, every pre-journal
    committed version classifies as a refused-publish orphan the
    moment the journal exists, and the next vacuum reclaims it
    OUTRIGHT, inside the documented keep window: the exact
    retention-contract violation the single-commit-authority rule was
    meant to prevent. Pinned for BOTH layouts."""
    from etl_upc_syllabus_spark.sources.layout import (
        list_snapshot_versions,
        read_snapshot_version,
    )

    # pointer layout: three committed versions from a "pre-journal
    # build" (journal removed), then one post-upgrade publish
    t = str(tmp_path / "ptr")
    for i in range(3):
        publish_snapshot_incremental(_batch(spark, "A", 2 + i), t, "period")
    os.remove(os.path.join(t, "_VERSIONS"))
    publish_snapshot_incremental(_batch(spark, "B", 9), t)  # v3 starts journal
    journal = open(os.path.join(t, "_VERSIONS")).read().split()
    assert journal == [f"manifest-{v:08d}.json" for v in range(4)]
    # the keep window now protects legacy history exactly as if the
    # journal had existed all along
    deleted = vacuum_snapshots(t, keep=4)
    assert deleted == []
    assert [e["version"] for e in list_snapshot_versions(t)] == [0, 1, 2, 3]
    assert read_snapshot_version(spark, t, 0).count() == 2  # time travel intact

    # whole-table layout: same upgrade path
    t2 = str(tmp_path / "whole")
    for i in range(3):
        publish_snapshot(_batch(spark, "A", 4 + i), t2)
    os.remove(os.path.join(t2, "_VERSIONS"))
    publish_snapshot(_batch(spark, "B", 8), t2)  # v3 starts the journal
    journal2 = open(os.path.join(t2, "_VERSIONS")).read().split()
    assert journal2 == [f"snapshot-{v:08d}" for v in range(4)]
    deleted2 = vacuum_snapshots(t2, keep=4)
    assert deleted2 == []
    assert read_snapshot_version(spark, t2, 1).count() == 5


def test_half_journaled_table_keeps_pre_journal_history(spark, tmp_path):
    """ADVICE r15 defense-in-depth: a table whose journal was started
    by an OLDER build (only the latest commit journaled -- the half
    state the backfill now prevents) must still keep its pre-journal
    committed history: vacuum classifies non-journaled targets below
    the journal's minimum version as committed (legacy heuristic),
    never as orphans, and the inventory / time travel see them."""
    from etl_upc_syllabus_spark.sources.layout import (
        list_snapshot_versions,
        read_snapshot_version,
    )

    t = str(tmp_path / "half")
    for i in range(3):
        publish_snapshot_incremental(_batch(spark, "A", 3 + i), t, "period")
    # simulate the older build's half state: journal covers ONLY v2
    with open(os.path.join(t, "_VERSIONS"), "w") as fh:
        fh.write("manifest-00000002.json\n")
    assert [e["version"] for e in list_snapshot_versions(t)] == [0, 1, 2]
    assert vacuum_snapshots(t, keep=3) == []
    assert [e["version"] for e in list_snapshot_versions(t)] == [0, 1, 2]
    assert read_snapshot_version(spark, t, 0).count() == 3
    # the window still ages legacy history out normally (oldest first)
    vacuum_snapshots(t, keep=2)
    assert [e["version"] for e in list_snapshot_versions(t)] == [1, 2]


def test_vacuum_refuses_while_another_vacuum_holds_the_lock(spark, tmp_path):
    """VERDICT r15 item 4: the single-operator contract is code, not
    prose. A vacuum entering while another holds .vacuum.lock refuses
    loudly (never races the first's rmtree); after release it runs."""
    import fcntl

    t = str(tmp_path / "tbl")
    for i in range(3):
        publish_snapshot_incremental(_batch(spark, "A", 2 + i), t, "period")
    with open(os.path.join(t, ".vacuum.lock"), "a") as holder:
        fcntl.flock(holder, fcntl.LOCK_EX)
        with pytest.raises(RuntimeError, match="another vacuum"):
            vacuum_snapshots(t, keep=1)
        # refusal touched nothing
        assert os.path.exists(os.path.join(t, "manifest-00000000.json"))
    vacuum_snapshots(t, keep=1)  # lock released: runs normally
    assert not os.path.exists(os.path.join(t, "manifest-00000000.json"))


def test_two_racing_vacuums_one_wins_table_intact(spark, tmp_path):
    """Storm pin for the vacuum lock: two vacuums launched together --
    either one refuses with the single-operator RuntimeError or they
    serialize (first finished before the second's flock attempt);
    never both mid-flight. Either way the table ends consistent."""
    import threading

    from etl_upc_syllabus_spark.sources.layout import list_snapshot_versions

    t = str(tmp_path / "tbl")
    for i in range(6):
        publish_snapshot_incremental(_batch(spark, "A", 2 + i), t, "period")
    results: list[object] = [None, None]

    def run(slot):
        try:
            results[slot] = vacuum_snapshots(t, keep=2)
        except RuntimeError as e:
            results[slot] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    refusals = [r for r in results if isinstance(r, RuntimeError)]
    assert all("another vacuum" in str(r) for r in refusals)
    assert len(refusals) <= 1  # at least one vacuum completed
    assert [e["version"] for e in list_snapshot_versions(t)] == [4, 5]
    assert read_current_snapshot(spark, t).count() == 7
