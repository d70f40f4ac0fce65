"""Physical data layout at write time: range clustering and compaction.

At 100 TB, read performance is decided before the first query runs --
by how the data was written:

- **Range-clustered layout**: `repartitionByRange` on the query-time
  filter keys + `sortWithinPartitions` makes every parquet row group
  cover a narrow key range, so the reader's min/max statistics skip
  almost all of the file for a selective predicate. This is the
  poor-man's Z-order, and for single-key range predicates (dates,
  ids) it is optimal.
- **Compaction**: streaming/incremental sinks accumulate small files;
  a 100 TB table with 1 MB files spends more time listing and opening
  than scanning. `compact` rewrites a directory to a bounded file
  count with `maxRecordsPerFile` as the safety valve.

The reference has no layout control at all -- it writes one JSON file
per record (reference etl_infrastructure.py:153-158), the pathological
small-files case; `pipeline/sinks.py` already replaces that with
partitioned parquet, and this module adds the intra-partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_ranges: int,
    max_records_per_file: int | None = None,
) -> None:
    """Write `df` range-partitioned AND sorted on `cluster_cols`.

    Every output file then holds one contiguous key range; parquet
    min/max stats make range predicates on those columns skip whole
    row groups/files at read time.
    """
    writer = (
        df.repartitionByRange(n_ranges, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def compact(spark: SparkSession, path: str, out_path: str, target_files: int) -> int:
    """Rewrite a (small-file-fragmented) parquet dir into `target_files`
    files; returns the input file count for before/after reporting.

    coalesce (not repartition): merging needs no shuffle -- each output
    task reads several input files sequentially.
    """
    df = spark.read.parquet(path)
    n_in = df.rdd.getNumPartitions()
    df.coalesce(target_files).write.mode("overwrite").parquet(out_path)
    return n_in


# --- snapshot publish: manifest-committed atomic table versions (r13) ------
#
# The r13 overwrite/torn-write probes measured the two failure shapes
# of in-place mode("overwrite") at lake scale: a racing fail-fast
# reader dies on vanished files, a racing resilient reader returns 0
# rows SILENTLY, and a killed job leaves artifacts both engines
# mis-read. Real table formats (Delta/Iceberg) fix this with
# metadata-committed snapshots; this is the minimal core of that idea
# on plain parquet + a manifest file:
#
# - every publish writes a brand-new snapshot-NNNNNNNN directory
#   (never touching live files), then flips one tiny _CURRENT manifest
#   via atomic os.replace;
# - readers resolve _CURRENT once at analysis and keep reading that
#   snapshot's files, which no later publish deletes -- the overwrite
#   race is structurally gone until an explicit vacuum;
# - a publish killed mid-write leaves an orphan snapshot dir that
#   _CURRENT never pointed to: invisible to readers, reclaimed by
#   vacuum, and auditable with audit_write_artifacts before the flip.

_MANIFEST = "_CURRENT"
# how long a .claiming- staging dir must sit untouched before vacuum may
# reclaim it (see the grace-window comment in vacuum_snapshots; a live
# claimant's staging phase is microseconds, so 30 s is ~6 decades of margin)
_STAGING_GRACE_SEC = 30.0
_SNAP_PREFIX = "snapshot-"
_VERSIONS_JOURNAL = "_VERSIONS"


def publish_snapshot(df: DataFrame, table_dir: str, *, verify: bool = True) -> str:
    """Write ``df`` as the table's next snapshot and atomically flip
    the manifest. Returns the published snapshot directory.

    The write lands in a NEW ``snapshot-NNNNNNNN`` dir (monotonic
    version numbers; gaps are fine -- orphans from killed publishes
    are skipped by the version scan because only _CURRENT confers
    liveness). The manifest flip is ``os.replace`` of a same-directory
    temp file: atomic on POSIX, so a reader sees either the old
    version or the new one, never a torn manifest.

    Concurrency contract (review r13 pass 3 + ADVICE r13): the version
    is CLAIMED with an atomic ``os.mkdir`` of the snapshot dir before
    any data writes -- two concurrent publishers that both compute
    version N+1 cannot both create ``snapshot-N+1`` (EEXIST), so the
    loser retries loudly at a higher version instead of commingling two
    jobs' part files into one snapshot that _CURRENT then double-counts
    (the exact orphan-part class ``audit_write_artifacts`` targets).
    The flip itself stays CONDITIONAL, and runs its read-check-replace
    inside an exclusive flock on ``._CURRENT.lock`` (r14) -- if a
    faster concurrent publisher COMMITTED a higher version while this
    one's data wrote, this publish raises instead of rolling the table
    back to its own older version, and its snapshot dir is left as a
    vacuum-reclaimable orphan. A merely CLAIMED higher dir does not
    block (claims happen at publish start; refusing on them livelocks,
    measured in the r14 storm test). mkdir-claim + flock'd conditional
    flip close the same-version and rollback shapes on a local POSIX
    mount; for NFS or an object store without atomic mkdir/rename/flock
    use a real metadata service as the manifest (same snapshot layout,
    conditional-put commit).

    ``verify=True`` runs :func:`~..sources.formats.audit_write_artifacts`
    on the just-written snapshot BEFORE the flip and raises on any
    finding -- a torn/polluted snapshot then never becomes _CURRENT
    (it stays a vacuum-reclaimable orphan), which makes the documented
    "audit before promoting" composition executable instead of
    advisory. DEFAULT ON since r15 (VERDICT r14 item 5): small
    snapshots audit driver-side in milliseconds
    (``audit_write_artifacts``'s ``max_driver_files`` short-circuit),
    and against a real batch publish the distributed listing is noise
    -- on this layer a failed audit means the version simply never
    goes live, which is the whole point. Opt out per-publish for
    write-hot tiny-batch paths that measure the audit as overhead.
    """
    import os as _os

    _os.makedirs(table_dir, exist_ok=True)
    current = _read_manifest_target(table_dir)
    if current is not None and current.startswith(_MANIFEST_PREFIX):
        raise ValueError(
            f"{table_dir!r} is a partition-pointer table "
            f"(_CURRENT -> {current}); whole-table publishes do not mix "
            "with pointer manifests -- keep using "
            "publish_snapshot_incremental, or start a fresh table dir"
        )
    version, snap, claim = _claim_version(table_dir)
    try:
        df.write.mode("append").parquet(_os.path.join(table_dir, snap))
        if verify:
            _verify_snapshot(
                df.sparkSession, _os.path.join(table_dir, snap), snap
            )
        _flip_manifest(table_dir, version, snap)
    finally:
        claim.close()  # releases the liveness flock either way
    return _os.path.join(table_dir, snap)


def _claim_version(table_dir: str, attempts: int = 16):
    """Atomically claim the table's next version by mkdir'ing its
    snapshot dir (ADVICE r13: EEXIST from a concurrent claimant ->
    retry at a higher version, never share a dir). The claimed dir is
    empty and owned by this publisher alone, so the Spark write into it
    uses mode("append") -- the one mode that tolerates the claim dir
    AND never deletes it: "errorifexists" trips over our own claim, and
    "overwrite" PRE-DELETES the claimed dir at job start, erasing the
    mkdir marker for the duration of the delete->recreate window -- a
    concurrent claimant then mkdirs the SAME version and two jobs
    commingle staging in one dir (caught live by the r14 publisher-
    storm test: both jobs' FileOutputCommitter staging collided and
    the writes died on vanished _temporary attempt dirs).

    Returns ``(version, snap, claim_lock)``: an open, flock-EX'd handle
    on ``<snap_dir>/.claim`` that the publisher holds for the WHOLE
    publish (caught live by the r14 vacuum-vs-storm test: a slow
    publisher's claimed dir drops BELOW current when faster publishers
    commit past it, at which point no version arithmetic can tell it
    from a dead orphan -- vacuum rmtree'd it mid-write. A held lock is
    the one liveness proof that survives any interleaving and dies
    with the process). Close the handle when the publish ends, either
    way."""
    import fcntl as _fcntl
    import os as _os

    import shutil as _shutil

    for attempt in range(attempts):
        version = _max_version(table_dir) + 1
        snap = f"{_SNAP_PREFIX}{version:08d}"
        # STAGE the claim: lock .claim inside a hidden staging dir,
        # then atomically rename it to the snapshot name (review r14:
        # a bare mkdir followed by the .claim open left a gap in which
        # the dir was visible WITHOUT its liveness lock, and a racing
        # vacuum -- after faster commits passed this version -- could
        # rmtree it as a dead orphan mid-claim). Post-rename the
        # visible dir is never without a held lock. A rename onto an
        # existing NON-EMPTY dir fails (the only kind the protocol
        # produces: every claimed dir contains at least .claim), so
        # concurrent claimants of the same version still cannot share.
        staging = _os.path.join(
            table_dir,
            f".claiming-{version:08d}-{_os.getpid()}-{attempt}",
        )
        try:
            _os.mkdir(staging)
        except FileExistsError:
            # a crashed leftover at this exact name (same version, same
            # recycled pid). The ATTEMPT counter in the staging name
            # guarantees the next loop iteration picks a different path
            # even when _max_version has not advanced (ADVICE r14:
            # without it all 16 attempts collided on the identical
            # staging path and the publish failed spuriously); the
            # leftover itself is vacuum's to reclaim.
            continue
        try:
            claim = open(_os.path.join(staging, ".claim"), "w", encoding="utf-8")
        except FileNotFoundError:
            # a racing vacuum reclaimed the still-lockless staging dir
            # (it cannot tell it from a crashed claimant's leftover).
            # Staging holds no data yet, so this is a free retry; once
            # .claim exists and is flocked, liveness is provable and
            # the same vacuum skips us. A reclaim in the open->flock
            # microsecond gap surfaces at the rename (ENOENT -> same
            # retry path below)
            continue
        _fcntl.flock(claim, _fcntl.LOCK_EX)  # uncontended: staging is ours
        try:
            _os.rename(staging, _os.path.join(table_dir, snap))
        except OSError:
            # a concurrent publisher claimed this version first
            claim.close()
            _shutil.rmtree(staging, ignore_errors=True)
            continue
        try:
            on_path = _os.stat(_os.path.join(table_dir, snap, ".claim"))
            compromised = (
                _os.fstat(claim.fileno()).st_nlink == 0
                or on_path.st_ino != _os.fstat(claim.fileno()).st_ino
            )
        except FileNotFoundError:
            compromised = True
        if compromised:
            # forensic chain from the storm's rarest flake (r14, root-
            # caused fully in r15): a vacuum judged the staging dead in
            # our open->flock gap and began an fd-based rmtree, which
            # follows the INODE -- so it survives our rename and unlinks
            # .claim inside the already-renamed snapshot dir (its final
            # path-based rmdir ENOENTs harmlessly). The dir is then
            # visible but its liveness forever unprovable (the locked
            # inode is off the filesystem), and a later vacuum dooms it
            # MID-WRITE -- caught live by the rebase-vs-vacuum storm.
            # The on-path stat vs locked-fd fstat inode comparison
            # catches every interleaving where the unlink lands before
            # this check; the vacuum-side staging GRACE WINDOW (see
            # vacuum_snapshots) prevents the reclaim from starting in
            # the microseconds-wide gap at all. Abandon before any data
            # is written. After this check passes, the on-path .claim
            # IS our locked inode and every later liveness probe sees
            # the lock.
            claim.close()
            _shutil.rmtree(
                _os.path.join(table_dir, snap), ignore_errors=True
            )  # ours, holds at most the orphaned .claim
            continue
        return version, snap, claim
    raise RuntimeError(
        f"could not claim a snapshot version in {table_dir!r} after "
        f"{attempts} attempts -- a publisher storm or a clock-free loop; "
        "back off and retry"
    )


def _claim_is_live(table_dir: str, snap: str) -> bool:
    """True iff a publisher currently HOLDS ``snap``'s claim lock (it
    is mid-publish); False for dead orphans (the kernel released the
    lock when the owner died) and for dirs with no claim file."""
    import fcntl as _fcntl
    import os as _os

    try:
        fh = open(_os.path.join(table_dir, snap, ".claim"), encoding="utf-8")
    except (FileNotFoundError, NotADirectoryError):
        return False
    try:
        try:
            _fcntl.flock(fh, _fcntl.LOCK_EX | _fcntl.LOCK_NB)
        except OSError:
            return True  # held elsewhere: live publisher
        _fcntl.flock(fh, _fcntl.LOCK_UN)
        return False
    finally:
        fh.close()


def _verify_snapshot(spark: SparkSession, snap_dir: str, snap: str) -> None:
    """Pre-flip write audit (VERDICT r13 item 6): any artifact finding
    aborts the publish loudly; the unflipped snapshot stays invisible
    to readers and vacuum-reclaimable. Uses the COLLECTED audit form
    (r15): a small snapshot verifies in one driver-side walk, zero
    Spark jobs -- cheap enough that verify defaults on. The _SUCCESS
    expectation follows the session's own committer config (r15 review
    pass 1: with marksuccessfuljobs=false the marker legitimately never
    exists, and a default-on verify must not fail every publish over
    its own writer's convention)."""
    from .formats import collect_write_artifacts

    marks = (
        spark.sparkContext._jsc.hadoopConfiguration().get(
            "mapreduce.fileoutputcommitter.marksuccessfuljobs"
        )
        or "true"
    )
    findings = collect_write_artifacts(
        spark, snap_dir, expect_success=marks.lower() != "false"
    )
    if findings:
        detail = ", ".join(f"{iss}: {f}" for f, iss in findings[:5])
        raise RuntimeError(
            f"verify=True: write-artifact audit found {len(findings)} "
            f"issue(s) in {snap} -- refusing to flip _CURRENT onto a "
            f"torn snapshot ({detail}{'...' if len(findings) > 5 else ''}); "
            "the snapshot is left unpublished for inspection/vacuum"
        )


def _max_version(table_dir: str) -> int:
    import os as _os

    return max(
        (
            int(d[len(_SNAP_PREFIX):])
            for d in _os.listdir(table_dir)
            if d.startswith(_SNAP_PREFIX) and d[len(_SNAP_PREFIX):].isdigit()
        ),
        default=-1,
    )


_UNCHECKED = object()  # sentinel: _flip_manifest skips the stale-base check


def _flip_manifest(
    table_dir: str, version: int, snap: str, expected_current=_UNCHECKED
) -> None:
    """Conditional _CURRENT flip under an exclusive flock: refuse to
    flip backwards past a concurrently COMMITTED higher version, and
    (when ``expected_current`` is given) refuse when _CURRENT moved
    since the caller composed its state from it -- the lost-update
    shape of the pointer path.

    Committed = the version _CURRENT points at, not the highest
    snapshot dir on disk: a dir is CLAIMED at publish start (mkdir,
    possibly long before its data commits, possibly an orphan forever),
    and refusing on claims livelocks concurrent publishers -- the r14
    storm test measured 5 of 6 threads exhausting 30 attempts because
    every in-flight claim doomed every other publisher's flip.

    The read-check-replace runs inside ``flock(LOCK_EX)`` on a
    persistent ``._CURRENT.lock`` (review r14: a plain read-then-replace
    reopens a milliseconds TOCTOU where two racing flips roll _CURRENT
    backwards -- the silent-loss class). flock is advisory and released
    by the kernel on process death, so a crashed holder never wedges
    the table. The critical section is microseconds (no Spark work
    inside). Caveat: flock is only meaningful on a local/POSIX mount --
    on NFS/object stores use a real metadata service as the manifest,
    exactly as the concurrency contract says."""
    import fcntl as _fcntl
    import os as _os

    lock_path = _os.path.join(table_dir, "._CURRENT.lock")
    with open(lock_path, "a", encoding="utf-8") as lf:
        _fcntl.flock(lf, _fcntl.LOCK_EX)
        cur = _read_manifest_target(table_dir)
        committed = _version_of(cur) if cur else -1
        if cur is not None and cur.startswith(_MANIFEST_PREFIX) != snap.startswith(
            _MANIFEST_PREFIX
        ):
            # layout-mix guard, re-checked INSIDE the critical section
            # (ADVICE r14): the entry-time guard races the OTHER
            # layout's first commit -- a whole-table publish that
            # passed the guard while _CURRENT was still absent must not
            # flip a pointer table into a whole-table one (its readers
            # would silently lose every pointer-carried partition), and
            # vice versa. Same orphan disposition as the other refusals.
            raise RuntimeError(
                f"concurrent publish established the other layout: "
                f"_CURRENT -> {cur!r} but this publish composed "
                f"{snap!r}; refusing to convert the table's layout -- "
                "this publish's artifacts are left as vacuum-"
                "reclaimable orphans (the two layouts do not mix; "
                "start a fresh table dir)"
            )
        if committed > version:
            raise RuntimeError(
                f"concurrent publish won: _CURRENT already points at "
                f"version {committed} ({cur}), refusing to roll it back "
                f"to {snap}; this publish's snapshot is left as a "
                "vacuum-reclaimable orphan"
            )
        if expected_current is not _UNCHECKED and cur != expected_current:
            raise RuntimeError(
                f"concurrent publish moved _CURRENT from "
                f"{expected_current!r} to {cur!r} while this publish's "
                f"data wrote; refusing to flip {snap} composed from the "
                "stale base -- its pointers would silently revert the "
                "other publish. This snapshot/manifest are left as "
                "vacuum-reclaimable orphans; retry on the fresh base"
            )
        # commit journal (r14 review: an orphan manifest/dir from a
        # refused or killed publish is indistinguishable on disk from
        # a version that WAS current once -- so the flip, the only
        # place commits happen, records each one). Maintained INSIDE
        # the flock, updated BEFORE the _CURRENT replace, and REWRITTEN
        # atomically each flip rather than appended: the rewrite drops
        # torn fragments and any tail above the committed version (a
        # previous flip that crashed between its journal write and its
        # replace), so a crashed flip can never resurface as phantom
        # history once later commits pass its version. The reverse
        # order (replace first) would be worse: a crash would leave
        # the LIVE current version missing from history forever.
        prior = _read_journal(table_dir)
        if not prior and cur is not None:
            # journal backfill (ADVICE r15, medium): the FIRST flip of a
            # pre-journal table must not start the journal with only its
            # own commit -- once a journal exists it is the sole commit
            # authority, so every genuinely committed legacy version
            # would classify as a refused-publish orphan and be
            # reclaimed OUTRIGHT by the next vacuum, inside the
            # documented keep window. Seed the journal from the same
            # on-disk heuristic the inventory's journal-less fallback
            # uses, capped at the committed version, plus _CURRENT's own
            # target (which the heuristic can miss when the table was
            # written without _SUCCESS markers). Pre-journal committed
            # history stays committed; the heuristic's documented
            # cannot-tell-orphans-apart caveat is inherited once, at
            # upgrade time, instead of silently converting history to
            # orphans.
            legacy = {
                t
                for t in _legacy_version_targets(table_dir)
                if 0 <= _version_of(t) <= committed
            }
            legacy.add(cur)
            prior = sorted(legacy, key=_version_of)
        entries = [t for t in prior if 0 <= _version_of(t) <= committed]
        entries.append(snap)
        _rewrite_journal(table_dir, entries)
        tmp = _os.path.join(table_dir, f"._CURRENT.tmp.{version:08d}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(snap + "\n")
        _os.replace(tmp, _os.path.join(table_dir, _MANIFEST))


def _read_journal(table_dir: str) -> list[str]:
    import os as _os

    try:
        with open(
            _os.path.join(table_dir, _VERSIONS_JOURNAL), encoding="utf-8"
        ) as fh:
            return [ln.strip() for ln in fh if ln.strip()]
    except FileNotFoundError:
        return []


def _rewrite_journal(table_dir: str, entries: list[str]) -> None:
    """Atomic journal rewrite (tmp + os.replace). Callers must hold the
    _CURRENT flock -- the journal has the same single-writer-at-a-time
    contract as _CURRENT itself."""
    import os as _os

    tmp = _os.path.join(table_dir, "._VERSIONS.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(entries) + ("\n" if entries else ""))
    _os.replace(tmp, _os.path.join(table_dir, _VERSIONS_JOURNAL))


# --- incremental snapshot publish: per-partition pointer manifests (r14) ---
#
# publish_snapshot gives atomic versions but rewrites the WHOLE table
# per version; write_courses_period_incremental (pipeline/sinks.py)
# gives O(batch) refresh but mutates in place with no versioning. A
# 100 TB lake needs BOTH (VERDICT r13 item 2) -- which is exactly why
# real table formats commit file-level manifests. This is the minimal
# core of that idea: the manifest maps each partition directory to the
# snapshot that last wrote it, so an incremental publish writes ONLY
# the batch's partitions into a new snapshot dir and re-points their
# manifest entries, reusing every untouched partition's files from
# older snapshots. Readers resolve _CURRENT -> manifest -> a pinned
# list of partition dirs; no publish ever deletes a live file, so the
# racing-reader and killed-publish properties of the whole-table layer
# carry over unchanged.

_MANIFEST_PREFIX = "manifest-"


def publish_snapshot_incremental(
    df: DataFrame,
    table_dir: str,
    partition_col: str | None = None,
    *,
    verify: bool = True,
    expected_base: str | None = None,
) -> str:
    """Publish ``df`` as the table's next version, writing ONLY the
    partitions present in ``df`` -- untouched partitions are carried
    forward by manifest pointer, not by copy. Returns the new
    snapshot directory.

    The first publish on an empty table establishes the table's
    ``partition_col`` (required then; later calls may omit it and must
    not contradict the manifest). Each publish:

    1. claims the next version with an atomic ``os.mkdir`` (same
       contract as :func:`publish_snapshot`);
    2. writes the batch ``partitionBy(partition_col)`` into the claimed
       snapshot dir -- cost scales with the BATCH, never the table;
    3. composes the new pointer map = current map with the batch's
       partition dirs re-pointed at the new snapshot (a partition
       absent from the batch keeps its old pointer; dropping partitions
       is an explicit non-goal -- publish a full :func:`publish_snapshot`
       or filter at read time);
    4. audits the new snapshot (``verify=True``, ON by default since
       r15, pre-flip, same semantics as :func:`publish_snapshot` --
       a 1-partition refresh's audit runs driver-side in
       milliseconds);
    5. writes ``manifest-NNNNNNNN.json`` (unique name, never racing)
       and atomically flips ``_CURRENT`` to it, with the same
       conditional no-rollback check.

    A reader pinned to version N keeps its exact files across any
    number of later publishes (nothing it references is deleted until
    vacuum); a publish killed at any step leaves only an orphan
    snapshot dir / manifest file that ``_CURRENT`` never pointed at.

    Not compatible with a table already published by the whole-table
    :func:`publish_snapshot` (loud ValueError): the two layouts answer
    different needs and silently mixing them would let a whole-table
    reader miss pointer-carried partitions.

    Re-basing: a table refreshed partition-at-a-time accumulates live
    snapshots (each partition pins the version that last wrote it, and
    the reader unions one branch per LIVE snapshot). When the live
    snapshot count grows past a few dozen, publish the FULL table once
    through this same function: every pointer then re-points at the new
    snapshot, older snapshots drop out of the reference set, and the
    next vacuum reclaims them -- the pointer-layer analog of
    compaction. (tests pin that vacuum keeps exactly the referenced
    set, so re-base + vacuum is safe under pinned readers of KEPT
    versions only, as always.)

    Layout recipe for wide batches: ``df.repartition(partition_col)``
    before publishing. Without it every write task emits a file into
    every partition dir it holds rows for -- measured at 2000
    partitions x 32 tasks: 64k tiny files, 213 s publish and a 2x
    slower read, vs 39 s and one file per partition with the
    repartition (tools/snapshot_probe.py width receipt). The publish
    does not repartition for you because the right layout is a skew
    decision (one task per partition value concentrates a hot
    partition onto one core; salt or range-partition instead when a
    partition is huge).

    ``expected_base`` (r15 review pass 1): optimistic-concurrency CAS
    for callers whose BATCH was composed from a specific version --
    pass the manifest name ``df`` was derived from, and the publish
    refuses (retryable RuntimeError) if _CURRENT differs at entry,
    closing the read-compose-publish window the entry-time re-read
    alone cannot see. Found on :func:`rebase_pointer_table`: its df
    carries EVERY partition, so a concurrent refresh committing
    between the re-base's base read and this entry would be silently
    reverted -- the publish's own entry read would adopt the NEWER
    manifest as base and the flip's expected_current check would pass.
    Ordinary additive batches (recomputed from source, not from a
    table read) don't need it; leave None.
    """
    import os as _os

    _os.makedirs(table_dir, exist_ok=True)
    current = _read_manifest_target(table_dir)
    if expected_base is not None and current != expected_base:
        raise RuntimeError(
            f"expected_base {expected_base!r} is stale: _CURRENT is "
            f"{current!r}; the batch was composed from a version that "
            "is no longer current -- recompose and retry on the fresh "
            "base"
        )
    if current is not None:
        if not current.startswith(_MANIFEST_PREFIX):
            raise ValueError(
                f"{table_dir!r} is a whole-table snapshot table "
                f"(_CURRENT -> {current}); incremental pointer publishes "
                "do not mix with whole-table snapshots -- keep using "
                "publish_snapshot, or start a fresh table dir"
            )
        try:
            meta = _load_manifest(table_dir, current)
        except FileNotFoundError:
            # retention raced us: the manifest _CURRENT pointed at a
            # moment ago was vacuumed after a newer commit moved
            # current past it. A retryable loss, not a corrupt table
            raise RuntimeError(
                f"base manifest {current!r} was reclaimed between the "
                "_CURRENT read and its load (vacuum racing a newer "
                "commit); retry on the fresh base"
            ) from None
        if partition_col is not None and partition_col != meta["partition_col"]:
            raise ValueError(
                f"partition_col {partition_col!r} contradicts the table's "
                f"manifest ({meta['partition_col']!r})"
            )
        partition_col = meta["partition_col"]
    else:
        meta = {}
        if partition_col is None:
            raise ValueError(
                "first publish on an empty table must name partition_col"
            )

    version, snap, claim = _claim_version(table_dir)
    try:
        return _publish_incremental_claimed(
            df, table_dir, partition_col, version, snap, current, meta, verify
        )
    finally:
        claim.close()  # releases the liveness flock either way


def _publish_incremental_claimed(
    df: DataFrame,
    table_dir: str,
    partition_col: str,
    version: int,
    snap: str,
    current: str | None,
    meta: dict,
    verify: bool,
) -> str:
    """The body of publish_snapshot_incremental run while the claim
    lock is held (see _claim_version). ``meta`` is the base manifest
    loaded ONCE by the caller -- re-loading here would race retention
    a second time."""
    import json as _json
    import os as _os

    base: dict[str, str] = dict(meta.get("partitions", {}))
    snap_dir = _os.path.join(table_dir, snap)
    # mode("append") into the exclusively-claimed empty dir: never
    # pre-deletes the mkdir claim (see _claim_version)
    df.write.mode("append").partitionBy(partition_col).parquet(snap_dir)
    if verify:
        _verify_snapshot(df.sparkSession, snap_dir, snap)
    # the batch's partitions, straight from the committed layout (raw
    # Hive-escaped dir names ARE the pointer keys -- no decode/re-encode
    # round trip to get subtly wrong)
    written = sorted(
        d
        for d in _os.listdir(snap_dir)
        if _os.path.isdir(_os.path.join(snap_dir, d)) and "=" in d
    )
    base.update({d: snap for d in written})
    # record each referenced snapshot's DATA schema (the batch's
    # columns minus the partition col) in the manifest: the reader
    # then needs no footer-discovery pass at all -- at manifest widths
    # of thousands of partitions the discovery listing measurably
    # doubles the read (tools/snapshot_probe.py width receipt). Carried
    # forward and pruned to still-referenced snapshots, so the manifest
    # stays bounded by the live snapshot count.
    from pyspark.sql import types as _T

    schemas = {
        s: sch
        for s, sch in (meta.get("schemas", {}) if current else {}).items()
        if s in set(base.values())
    }
    if written:
        data_schema = _T.StructType(
            [f for f in df.schema if f.name != partition_col]
        )
        schemas[snap] = data_schema.jsonValue()
    manifest = f"{_MANIFEST_PREFIX}{version:08d}.json"
    # write the manifest ATOMICALLY (same tmp+replace recipe as the
    # _CURRENT flip, review r14): a publish killed mid-json.dump must
    # leave either no manifest or a complete one, never a truncated
    # file that breaks the NEXT vacuum's kept-manifest parse
    tmp = _os.path.join(table_dir, f".{manifest}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        _json.dump(
            {
                "format": "partition-pointers-v1",
                "version": version,
                "partition_col": partition_col,
                "partitions": base,
                "schemas": schemas,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    try:
        _os.replace(tmp, _os.path.join(table_dir, manifest))
    except FileNotFoundError:
        # the tmp manifest is written OUTSIDE the flip's flock, so
        # vacuum's versioned tmp-reclaim can remove it when a newer
        # commit passes this version mid-publish (measured in the
        # vacuum-vs-storm test). The flip's stale-base guard would
        # refuse this publish anyway -- surface the same retryable loss
        raise RuntimeError(
            f"tmp manifest for version {version} was reclaimed by "
            "vacuum (a newer commit passed this version mid-publish); "
            "retry on the fresh base"
        ) from None
    # Lost-update guard (review r14): the pointer map was composed from
    # the manifest read at ENTRY, i.e. before a data write of arbitrary
    # duration. The version-rollback check alone cannot see a
    # concurrent publisher that committed a LOWER version after our
    # claim (we hold the higher version number but the STALE base):
    # flipping would silently revert its committed pointers -- the
    # exact silent-loss class this layer exists to close. The flip
    # therefore verifies _CURRENT still equals our entry base INSIDE
    # its flock critical section (expected_current); on a move it
    # raises, our snapshot + manifest stay vacuum-reclaimable orphans,
    # and the caller retries on the fresh base.
    _flip_manifest(table_dir, version, manifest, expected_current=current)
    return snap_dir


def rebase_pointer_table(
    spark: SparkSession,
    table_dir: str,
    *,
    repartition: bool = True,
    verify: bool = True,
    vacuum_keep: int | None = None,
) -> str:
    """Re-base a pointer-manifest table: publish the FULL current
    table as one new version, so every partition pointer lands on one
    fresh snapshot and every older snapshot drops out of the reference
    set -- the pointer layer's compaction analog (VERDICT r14 item 4:
    this was a docstring recipe; now it is a function). Returns the new
    snapshot directory.

    Why: a table refreshed partition-at-a-time accumulates LIVE
    snapshots -- each partition pins the version that last wrote it,
    and the reader unions one branch per live snapshot. The read cost
    of that union grows with the live-snapshot count (measured curve in
    BASELINE.md: tools/snapshot_probe.py --rebase receipt); past a few
    dozen live snapshots, re-base. The helper is ordinary publish
    machinery end to end, so every concurrency property carries over:
    readers pinned to older versions keep their exact files, a
    concurrent incremental publish either lands before the re-base's
    base read (its refresh is included) or collides with the
    stale-base/rollback guards -- the re-base publishes with
    ``expected_base`` pinned to the manifest it read, so a refresh
    landing anywhere in its read-compose-publish window makes the
    re-base refuse retryably; nothing is silently lost -- and a killed
    re-base leaves only vacuum-reclaimable orphans.

    ``repartition=True`` (default) applies the documented wide-batch
    layout recipe -- ``df.repartition(partition_col)``, one file per
    partition instead of tasks x partitions tiny files (the measured
    64k-files anti-pattern) -- which for a FULL-table rewrite is almost
    always right. Set it False when a hot partition would concentrate
    on one core (the skew caveat) and lay the frame out yourself before
    calling.

    ``vacuum_keep``: when set, runs :func:`vacuum_snapshots` with that
    ``keep`` after the flip -- the usual re-base epilogue. Leave None
    (default) while readers may still be pinned to pre-re-base
    versions; vacuum later under the normal retention contract.
    """
    current = _read_manifest_target(table_dir)
    if current is None or not current.startswith(_MANIFEST_PREFIX):
        raise ValueError(
            f"{table_dir!r} is not a pointer-manifest table "
            f"(_CURRENT -> {current!r}); re-base only applies to "
            "partition-pointer tables"
        )
    try:
        pcol = _load_manifest(table_dir, current)["partition_col"]
        # read the EXACT manifest just resolved (not _CURRENT again) and
        # publish with expected_base=that manifest: the re-based df
        # carries every partition, so a concurrent refresh landing
        # between this read and the publish would be silently reverted
        # without the CAS (r15 review pass 1 -- the publish's own entry
        # re-read would adopt the newer manifest as base and the flip
        # guard would pass). On the retryable refusal, re-run the
        # re-base: it recomposes from fresh.
        df = _read_pointer_manifest(spark, table_dir, current)
    except FileNotFoundError:
        # same race, same retryable wrapper as the reader/publisher
        # paths: vacuum reclaimed the base manifest after a newer commit
        raise RuntimeError(
            f"base manifest {current!r} was reclaimed between the "
            "_CURRENT read and its load (vacuum racing a newer commit); "
            "retry the re-base on the fresh base"
        ) from None
    if repartition:
        df = df.repartition(pcol)
    snap_dir = publish_snapshot_incremental(
        df, table_dir, pcol, verify=verify, expected_base=current
    )
    if vacuum_keep is not None:
        try:
            vacuum_snapshots(table_dir, keep=vacuum_keep)
        except VacuumInProgress:
            # the re-base COMMITTED above; a concurrent vacuum holding
            # the single-operator lock is already doing retention work,
            # and raising here would make the committed re-base look
            # failed (a retrying caller would redo the whole rewrite).
            # The requested keep window is applied by the next vacuum.
            pass
    return snap_dir


def _read_manifest_target(table_dir: str) -> str | None:
    import os as _os

    try:
        with open(_os.path.join(table_dir, _MANIFEST), encoding="utf-8") as fh:
            return fh.read().strip()
    except FileNotFoundError:
        return None


def _load_manifest(table_dir: str, manifest_name: str) -> dict:
    import json as _json
    import os as _os

    with open(_os.path.join(table_dir, manifest_name), encoding="utf-8") as fh:
        meta = _json.load(fh)
    if meta.get("format") != "partition-pointers-v1":
        raise ValueError(
            f"unrecognized manifest format in {manifest_name!r}: "
            f"{meta.get('format')!r}"
        )
    return meta


def read_current_snapshot(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the snapshot _CURRENT points at. The returned DataFrame's
    file listing is pinned to that snapshot at analysis time, and no
    later publish deletes its files -- the r13 overwrite race cannot
    reach it. A table with no manifest is loud (never published, or
    mid-first-publish)."""
    import os as _os

    for attempt in range(2):
        snap = _read_manifest_target(table_dir)
        if snap is None:
            raise FileNotFoundError(
                f"snapshot table {table_dir!r} has no {_MANIFEST} manifest: "
                "never published (or a first publish is mid-flight); "
                "refusing to guess a snapshot"
            )
        if not snap.startswith(_MANIFEST_PREFIX):
            return spark.read.parquet(_os.path.join(table_dir, snap))
        try:
            return _read_pointer_manifest(spark, table_dir, snap)
        except FileNotFoundError:
            # retention raced us: the manifest _CURRENT pointed at was
            # vacuumed after a newer commit moved current past it --
            # the same race the PUBLISHER path wraps retryably (ADVICE
            # r14: symmetry). One fresh _CURRENT re-read resolves the
            # common shape (current already moved); a second loss in a
            # row surfaces as the retryable error, not a raw crash.
            if attempt == 0:
                continue
            raise RuntimeError(
                f"manifest {snap!r} was reclaimed between the _CURRENT "
                "read and its load twice in a row (vacuum racing newer "
                "commits); retry the read"
            ) from None


def _read_pointer_manifest(
    spark: SparkSession, table_dir: str, manifest_name: str
) -> DataFrame:
    """Assemble the pinned view of a pointer-manifest table: group the
    partition dirs by owning snapshot, read each group against its
    snapshot's basePath (so the partition column is recovered from the
    dir names), and union. The partition column is pinned to STRING
    with an explicit schema -- same posture as pipeline read_courses:
    schema-less reads run partition TYPE INFERENCE over dir names and
    silently re-type '01' -> 1 (r12 probe). unionByName with
    allowMissingColumns bridges schema evolution across snapshots (a
    column added in a later batch reads as NULL on older partitions,
    matching mergeSchema semantics)."""
    import os as _os
    from functools import reduce

    from pyspark.sql import types as _T

    meta = _load_manifest(table_dir, manifest_name)
    pcol = meta["partition_col"]
    schemas = meta.get("schemas", {})
    groups: dict[str, list[str]] = {}
    for pdir, snap in meta["partitions"].items():
        groups.setdefault(snap, []).append(pdir)
    if not groups:
        raise ValueError(
            f"pointer manifest {manifest_name!r} maps zero partitions; "
            "nothing to read (was an empty DataFrame published first?)"
        )
    parts = []
    for snap, pdirs in sorted(groups.items()):
        base = _os.path.join(table_dir, snap)
        paths = [_os.path.join(base, d) for d in sorted(pdirs)]
        if snap in schemas:
            # the publish recorded this snapshot's data schema: no
            # footer-discovery listing needed (halves the read at
            # thousands-of-partitions manifest widths)
            fields = list(_T.StructType.fromJson(schemas[snap]))
        else:
            discovered = spark.read.option("basePath", base).parquet(*paths).schema
            fields = [f for f in discovered if f.name != pcol]
        explicit = _T.StructType(
            fields + [_T.StructField(pcol, _T.StringType(), True)]
        )
        parts.append(
            spark.read.option("basePath", base).schema(explicit).parquet(*paths)
        )
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )


def list_snapshot_versions(table_dir: str) -> list[dict]:
    """Inventory of the table's COMMITTED versions, oldest first: one
    dict per version that was _CURRENT at some point, with ``version``,
    ``target`` (dir or manifest name), ``kind`` (``whole`` |
    ``pointer``), and ``current``.

    Committed-ness comes from the ``_VERSIONS`` journal the flip writes
    (r14 review: an orphan manifest from a REFUSED publish -- stale
    base, lost race -- is byte-identical on disk to a manifest that was
    current once, and a whole-table loser's dir even carries _SUCCESS;
    only the flip knows, so the flip records it). The journal is
    intersected with what still exists (vacuumed versions age out) and
    capped at the current version (a journal tail above it is a flip
    that crashed between its journal append and its _CURRENT replace
    -- never readable). Works regardless of _SUCCESS-marker
    conventions (the journal, not the marker, proves the commit).
    A journal-less table (written by a pre-journal build) falls back
    to the on-disk heuristic -- every manifest, or every _SUCCESS-
    bearing dir -- which CANNOT distinguish a refused publish's orphan
    from a real version; re-publish once to start the journal.
    Metadata-only."""
    import os as _os

    current = _read_manifest_target(table_dir)
    cur_version = _version_of(current) if current else -1
    journal = _read_journal(table_dir)
    if journal:
        # half-journaled defense (ADVICE r15): a table whose journal was
        # started WITHOUT the flip-time backfill (older build) covers
        # only versions >= its minimum entry; committed pre-journal
        # history below that range stays visible via the legacy
        # heuristic instead of vanishing from the inventory (and from
        # time travel) the moment the journal exists.
        committed = (
            sorted(_legacy_below_journal(table_dir, journal), key=_version_of)
            + journal
        )
    else:
        committed = _legacy_version_targets(table_dir)
    out = []
    seen: set[str] = set()
    for target in committed:
        v = _version_of(target)
        if target in seen or v < 0 or v > cur_version:
            continue
        seen.add(target)
        if not _os.path.exists(_os.path.join(table_dir, target)):
            continue  # vacuumed: aged out of the inventory
        out.append(
            {
                "version": v,
                "target": target,
                "kind": "pointer"
                if target.startswith(_MANIFEST_PREFIX)
                else "whole",
                "current": target == current,
            }
        )
    out.sort(key=lambda e: e["version"])
    return out


def _legacy_version_targets(table_dir: str) -> list[str]:
    """Inventory fallback for tables written before the _VERSIONS
    journal existed: every pointer manifest, or (whole-table layout)
    every _SUCCESS-bearing snapshot dir. Cannot tell a refused
    publish's orphan from a committed version -- documented caveat."""
    import os as _os

    entries = _os.listdir(table_dir)
    manifests = [
        f
        for f in entries
        if f.startswith(_MANIFEST_PREFIX)
        and f.endswith(".json")
        and _version_of(f) >= 0
    ]
    if manifests:
        return manifests
    return [
        d
        for d in entries
        if d.startswith(_SNAP_PREFIX)
        and _version_of(d) >= 0
        and _os.path.exists(_os.path.join(table_dir, d, "_SUCCESS"))
    ]


def _legacy_below_journal(table_dir: str, journal: list[str]) -> set[str]:
    """Committed pre-journal targets a half-started journal does not
    cover (ADVICE r15, medium): a journal begun by an older build (no
    flip-time backfill) contains only post-upgrade commits, so its
    minimum version bounds what it can testify about. Targets BELOW
    that range that the legacy heuristic deems committed are
    pre-journal history, not refused-publish orphans -- orphans can
    only interleave WITHIN the committed range (claims are issued above
    the then-current version, so a refusal's version always sits
    between two commits the journal records, never below its minimum;
    below-minimum non-journaled survivors of compaction would have been
    reclaimed or claim-live-skipped by a prior vacuum). Within this
    below-minimum range the legacy heuristic's documented caveat is
    inherited: it cannot tell a very-stale publisher's never-flipped
    manifest from real pre-journal history (the same ambiguity a fully
    journal-less table lives with), and it resolves it the same
    conservative way -- treat as committed, age out through the keep
    window. Returns empty for an empty journal (the caller's full
    legacy fallback applies) and when the journal already covers
    version 0."""
    if not journal:
        return set()
    jmin = min(
        (v for v in (_version_of(t) for t in journal) if v >= 0), default=-1
    )
    if jmin <= 0:
        return set()
    return {
        t
        for t in _legacy_version_targets(table_dir)
        if 0 <= _version_of(t) < jmin
    }


def read_snapshot_version(
    spark: SparkSession, table_dir: str, version: int
) -> DataFrame:
    """Time-travel read: the table exactly as version ``version``
    published it (whole-table dir or pointer manifest, resolved the
    same way read_current_snapshot resolves _CURRENT). Loud KeyError
    when that version never committed or was vacuumed -- the retention
    contract is vacuum's, not the reader's. A vacuum racing the read
    (target reclaimed between the inventory's existence check and the
    manifest load) surfaces as the same KeyError, never a raw
    FileNotFoundError (r15: the symmetry rule ADVICE r14 set for
    read_current_snapshot, applied to the time-travel path too)."""
    import os as _os

    from pyspark.errors import AnalysisException

    for entry in list_snapshot_versions(table_dir):
        if entry["version"] == version:
            try:
                if entry["kind"] == "pointer":
                    return _read_pointer_manifest(
                        spark, table_dir, entry["target"]
                    )
                if not _os.path.isdir(_os.path.join(table_dir, entry["target"])):
                    break  # dir reclaimed since the inventory listed it
                return spark.read.parquet(
                    _os.path.join(table_dir, entry["target"])
                )
            except (FileNotFoundError, AnalysisException):
                # pointer manifest / snapshot dir reclaimed mid-read:
                # the vacuumed KeyError below (whole-table reads surface
                # a vanished dir as AnalysisException, not OSError)
                break
    raise KeyError(
        f"version {version} of {table_dir!r} does not exist (never "
        "committed, or reclaimed by vacuum_snapshots)"
    )


def vacuum_snapshots(table_dir: str, keep: int = 2) -> list[str]:
    """Delete all but the newest ``keep`` snapshots, NEVER the one
    _CURRENT points at (it is force-kept even if older than the
    window). Returns the deleted snapshot names. Run only when no
    reader can still be pinned to an old snapshot (the same contract
    as any table format's retention window).

    Pointer-manifest tables: every snapshot a KEPT manifest still
    references is also kept (see the r14 comment below). An orphan
    manifest at a version ABOVE the current one (a refused or killed
    publish) is conservatively treated as possibly-live -- a publisher
    between its manifest-write and its flip looks identical -- so it
    and the snapshots it pins survive until a later successful publish
    passes its version, after which it is reclaimed.

    Committed-ness is decided by the ``_VERSIONS`` journal when one
    exists (ADVICE r14, the single-commit-authority rule shared with
    :func:`list_snapshot_versions`): only journaled targets count as
    committed history, so an orphan manifest/dir whose version the
    current one has passed can never occupy a ``keep`` slot -- before
    this, with keep=N, each such orphan displaced one genuinely
    committed version from the newest-N window and could get its
    manifest removed and snapshot dirs reclaimed INSIDE the documented
    retention window. Orphans at or below the current version (never
    journaled, claim lock not held) are provably dead -- their flip
    already refused or will refuse on the moved base -- and are
    reclaimed outright instead of aging through the window. Journal-
    less tables (pre-journal builds) fall back to the on-disk
    heuristic, exactly as the inventory does, and a HALF-journaled
    table (journal started by an older build without the flip-time
    backfill) keeps its pre-journal committed history: non-journaled
    targets below the journal's minimum version classify as committed
    via the legacy heuristic, never as orphans (ADVICE r15; see
    :func:`_legacy_below_journal` for why orphans cannot live there).
    The two commit oracles can never disagree.

    Safe against concurrent PUBLISHERS (above-current state is never
    touched, and a racing publish only references dirs the current
    manifest already protects). The single-operator contract is
    ENFORCED (VERDICT r15 item 4): a non-blocking flock on
    ``.vacuum.lock`` is held for the whole run, and a second vacuum
    refuses loudly instead of racing the first's rmtree -- same
    advisory-flock caveats as the flip lock (local/POSIX only; the
    kernel releases a crashed holder's lock, so a crashed vacuum never
    wedges the table and is safely re-run)."""
    import fcntl as _fcntl
    import os as _os

    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    with open(
        _os.path.join(table_dir, ".vacuum.lock"), "a", encoding="utf-8"
    ) as lock_fh:
        try:
            _fcntl.flock(lock_fh, _fcntl.LOCK_EX | _fcntl.LOCK_NB)
        except BlockingIOError:
            raise VacuumInProgress(
                f"another vacuum is already running on {table_dir!r}; "
                "refusing to race its rmtree (single-operator "
                "contract). Re-run when it finishes -- a crashed "
                "vacuum releases the lock and is safely re-run."
            ) from None
        return _vacuum_snapshots_locked(table_dir, keep)


class VacuumInProgress(RuntimeError):
    """Another vacuum holds this table's .vacuum.lock. A distinct type
    (still a RuntimeError, so every existing retry-on-RuntimeError
    caller treats it as the retryable loss it is) because ONE caller
    must tell it apart: ``rebase_pointer_table(vacuum_keep=...)``'s
    trailing vacuum runs AFTER its publish committed -- propagating
    this refusal there would make a committed re-base look failed."""


def _vacuum_snapshots_locked(table_dir: str, keep: int) -> list[str]:
    """vacuum_snapshots' body, called with the .vacuum.lock flock held."""
    import os as _os
    import shutil as _shutil
    import time as _time

    current = _read_manifest_target(table_dir)
    # NUMERIC version order (review r13 pass 3): lexicographic order
    # breaks at the 9th digit (snapshot-100000000 sorts before
    # snapshot-99999999) and would doom the second-newest snapshot
    snaps = sorted(
        (
            d
            for d in _os.listdir(table_dir)
            if d.startswith(_SNAP_PREFIX) and d[len(_SNAP_PREFIX):].isdigit()
        ),
        key=lambda d: int(d[len(_SNAP_PREFIX):]),
    )
    # pointer-manifest tables (r14): keep the newest ``keep`` manifests
    # (plus _CURRENT's), and every snapshot dir a kept manifest still
    # references -- a partition never rewritten keeps its original
    # snapshot dir alive across any number of later versions. Doomed
    # manifests go first, so a crash mid-vacuum never leaves a kept
    # manifest pointing at a deleted dir.
    manifests = sorted(
        (
            f
            for f in _os.listdir(table_dir)
            if f.startswith(_MANIFEST_PREFIX)
            and f.endswith(".json")
            and f[len(_MANIFEST_PREFIX):-len(".json")].isdigit()
        ),
        key=lambda f: int(f[len(_MANIFEST_PREFIX):-len(".json")]),
    )
    cur_version = _version_of(current) if current else -1
    # EVERYTHING above the current version is possibly-live (review r14:
    # a publisher between any two of its steps -- claimed dir mid-data-
    # write, manifest written but flip pending -- is indistinguishable
    # from an orphan, and deleting its dir/manifest kills the publish
    # or, worse, re-opens its claimed version for a second claimant).
    # The keep window applies only to COMMITTED history (<= current);
    # above-current artifacts become reclaimable once a later
    # successful publish moves current past them.
    #
    # Committed-ness (ADVICE r14): the _VERSIONS journal, when present,
    # is the single commit authority -- the same rule the inventory
    # applies -- so a refused publish's orphan at or below current can
    # neither occupy a keep slot nor pin its snapshots (safety: such an
    # orphan's flip provably refuses -- the same version cannot be
    # claimed twice, so current passing it means the base moved).
    # Augmented (ADVICE r15) with pre-journal committed targets below a
    # half-started journal's minimum version (_legacy_below_journal).
    # This journal read is deliberately OUTSIDE the flip flock taken
    # later for compaction, and that is safe: journal rewrites are
    # atomic tmp+replace under the flock, so this read sees a complete
    # journal from some instant; a flip landing after it only APPENDS a
    # commit above the current version this vacuum already snapshotted,
    # and every above-current target is unconditionally kept, so a
    # stale read can never doom a newly committed version.
    journal = _read_journal(table_dir)
    committed_set = set(journal) | _legacy_below_journal(table_dir, journal)
    committed_manifests = [
        m
        for m in manifests
        if _version_of(m) <= cur_version
        and (m in committed_set or not journal or m == current)
    ]
    orphan_manifests = [
        m
        for m in manifests
        if _version_of(m) <= cur_version and m not in committed_manifests
    ]
    kept_manifests = set(committed_manifests[-keep:])
    kept_manifests |= {m for m in manifests if _version_of(m) > cur_version}
    if current is not None and current.startswith(_MANIFEST_PREFIX):
        kept_manifests.add(current)
    referenced: set[str] = {current} if current else set()
    for m in sorted(kept_manifests):
        # a kept manifest that cannot be parsed must FAIL the vacuum:
        # skipping it silently would reclaim the dirs it references
        referenced |= set(_load_manifest(table_dir, m)["partitions"].values())
    for m in committed_manifests[:-keep]:
        if m not in kept_manifests:
            _os.remove(_os.path.join(table_dir, m))
    for m in orphan_manifests:
        _os.remove(_os.path.join(table_dir, m))

    if current is not None and current.startswith(_MANIFEST_PREFIX):
        # pointer table: the keep window lives on MANIFESTS; for dirs
        # the referenced set (everything any kept manifest still points
        # at) is the whole retention authority. Any dir at/below current
        # that no kept manifest references is reclaimable -- including a
        # refused publish's orphan the moment current passes it.
        reclaimable = [
            s for s in snaps if int(s[len(_SNAP_PREFIX):]) <= cur_version
        ]
    else:
        # whole-table: the journal (snapshot dir names) decides which
        # dirs are committed history subject to the keep window; non-
        # journaled dirs at/below current are refused-publish orphans,
        # reclaimable outright so they never displace a committed
        # version from the window. Journal-less legacy tables fall back
        # to version arithmetic, as everywhere.
        committed_snaps = [
            s
            for s in snaps
            if int(s[len(_SNAP_PREFIX):]) <= cur_version
            and (s in committed_set or not journal or s == current)
        ]
        orphan_snaps = [
            s
            for s in snaps
            if int(s[len(_SNAP_PREFIX):]) <= cur_version
            and s not in committed_snaps
        ]
        reclaimable = committed_snaps[:-keep] + orphan_snaps
    # a dir below current can STILL be mid-write (r14 vacuum-vs-storm
    # test: a slow publisher's claim drops below current when faster
    # publishers commit past it -- no version arithmetic can tell it
    # from a dead orphan). The claim lock the publisher holds for the
    # whole publish is the liveness proof; locked dirs are skipped.
    doomed = [
        s
        for s in reclaimable
        if s not in referenced and not _claim_is_live(table_dir, s)
    ]
    for s in doomed:
        _shutil.rmtree(_os.path.join(table_dir, s))
    # Temp manifests: reclaim only those whose embedded version is <=
    # the CURRENT version (ADVICE r13: an unconditional sweep deletes
    # the tmp file of a publish that is BETWEEN its tmp-write and its
    # os.replace right now, failing that publish with FileNotFoundError.
    # A tmp at version <= current is provably dead -- its conditional
    # flip would refuse anyway; a tmp at a higher version may belong to
    # a live concurrent publisher and is left alone).
    def _reclaim_tmp(name: str) -> None:
        # the OWNER can os.replace its tmp away between our listdir
        # and this remove (vacuum-vs-storm test); a vanished tmp is
        # exactly the state we wanted
        try:
            _os.remove(_os.path.join(table_dir, name))
        except FileNotFoundError:
            pass

    for f in _os.listdir(table_dir):
        if f.startswith("._CURRENT.tmp."):
            tail = f[len("._CURRENT.tmp."):]
            if tail.isdigit() and int(tail) <= cur_version:
                _reclaim_tmp(f)
        elif f.startswith(f".{_MANIFEST_PREFIX}") and f.endswith(".json.tmp"):
            # a pointer manifest killed mid-tmp-write; same version rule
            # (unparseable versions return -1 and are SPARED)
            if 0 <= _version_of(f[1:-len(".tmp")]) <= cur_version:
                _reclaim_tmp(f)
        elif f.startswith(".claiming-"):
            # a claim staging dir (see _claim_version): dead when its
            # .claim lock is no longer held (live ones are mid-rename)
            # -- AND old enough to be dead for sure. The grace window
            # closes the fd-rmtree-survives-rename race root-caused by
            # the r15 rebase-vs-vacuum storm: a live claimant's staging
            # phase (mkdir -> open -> flock -> rename, no Spark work
            # inside) lasts microseconds, but a probe landing in the
            # open->flock gap CAN acquire the lock and verdict "dead";
            # the fd-based rmtree it starts then follows the INODE
            # through the claimant's rename and strips .claim out of
            # the live snapshot dir, whose next liveness probe dooms it
            # MID-WRITE. A staging dir younger than the window is never
            # touched (a racing claimant is in-gap at most for
            # microseconds); one older than the window with a free lock
            # is a crashed claimant for sure (the kernel released its
            # lock at death, and no live claimant stages for 30 s).
            full = _os.path.join(table_dir, f)
            try:
                age = _time.time() - _os.stat(full).st_mtime
            except OSError:
                continue  # vanished: renamed or already reclaimed
            if (
                age > _STAGING_GRACE_SEC
                and _os.path.isdir(full)
                and not _claim_is_live(table_dir, f)
            ):
                _shutil.rmtree(full, ignore_errors=True)

    # journal compaction (r14 review: without it the inventory's cost
    # grows with all-time commit count): drop entries whose target this
    # vacuum (or a prior one) deleted. Under the flip flock -- the
    # journal shares _CURRENT's single-writer contract.
    if _os.path.exists(_os.path.join(table_dir, _VERSIONS_JOURNAL)):
        import fcntl as _fcntl

        with open(
            _os.path.join(table_dir, "._CURRENT.lock"), "a", encoding="utf-8"
        ) as lf:
            _fcntl.flock(lf, _fcntl.LOCK_EX)
            entries = _read_journal(table_dir)
            live = [
                t for t in entries if _os.path.exists(_os.path.join(table_dir, t))
            ]
            if live != entries:
                _rewrite_journal(table_dir, live)
    return doomed


def _version_of(manifest_target: str) -> int:
    """Version number embedded in a _CURRENT target (snapshot dir name
    or pointer-manifest filename); -1 for anything unparseable (then
    vacuum reclaims no tmp files -- the conservative side)."""
    tail = None
    if manifest_target.startswith(_SNAP_PREFIX):
        tail = manifest_target[len(_SNAP_PREFIX):]
    elif manifest_target.startswith(_MANIFEST_PREFIX) and manifest_target.endswith(
        ".json"
    ):
        tail = manifest_target[len(_MANIFEST_PREFIX):-len(".json")]
    if tail is not None and tail.isdigit():
        return int(tail)
    return -1
