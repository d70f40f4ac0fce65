"""Row/format-aware sources beyond parquet: CSV, JSON-lines, ORC.

The reference reads only PDFs and per-record JSON files (SURVEY.md
2.1: 'Absent from the reference: any columnar/format-aware source');
this module standardizes the engine's non-parquet ingest/egress.

Scale rules baked in:

- **explicit schema always** -- ``inferSchema`` reads the data twice
  and samples types per-run (nondeterministic at 100 TB); a declared
  StructType makes the scan single-pass and the plan stable;
- CSV/JSON are row formats: no column pruning or predicate pushdown
  at the scan. They are ingest/egress formats here -- convert to
  parquet (or ORC) at the pipeline boundary and query that;
- ORC is columnar: pushdown and pruning work as with parquet;
- writes go through the normal partitioned writer (one file per task);
  ``coalesce(1)`` only for tiny dimension exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` as csv/json/orc/parquet at ``path`` (overwrite)."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        # header on so the file round-trips by name, not position
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_format(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Read ``path`` with a declared schema (never inferred)."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)


def roundtrip(df: DataFrame, path: str, fmt: str) -> DataFrame:
    """Write ``df`` at ``path`` in ``fmt`` and read it back with the
    original schema -- the loss-check primitive used by tests and the
    source_format_roundtrip query."""
    write_format(df, path, fmt)
    return read_format(df.sparkSession, path, fmt, df.schema)


def read_resilient(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> DataFrame:
    """Lake read that survives corrupt/vanished files.

    A 100 TB lake always carries a few bad objects (truncated uploads,
    mid-compaction deletes); the default reader aborts the whole job
    on the first one, which is the wrong posture for a backfill. This
    read skips corrupt and missing files at TASK time (per-source
    options, not session-wide conf -- other reads in the same session
    keep fail-fast semantics) and relies on the explicit schema so no
    footer is consulted at planning. Pair with
    :func:`scan_corrupt_files` to AUDIT what was skipped -- silently
    dropping files without a report is how a lake rots.

    Composition with page-CRC verification (the r12 session default),
    measured: a CRC failure mid-decode makes ``ignoreCorruptFiles``
    skip the ENTIRE file -- good rows included -- with no error
    anywhere, and the footer-only audit still reports it ok (the
    footer is valid; only a data page rotted). A resilient backfill
    over checksummed files must therefore publish the DEEP audit
    (``scan_corrupt_files(..., deep=True)``) for its skip report to be
    truthful. Note also that verification fires only on pages actually
    DECODED: a count() or a projection that prunes the rotted column
    sails through either way.

    Overwrite-race composition (r13, tools/overwrite_probe.py,
    measured): a DataFrame snapshots its file listing at analysis. If
    another job OVERWRITES the directory before this one's action
    runs, the fail-fast reader dies LOUDLY (FAILED_READ_FILE.
    FILE_NOT_EXIST) -- but THIS reader's ``ignoreMissingFiles``
    resolves every vanished file to nothing and returns **0 rows with
    no error**. A resilient read must therefore never span a window in
    which its source can be overwritten; for partitioned refresh use
    dynamic partition overwrite
    (``sinks.write_courses_period_incremental``), which deletes only
    the partitions it replaces.
    """
    return (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .option("ignoreMissingFiles", "true")
        .format(fmt)
        .load(path)
    )


def _leaf_data_files_df(spark: SparkSession, path: str) -> DataFrame:
    """DISTRIBUTED recursive leaf-data-file lister for a lake table:
    returns a one-column ``file`` DataFrame. The driver lists only the
    table ROOT (one readdir, width = the partition count); each visible
    top-level directory becomes one task that walks its own subtree
    executor-side -- the r14 posture shared with
    ``audit_write_artifacts``: at millions of files the listing divides
    by cluster width instead of serializing on the driver.

    A real lake table is a TREE, not a flat directory: Hive-style
    partition subdirectories (``key=val/``), nested ``table.parquet/``
    dirs, plus ``_SUCCESS``/checksum/hidden markers at every level.
    The audit must probe exactly the leaf files a reader would consume
    -- skipping ``_``/``.``-prefixed entries (directories AND files) at
    every depth, and never probing a directory as if it were a file
    (``open(dir)`` raises, which would report a healthy partition dir
    as corrupt). A single file path returns itself; a path that exists
    as NEITHER raises FileNotFoundError (driver-side, eagerly), so a
    typo'd table name fails loudly instead of producing a plausible
    one-'corrupt'-file audit whose error row is just the probe's own
    ENOENT (ADVICE r9).
    """
    import os as _os

    import pandas as _pd

    if not _os.path.isdir(path):
        if not _os.path.isfile(path):
            raise FileNotFoundError(
                f"lake-table audit: {path!r} is neither a file nor a "
                "table directory -- a missing table must be "
                "distinguishable from a corrupt one (raised for "
                "scan_corrupt_files / scan_schema_drift)"
            )
        return spark.createDataFrame([(path,)], "file string")

    entries = sorted(_os.listdir(path))
    seeds: list[tuple[str, bool]] = []
    for e in entries:
        if e.startswith(("_", ".")):
            continue
        full = _os.path.join(path, e)
        seeds.append((full, _os.path.isdir(full)))
    if not seeds:
        return spark.createDataFrame([], "file string")

    def _ls(batches):
        for pdf in batches:
            out: list[str] = []
            for p, is_dir in zip(pdf["p"], pdf["is_dir"]):
                if not is_dir:
                    out.append(p)
                    continue
                for root, dirnames, filenames in _os.walk(p):
                    dirnames[:] = sorted(
                        d for d in dirnames if not d.startswith(("_", "."))
                    )
                    out.extend(
                        _os.path.join(root, f)
                        for f in filenames
                        if not f.startswith(("_", "."))
                    )
            yield _pd.DataFrame({"file": out})

    seeds_df = spark.createDataFrame(seeds, "p string, is_dir boolean").repartition(
        max(1, min(len(seeds), spark.sparkContext.defaultParallelism))
    )
    return seeds_df.mapInPandas(_ls, "file string")


def scan_corrupt_files(
    spark: SparkSession, path: str, fmt: str = "parquet", deep: bool = False
) -> DataFrame:
    """Distributed corruption audit: (file, ok, error) per data file.

    The LISTING is distributed too (r14, via
    :func:`_leaf_data_files_df`: the driver lists only the table root;
    one task per top-level dir walks its subtree -- partition
    subdirectories like ``key=val/`` are audited, matching what
    :func:`read_resilient` actually reads), then a tiny file-name
    shuffle spreads the probes across the cluster's full parallelism;
    footer/readability probes run on executors via mapInPandas
    (pyarrow metadata read for parquet -- a few KB per file -- full
    decode for row formats), so neither the listing nor the probing
    serializes on the driver. The result is the skip report a
    :func:`read_resilient` backfill publishes next to its output.

    ``deep=True`` (parquet) fully decodes every column with page-CRC
    verification (``page_checksum_verification``), because the default
    footer-only probe is BLIND to bitrot under a valid footer -- and
    that is exactly the class a resilient backfill now silently drops
    whole files over (r12 measured composition: with page verification
    on -- the session default -- ``ignoreCorruptFiles`` treats a CRC
    failure as a corrupt FILE and skips ALL of it, good rows included,
    with the footer audit still reporting ok=true; pinned in
    tests/test_bitrot.py). Deep costs a full decode per file instead
    of a few KB (streamed one row group at a time, so worker memory is
    bounded by row-group size, not file size), distributed across
    executors like the cheap probe --
    run it when the table's writers emit page CRCs and the read posture
    is resilient-skip, so the skip report is truthful. On CRC-less
    files deep still catches decode-breaking rot (3/12 classes in the
    r11 matrix) but not silent value rot -- write-side CRCs remain the
    only complete answer.
    """
    import pandas as _pd

    # distributed listing (r14) + a tiny file-NAME shuffle so probe
    # parallelism is the cluster's, not the tree's top-level width (a
    # flat 10k-file dir would otherwise probe in ONE task)
    files = _leaf_data_files_df(spark, path).repartition(
        spark.sparkContext.defaultParallelism
    )

    def probe(batches):
        for pdf in batches:
            oks, errs = [], []
            for f in pdf["file"]:
                try:
                    if fmt == "parquet":
                        import pyarrow.parquet as _pq

                        if deep:
                            # full decode, every page CRC verified --
                            # row group at a time, so executor memory
                            # holds one row group, never a whole
                            # multi-GB file (review r12)
                            with _pq.ParquetFile(
                                f, page_checksum_verification=True
                            ) as pf:
                                for rg in range(pf.num_row_groups):
                                    pf.read_row_group(rg)
                        else:
                            _pq.ParquetFile(f)  # footer + magic validation
                    else:
                        with open(f, "rb") as fh:
                            fh.read()
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 -- the audit IS the catch
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {str(e)[:200]}")
            yield _pd.DataFrame({"file": pdf["file"], "ok": oks, "error": errs})

    return files.mapInPandas(probe, "file string, ok boolean, error string")


def scan_schema_drift(spark: SparkSession, path: str) -> DataFrame:
    """Distributed schema census over a lake table's parquet footers:
    one row per column name with the set of physical Arrow types it
    carries across files and how many files carry it at all ->
    (column, types, n_types, n_files_present, n_files_total, drift).

    ``drift`` classifies what a reader is about to walk into:

    - ``type_conflict``: the same column name lands with DIFFERENT
      types across files -- the class where the r11 schema-drift probe
      (tools/schema_drift_probe.py) measured the nastiest postures
      (Spark's plain read can silently decode through a footer-order
      accident or fail at task level mid-job; DuckDB union_by_name
      silently widens);
    - ``partial``: the column is absent from some files (additive
      drift, either half of a rename, or a dropped column) -- reads
      NULL-fill, so aggregates silently change denominator;
    - ``stable``: same type everywhere, every file.

    The census is footers-only (a few KB per file, via pyarrow on the
    executors -- the scan_corrupt_files shape), so it is the cheap
    pre-flight a 100 TB ingest runs BEFORE choosing its reader
    posture: mergeSchema for additive drift, an explicit per-batch
    cast-and-union for type conflicts, never first-footer luck. A file
    whose footer cannot be read is REPORTED, not fatal (the pre-flight
    must not be the first thing a bad file kills -- review r11): it
    lands as the reserved ``<unreadable>`` row with drift
    ``unreadable`` and the error strings in ``types``; route such
    files through scan_corrupt_files / read_resilient. With bad files
    present, ``n_files_total`` counts the READABLE footers (an
    unreadable footer says nothing about column membership), so a
    column present in every readable file stays ``stable`` and the
    ``<unreadable>`` row is the sole signal for the bad files.
    """
    import pandas as _pd

    # distributed listing (r14), single pass: the all-files total is
    # derived from the probe output itself via a grouping-sets grand
    # row (review r14: a separate count() job would re-list the tree
    # AND let the denominator disagree with the file set actually
    # probed when the table is being written concurrently).
    files = _leaf_data_files_df(spark, path).repartition(
        spark.sparkContext.defaultParallelism
    )

    def probe(batches):
        for pdf in batches:
            out_f, out_c, out_t, out_e = [], [], [], []
            for f in pdf["file"]:
                import pyarrow.parquet as _pq

                try:
                    sch = _pq.ParquetFile(f).schema.to_arrow_schema()
                except Exception as e:  # noqa: BLE001 -- the census IS the catch
                    out_f.append(f)
                    out_c.append("<unreadable>")
                    out_t.append(f"{type(e).__name__}: {str(e)[:120]}")
                    out_e.append(True)
                    continue
                if not len(sch):
                    # a readable footer with ZERO schema fields (review
                    # r14): without a row the file would vanish from
                    # the grand-row denominator, silently hiding both
                    # itself and the 'partial' drift it implies for
                    # every real column. Reserved name, like
                    # '<unreadable>' -- and itself a drift signal
                    out_f.append(f)
                    out_c.append("<no_columns>")
                    out_t.append("")
                    out_e.append(False)
                    continue
                for field in sch:
                    out_f.append(f)
                    out_c.append(field.name)
                    out_t.append(str(field.type))
                    out_e.append(False)
            yield _pd.DataFrame(
                {"file": out_f, "column": out_c, "ctype": out_t, "is_err": out_e}
            )

    cols = files.mapInPandas(
        probe, "file string, column string, ctype string, is_err boolean"
    )
    # is_err is part of the GROUP KEY (ADVICE r12): a real data column
    # literally named '<unreadable>' must never share a group with
    # probe-failure rows -- merged, the whole group would be labeled
    # 'unreadable' and the real column's own type_conflict/partial
    # drift would be hidden. Grouped apart, such a corpus yields two
    # rows for the name: the failure row and the genuine column's row,
    # each with its own drift class. The output schema is unchanged.
    # GROUPING SETS: the per-(column, is_err) detail rows PLUS one
    # grand row whose count_distinct(file) is the all-files total
    # (every file yields >= 1 probe row: its schema rows or its
    # '<unreadable>' row) and whose _n_err is the distinct unreadable
    # files -- the census denominators, from the SAME single pass.
    agg = cols.groupingSets([["column", "is_err"], []], "column", "is_err").agg(
        F.array_join(F.array_sort(F.collect_set("ctype")), ",").alias("types"),
        F.count_distinct("ctype").alias("n_types"),
        F.count_distinct("file").alias("n_files_present"),
        # probe-failure files in this group -- carried as a FLAG, not
        # inferred from the reserved '<unreadable>' name, so a real
        # column that happens to be named '<unreadable>' cannot poison
        # the readable-file denominator (review r12)
        F.count_distinct(F.when(F.col("is_err"), F.col("file"))).alias("_n_err"),
        F.grouping_id().alias("_gid"),
    )
    # the 'partial' denominator counts READABLE footers only (ADVICE
    # r11): an unreadable file says nothing about which columns it
    # carries, so counting it in n_files_total would mislabel every
    # fully-present column 'partial' exactly in the corrupted-lake
    # scenario the census targets. Derived lazily from the aggregate
    # itself -- the whole-frame window runs over one row per column
    # name (bounded by schema width), not over the footer scan.
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    _grand = F.col("_gid") == 3  # both grouping cols aggregated away
    n_all = F.max(F.when(_grand, F.col("n_files_present"))).over(w)
    n_err_all = F.max(F.when(_grand, F.col("_n_err"))).over(w)
    n_readable = (n_all - n_err_all).cast("long")
    return (
        agg.select(
            "column",
            "types",
            "n_types",
            "n_files_present",
            n_readable.alias("n_files_total"),
            F.when(F.col("_n_err") > 0, "unreadable")
            .when(F.col("n_types") > 1, "type_conflict")
            .when(F.col("n_files_present") < n_readable, "partial")
            .otherwise("stable")
            .alias("drift"),
            F.col("_gid"),
        )
        .filter(F.col("_gid") == 0)
        .drop("_gid")
    )


#: Spark/Hadoop committed-part naming: the 36-char writer-job UUID is
#: the committer's job identity, shared by every part of ONE write
_PART_UUID_RX = None  # compiled lazily (module import stays regex-free)


def audit_write_artifacts(
    spark: SparkSession,
    path: str,
    *,
    expect_success: bool = True,
    max_driver_files: int = 256,
) -> DataFrame:
    """Torn-write / job-failure artifact audit: (file, issue) report,
    EMPTY when the directory is a clean single-job commit (r13 axis,
    tools/torn_write_probe.py).

    What a killed or doubly-retried write job leaves behind, and what
    each engine then does -- measured, not assumed:

    - ``temporary_residue``: a ``_temporary/`` tree (FileOutputCommitter
      v1 staging) survives a driver kill. Spark hides ``_``-prefixed
      paths and reads correctly; DuckDB's recursive glob
      (``dir/**/*.parquet``) reads the staged attempts as data --
      SILENT cross-engine divergence (+phantom rows) with zero errors.
    - ``orphan_writer_uuid``: a committed-looking part file from a
      DIFFERENT writer job (committer-v2 crash, speculative attempt,
      manual copy) sits next to the real parts. BOTH engines silently
      double-count it -- the worst class: no divergence to notice,
      both engines agree on the wrong answer. Detected as a minority
      writer-job UUID among the part names. CAVEAT: a table built by
      legitimate ``append`` writes carries one UUID per append -- this
      issue is a torn-OVERWRITE signal; on append-mode tables treat it
      as provenance info, not damage.
    - ``ambiguous_writer_uuids``: two or more writer jobs TIE for the
      largest part count (the common shape of a retried write at the
      same parallelism, or a 1-1 single-part collision) -- the audit
      cannot know which tied job was the commit and refuses to guess,
      so every part of every TIED group carries this issue instead.
      Groups strictly below the tied maximum are orphans regardless
      of which tied job committed and keep ``orphan_writer_uuid``.
    - ``zero_byte``: a torn 0-byte part. Spark SKIPS it silently even
      with ignoreCorruptFiles=false (a zero-length file yields no read
      splits); DuckDB refuses the whole glob LOUDLY. One engine's
      invisible is the other's outage.
    - ``missing_success``: no ``_SUCCESS`` marker at the table root --
      the write job never committed, yet Spark reads whatever parts
      exist with no signal. Disable with ``expect_success=False`` for
      tables whose writers suppress the marker
      (mapreduce.fileoutputcommitter.marksuccessfuljobs=false).

    Metadata-only (names + sizes, no file reads) -- and the listing is
    DISTRIBUTED (VERDICT r13 item 3): the driver lists only the table
    root (one shallow readdir, width = the partition count); each
    visible top-level directory becomes one mapInPandas task that walks
    its own subtree executor-side, returning its findings plus a
    per-directory writer-UUID census (uuid, count) -- tiny by
    construction, a handful of rows per write job, never one row per
    file. The UUID majority/tie logic is a GLOBAL aggregate, so it
    runs driver-side on that collected census; when (and only when)
    minority/tied UUIDs exist, a second distributed pass names the
    affected files -- the flagged set is the actual damage, not the
    table. A clean table (the common case) costs exactly one
    distributed walk and ships no per-file rows anywhere. Same shared-
    filesystem requirement as every executor-side path here
    (write_per_record_json et al.); compose with
    :func:`scan_corrupt_files` (content) and
    :func:`scan_schema_drift` (schema) for the full pre-flight. The
    posture this audit buys at 100 TB: publish it before promoting any
    backfill output, because the one class both engines agree on
    (orphan parts) is exactly the one no read-side check can see.

    ``max_driver_files`` (r15, VERDICT r14 item 5): a scope whose
    visible file count stays at or under this bound is audited
    entirely DRIVER-SIDE -- same walk generators, same issue classes,
    same majority/tie logic, zero Spark jobs until the local-relation
    report materializes. The distributed walk's fixed cost (two task
    schedulings + Python worker spin-up, measured ~3.5 s) dwarfs a
    32-file listing, which is exactly the shape of an incremental
    publish's verify= -- the fix that lets verify default-on for
    snapshot publishes. Scopes that exceed the bound take the
    distributed path unchanged (the bounded pre-walk stops early, so
    a 100 TB table pays a few hundred stats, not a full listing);
    pass ``max_driver_files=0`` to force the distributed path.
    """
    import os as _os

    if not _os.path.isdir(path):
        if not _os.path.isfile(path):
            raise FileNotFoundError(
                f"write-artifact audit: {path!r} is neither a file nor "
                "a table directory (same loud-on-typo contract as "
                "scan_corrupt_files)"
            )
        return spark.createDataFrame([], "file string, issue string")

    rows, starts = _root_audit_plan(path, expect_success)
    return _audit_subtree_report(spark, rows, starts, max_driver_files)


def _root_audit_plan(
    path: str, expect_success: bool
) -> tuple[list[tuple[str, str]], list[tuple[str, bool]]]:
    """Driver-side root classification shared by the DataFrame and
    collected entry points: ONE shallow listing of the table root --
    top-level findings plus the visible subtrees to fan out as walk
    tasks. A shallow task audits the files sitting directly at the
    root."""
    import os as _os

    entries = sorted(_os.listdir(path))
    rows: list[tuple[str, str]] = []
    starts: list[tuple[str, bool]] = [(path, True)]
    for e in entries:
        if _os.path.isdir(_os.path.join(path, e)):
            if e == "_temporary":
                rows.append((_os.path.join(path, e), "temporary_residue"))
            elif not e.startswith(("_", ".")):
                starts.append((_os.path.join(path, e), False))
    if expect_success and "_SUCCESS" not in entries:
        rows.append((path, "missing_success"))
    return rows, starts


def collect_write_artifacts(
    spark: SparkSession,
    path: str | list[str],
    *,
    expect_success: bool = True,
    max_driver_files: int = 256,
) -> list[tuple[str, str]]:
    """The audit as COLLECTED ``(file, issue)`` tuples -- for callers
    that immediately raise on findings (the snapshot layer's pre-flip
    ``verify=``; the in-place sink paths keep the DataFrame form,
    whose report is their documented injection seam). On a scope under
    ``max_driver_files`` this runs ZERO Spark jobs: even an empty
    local-relation report costs a ~0.3 s job scheduling (measured,
    BASELINE.md r15 receipt), which was most of what remained of
    verify='s fixed overhead once the listing went driver-side.
    ``path`` may be a table root (``_SUCCESS`` semantics of
    :func:`audit_write_artifacts`) or an explicit list of partition
    dirs (semantics of :func:`audit_write_artifact_dirs`). A PLAIN
    FILE path returns ``[]`` (a single file has no directory layout to
    audit -- no staging leftovers, no marker conventions), matching
    the DataFrame twin's empty report for the same input; only a path
    that exists as NEITHER file nor directory raises, the loud-on-typo
    asymmetry being deliberate: silence means "audited, clean", never
    "target absent"."""
    import os as _os

    if isinstance(path, list):
        for d in path:
            if not _os.path.isdir(d):
                raise FileNotFoundError(
                    f"write-artifact audit: {d!r} is not a directory "
                    "(same loud-on-typo contract as scan_corrupt_files)"
                )
        rows, starts = [], [(d, False) for d in path]
    else:
        if not _os.path.isdir(path):
            if not _os.path.isfile(path):
                raise FileNotFoundError(
                    f"write-artifact audit: {path!r} is neither a file "
                    "nor a table directory (same loud-on-typo contract "
                    "as scan_corrupt_files)"
                )
            return []
        rows, starts = _root_audit_plan(path, expect_success)
    if max_driver_files > 0:
        small = _driver_audit_under_cap(rows, starts, max_driver_files)
        if small is not None:
            return sorted(small)
    report = _audit_subtree_report(spark, rows, starts, 0)
    return [(r["file"], r["issue"]) for r in report.collect()]


def audit_write_artifact_dirs(
    spark: SparkSession, dirs: list[str], *, max_driver_files: int = 256
) -> DataFrame:
    """Audit an explicit list of directory subtrees as ONE scope in ONE
    distributed job: findings pooled, writer-UUID census pooled (right
    when the dirs were written by the same job -- e.g. the partitions
    one dynamic-overwrite batch touched; see
    ``pipeline.sinks.write_courses_period_incremental(verify=True)``,
    whose per-dir loop this replaces: N sequential Spark jobs of
    scheduling overhead for a metadata-only check, review r14). No
    ``_SUCCESS`` check (the marker lives at the table root, not in
    partition subdirs). Same issue classes/tie semantics and same
    ``max_driver_files`` small-scope short-circuit as
    :func:`audit_write_artifacts`."""
    import os as _os

    for d in dirs:
        if not _os.path.isdir(d):
            raise FileNotFoundError(
                f"write-artifact audit: {d!r} is not a directory (same "
                "loud-on-typo contract as scan_corrupt_files)"
            )
    return _audit_subtree_report(
        spark, [], [(d, False) for d in dirs], max_driver_files
    )


def _audit_subtree_report(
    spark: SparkSession,
    local_rows: list[tuple[str, str]],
    starts: list[tuple[str, bool]],
    max_driver_files: int = 0,
) -> DataFrame:
    """The audit engine shared by the whole-table and explicit-dirs
    entry points: fan ``starts`` out as walk tasks (``shallow=True``
    lists files at that level only), pool the findings + writer-UUID
    census, apply the global majority/tie logic, and name flagged
    files with a second pass only when a minority/tied UUID exists.
    Scopes at or under ``max_driver_files`` visible files run the
    identical logic driver-side with zero Spark jobs (r15; the bounded
    pre-walk abandons at the cap, so big scopes pay a few hundred
    stats, never a full driver listing)."""
    import os as _os

    import pandas as _pd

    from pyspark.sql import functions as _F

    schema = "file string, issue string"
    if max_driver_files > 0:
        small = _driver_audit_under_cap(local_rows, starts, max_driver_files)
        if small is not None:
            return spark.createDataFrame(sorted(small), schema)
    rows = list(local_rows)
    tasks = spark.createDataFrame(
        starts, "start string, shallow boolean"
    ).repartition(max(1, min(len(starts), spark.sparkContext.defaultParallelism)))

    def _audit_subtrees(batches, emit_uuids: frozenset | None = None):
        """One task per subtree: walk, stat, census.
        ``emit_uuids=None`` -> phase 1 (findings + per-dir uuid census);
        a frozenset -> phase 2 (name the files of the flagged uuids)."""
        for pdf in batches:
            out_file, out_issue, out_uuid, out_n = [], [], [], []
            for start, shallow in zip(pdf["start"], pdf["shallow"]):
                census: dict[str, int] = {}
                it = _shallow_files(start) if shallow else _walk_visible(start)
                for full, kind in it:
                    if kind == "dir_temporary":
                        if emit_uuids is None:
                            out_file.append(full)
                            out_issue.append("temporary_residue")
                            out_uuid.append(None)
                            out_n.append(None)
                        continue
                    name = _os.path.basename(full)
                    if _os.path.getsize(full) == 0:
                        if emit_uuids is None:
                            out_file.append(full)
                            out_issue.append("zero_byte")
                            out_uuid.append(None)
                            out_n.append(None)
                        continue
                    m = _part_uuid_rx().match(name)
                    if m:
                        u = m.group(1)
                        if emit_uuids is None:
                            census[u] = census.get(u, 0) + 1
                        elif u in emit_uuids:
                            out_file.append(full)
                            out_issue.append(None)
                            out_uuid.append(u)
                            out_n.append(None)
                for u, n in census.items():
                    out_file.append(None)
                    out_issue.append(None)
                    out_uuid.append(u)
                    out_n.append(n)
            yield _pd.DataFrame(
                {"file": out_file, "issue": out_issue, "uuid": out_uuid, "n": out_n}
            )

    phase1 = tasks.mapInPandas(
        _audit_subtrees, "file string, issue string, uuid string, n long"
    ).collect()

    uuid_counts: dict[str, int] = {}
    for r in phase1:
        if r["n"] is not None:
            uuid_counts[r["uuid"]] = uuid_counts.get(r["uuid"], 0) + r["n"]
        else:
            rows.append((r["file"], r["issue"]))

    flagged: dict[str, str] = {}
    if len(uuid_counts) > 1:
        # majority job = the commit; every other UUID's parts flagged.
        # A TIE for the maximum means the audit cannot know which of
        # the TIED jobs was the commit (review r13: one real part +
        # one orphan part is exactly a 1-1 tie, and guessing
        # lexicographically could flag the REAL file as the orphan) --
        # tied-for-max groups are reported ambiguous. Groups strictly
        # BELOW the maximum are orphans regardless of which tied job
        # committed, so their certain signal is kept (review r13 #2:
        # a 5-5 retry tie plus a 1-part speculative stray must still
        # name the stray an orphan).
        top = max(uuid_counts.values())
        tied = sum(1 for n in uuid_counts.values() if n == top)
        for u, n in uuid_counts.items():
            if n < top:
                flagged[u] = "orphan_writer_uuid"
            elif tied > 1:
                flagged[u] = "ambiguous_writer_uuids"

    local = spark.createDataFrame(sorted(rows), schema)
    if not flagged:
        return local

    # phase 2 (torn tables only): a second distributed pass names the
    # files of the flagged writer jobs -- output bounded by the damage
    emit = frozenset(flagged)
    issue_expr = _F.col("uuid")
    for u, iss in flagged.items():
        issue_expr = _F.when(_F.col("uuid") == u, _F.lit(iss)).otherwise(issue_expr)
    named = (
        tasks.mapInPandas(
            lambda batches: _audit_subtrees(batches, emit),
            "file string, issue string, uuid string, n long",
        )
        .select("file", issue_expr.alias("issue"))
    )
    return local.unionAll(named)


def _driver_audit_under_cap(
    local_rows: list[tuple[str, str]],
    starts: list[tuple[str, bool]],
    cap: int,
) -> list[tuple[str, str]] | None:
    """Driver-side twin of the distributed audit for small scopes:
    walks the same generators, applies the same issue classes and the
    same global majority/tie rule, in one pass (phase 2 is free -- the
    file list is already in hand). Returns None the moment the walk
    exceeds ``cap`` visible entries; the caller then distributes."""
    import os as _os

    entries: list[tuple[str, str]] = []
    for start, shallow in starts:
        it = _shallow_files(start) if shallow else _walk_visible(start)
        for full, kind in it:
            entries.append((full, kind))
            if len(entries) > cap:
                return None
    rows = list(local_rows)
    census: dict[str, int] = {}
    by_uuid: dict[str, list[str]] = {}
    for full, kind in entries:
        if kind == "dir_temporary":
            rows.append((full, "temporary_residue"))
            continue
        if _os.path.getsize(full) == 0:
            rows.append((full, "zero_byte"))
            continue
        m = _part_uuid_rx().match(_os.path.basename(full))
        if m:
            u = m.group(1)
            census[u] = census.get(u, 0) + 1
            by_uuid.setdefault(u, []).append(full)
    if len(census) > 1:
        top = max(census.values())
        tied = sum(1 for n in census.values() if n == top)
        for u, n in census.items():
            if n < top:
                rows.extend((f, "orphan_writer_uuid") for f in by_uuid[u])
            elif tied > 1:
                rows.extend((f, "ambiguous_writer_uuids") for f in by_uuid[u])
    return rows


def _part_uuid_rx():
    """Compiled-on-first-use part-name matcher (module import stays
    regex-free); safe to call executor-side."""
    import re as _re

    global _PART_UUID_RX
    if _PART_UUID_RX is None:
        _PART_UUID_RX = _re.compile(
            r"part-\d+-([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
            r"-[0-9a-f]{4}-[0-9a-f]{12})"
        )
    return _PART_UUID_RX


def _shallow_files(root: str):
    """The sentinel root task: files sitting directly at the table
    root (no descent -- every subtree is some other task's job)."""
    import os as _os

    for f in sorted(_os.listdir(root)):
        full = _os.path.join(root, f)
        if _os.path.isfile(full) and not f.startswith(("_", ".")):
            yield full, "file"


def _walk_visible(start: str):
    """Walk one subtree with the audit's visibility rules: hidden trees
    are pruned (their contents are not N findings), a nested
    ``_temporary`` dir is itself the single residue finding."""
    import os as _os

    for root, dirs, files in _os.walk(start):
        for dname in list(dirs):
            if dname == "_temporary":
                yield _os.path.join(root, dname), "dir_temporary"
            if dname.startswith(("_", ".")):
                dirs.remove(dname)
        for f in sorted(files):
            if not f.startswith(("_", ".")):
                yield _os.path.join(root, f), "file"
