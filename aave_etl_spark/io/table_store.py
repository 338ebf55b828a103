"""Partitioned table store reproducing the reference's BigQuery IO-manager
semantics on Parquet (reference: aave_data/resources/bigquery_io_manager.py).

Mapping (SURVEY.md §2.1 sinks):

- K1 partition overwrite: the reference deletes the partition slice
  (``DELETE ... WHERE _dagster_partition_key='...'``, bigquery_io_manager.py:231-249)
  then appends. Spark's *dynamic partition overwrite* is exactly
  delete-then-write, executed scalably per partition directory — no
  table-wide rewrite, no driver-side row movement.
- K2 append-only: ``mode("append")`` (bigquery_io_manager.py:116-119).
- K3 partition-pruned read: predicate on the partition column reaches the
  file listing (Catalyst partition pruning), reproducing
  ``WHERE _dagster_partition_key = '...'`` (bigquery_io_manager.py:297-316);
  a missing table returns an empty DataFrame (``:277-294``).
- Metadata columns ``_load_timestamp/_partition_type/_partition_key`` mirror
  the ``_dagster_*`` columns (bigquery_io_manager.py:152-160); reads strip
  them like the reference's ``SELECT * EXCEPT`` (``:310-316``).

At 100 TB: partition layout is ``(date, market)``-style low-cardinality
directories; writes touch only the partitions present in the output
DataFrame, so daily incremental loads scale with the day's data, not the
table's history.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from aave_etl_spark.localframe import local_df

META_COLS = ("_load_timestamp", "_partition_type", "_partition_key")

# Table-schema memo: every bare spark.read.parquet(dir) launches one
# footer-inference driver job (~30-40 ms) — across the at-rest families
# that is dozens of jobs per bench pass for schemas that cannot change
# between a table's write and its reads (the catalog._SCHEMA_CACHE
# discipline applied to the store). Keyed by table path; EVERY mutating
# method invalidates its table's entry (write/merge/compact/restore/
# drop), so a rewritten table is always re-inferred. Metadata only —
# never row data — and per-process, so nothing survives across runs.
_SCHEMA_MEMO: dict[str, StructType] = {}


def _schema_memo_invalidate(path: str) -> None:
    _SCHEMA_MEMO.pop(path, None)


def morton_zkey(
    cols: list[str], mins: list[float], maxs: list[float], bits: int = 16
) -> F.Column:
    """Z-order (Morton) key over ``cols``: each column min-max scales to a
    ``bits``-wide unsigned int, then the bits interleave — bit ``i`` of
    dimension ``j`` lands at position ``i*d + j`` of the key.

    Interleaving is what makes the key MULTI-dimensional: a contiguous
    z-range is a small hyper-rectangle, so sort-clustering files by the
    key gives every clustered dimension usable per-file min/max footers —
    a selective predicate on ANY of them (not just the first sort column,
    the lexicographic layout's limit) skips row groups. This is the
    OPTIMIZE ZORDER pattern of the lakehouse formats, re-expressed as
    plain Spark integer expressions over open parquet.

    ``mins``/``maxs`` are the scaling anchors (computed once at write
    time, 2·d scalars). NULL dimension values scale to 0 (cluster first);
    a constant column (min == max) contributes zeros and costs layout
    nothing. Pure JVM-side integer math — shiftleft/shiftright/AND/OR —
    so the key is codegen-friendly and engine-reproducible."""
    d = len(cols)
    if d < 1:
        raise ValueError("morton_zkey needs at least one column")
    if bits * d > 62:
        raise ValueError(f"bits*dims must fit a signed long: {bits}*{d} > 62")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        # guard ONLY the degenerate hi == lo case — clamping small spans
        # to 1 would collapse sub-unit ranges (ratio columns span [0, 1])
        # to a constant 0 and silently drop the dimension from the layout
        span = float(hi - lo) if hi > lo else 1.0
        # coalesce BEFORE the clamp: Spark's least/greatest skip NULLs
        # (least(top, NULL) = top), so a NULL dim would clamp to the top
        # bucket instead of 0. Multiply BEFORE dividing: (1/3)*3 floors
        # to 0 in doubles, (1*3)/3 floors to 1 — exact small ratios must
        # land on their bucket.
        scaled = F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.lit(top).cast("long"),
                F.coalesce(
                    F.floor(
                        (F.col(c).cast("double") - float(lo)) * top / span
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ),
            ),
        )
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(scaled, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    return z


def _zorder_anchors(df: DataFrame, cols: list[str]) -> tuple[list[float], list[float]]:
    """One bounded job: the 2·d min/max scaling anchors for a Morton key —
    shared by write() and compact() so write-time and maintenance-time
    layouts can never disagree."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [row[f"_lo{i}"] if row[f"_lo{i}"] is not None else 0.0 for i in range(len(cols))]
    maxs = [row[f"_hi{i}"] if row[f"_hi{i}"] is not None else 0.0 for i in range(len(cols))]
    return mins, maxs


class TableStore:
    """A directory-of-parquet-tables warehouse with idempotent partition
    overwrite."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        self._recover_interrupted_compact(name)
        return os.path.isdir(self._path(name))

    # --- multi-table completion markers -----------------------------------
    # A logical dataset spanning several tables (e.g. an IVF index =
    # assignments + centroids sidecar) has no single atomic write; the
    # marker is written LAST (tmp + atomic rename) and checked FIRST, so an
    # interrupted multi-table build/rebuild can never present a mutually
    # inconsistent pair as complete. Writers call clear_complete() before
    # touching any member table and mark_complete() after the last one.
    def mark_complete(self, tag: str) -> None:
        path = os.path.join(self.root, f"{tag}.__complete")
        tmp = path + ".__tmp"
        os.makedirs(self.root, exist_ok=True)
        with open(tmp, "w") as f:
            f.write(tag)
        os.replace(tmp, path)

    def clear_complete(self, tag: str) -> None:
        try:
            os.remove(os.path.join(self.root, f"{tag}.__complete"))
        except FileNotFoundError:
            pass

    def is_complete(self, tag: str) -> bool:
        return os.path.exists(os.path.join(self.root, f"{tag}.__complete"))

    def _recover_interrupted_compact(self, name: str) -> None:
        """Self-heal the one vulnerable window in :meth:`compact`'s swap: a
        crash between ``os.replace(live, old)`` and ``os.replace(tmp, live)``
        leaves no live directory but a complete copy at ``<name>.__old``.
        Without this, ``exists()`` returns False and ``read()`` silently
        serves an EMPTY frame (missing-table K3 semantics) for a table whose
        data is sitting intact one rename away — restore it instead.

        The ``.__swap_pending`` marker distinguishes MID-swap debris (crash
        between the renames — restore) from POST-swap debris (crash after
        the swap, before cleanup — the old copy is stale; never resurrect
        it, even if the live directory was later removed externally). The
        restore rename tolerates a concurrent process winning the same
        recovery (FileNotFoundError → already healed)."""
        import shutil

        live = self._path(name)
        old = live + ".__old"
        marker = live + ".__swap_pending"
        if os.path.isdir(old):
            if not os.path.isdir(live) and os.path.exists(marker):
                try:
                    os.replace(old, live)  # mid-swap crash: restore
                except FileNotFoundError:
                    pass  # a concurrent recovery already renamed it
            elif os.path.isdir(live):
                # post-swap debris: live is the newer copy, old is stale
                shutil.rmtree(old, ignore_errors=True)
                # only NOW is a lingering marker provably from a crashed
                # (not in-flight) compact — (live, old, marker) can't occur
                # mid-swap. A bare (live, marker, no old) state is an
                # ACTIVE compact between marker-write and its first rename;
                # deleting that marker would re-open the silent-empty
                # window the protocol closes, so leave it alone.
                try:
                    os.remove(marker)
                except FileNotFoundError:
                    pass
            else:
                # no live AND no marker: by the protocol this state is only
                # reachable after a completed swap (marker removed) whose
                # stale ``.__old`` survived (crash before its rmtree) and
                # whose live directory was later removed externally. The
                # old copy is stale by the protocol's own reasoning — never
                # resurrect it; reclaim the space so respecting the
                # external deletion doesn't leak the directory forever.
                shutil.rmtree(old, ignore_errors=True)

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_cols: list[str] | None = None,
        append_only: bool = False,
        cluster_by: list[str] | None = None,
        cluster_files: int | None = None,
        full_refresh: bool = False,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 16,
        bloom_cols: list[str] | None = None,
        bloom_ndv: int = 100_000,
    ) -> bool:
        """Write ``df``; idempotent per-partition overwrite unless
        ``append_only`` (K2). Empty outputs are skipped like the reference
        (bigquery_io_manager.py:115, 168-169); returns whether data landed
        (False = empty skip) so multi-table writers can gate completion
        markers on actual writes.

        ``cluster_by`` sort-clusters the data before writing: rows are
        range-repartitioned then sorted within tasks on
        ``partition_cols + cluster_by``, so each output file carries a
        TIGHT, largely disjoint min/max footer range on those columns.
        Parquet readers (Spark's ParquetFilters included) drop whole
        files/row-groups whose stats exclude a pushed predicate — at
        100 TB a selective filter on the clustered column then scans the
        few matching files instead of the table (the poor-man's Z-order:
        one extra range exchange at write time buys data skipping for
        every downstream scan; tests/test_io.py asserts the disjoint
        footer ranges from the parquet metadata). ``cluster_files`` pins
        the range-partition count (default: shuffle partitions, with AQE
        free to coalesce — pass it when a specific file granularity
        matters). ``full_refresh`` switches a partitioned overwrite from
        dynamic (replace only the slices present in ``df`` — the K1
        incremental contract) to static (drop EVERY existing partition
        first) — required when the new snapshot is authoritative and a
        partition absent from ``df`` must disappear rather than survive
        as a stale directory (e.g. a rebuilt index).

        ``zorder_by`` is the MULTI-column form of ``cluster_by``: a Morton
        key interleaves the named (numeric) columns' scaled bits (see
        :func:`morton_zkey`) and the data clusters on that key, so a
        selective predicate on ANY z-ordered column skips files/row-groups
        — lexicographic ``cluster_by`` only serves its leading column.
        Scaling anchors (2·d scalars) are computed in one aggregate at
        write time; the key itself is dropped before the write (it is a
        layout device, not data). Mutually exclusive with ``cluster_by``.

        ``bloom_cols`` writes a parquet BLOOM FILTER per listed column —
        the point-lookup complement of range clustering: min/max footers
        prune RANGES, but an equality probe on a column the file is NOT
        sorted by (`WHERE tx_hash = '0x…'`) still opens every row group
        whose range happens to cover the value; the bloom filter answers
        "definitely absent" per row group at the footer, so a needle
        lookup over 100 TB touches only the groups that might hold it.
        Size the filter with ``bloom_ndv`` (expected distinct values per
        row group — overestimating costs bytes, underestimating costs
        false positives)."""
        _schema_memo_invalidate(self._path(name))
        if df.isEmpty():
            return False
        drop_after: list[str] = []
        if zorder_by:
            if cluster_by:
                raise ValueError("pass cluster_by OR zorder_by, not both")
            mins, maxs = _zorder_anchors(df, zorder_by)
            df = df.withColumn(
                "_zkey", morton_zkey(zorder_by, mins, maxs, bits=zorder_bits)
            )
            cluster_by = ["_zkey"]
            drop_after = ["_zkey"]
        if cluster_by:
            rcols = [F.col(c) for c in [*(partition_cols or []), *cluster_by]]
            ranged = (
                df.repartitionByRange(cluster_files, *rcols)
                if cluster_files
                else df.repartitionByRange(*rcols)
            )
            # the projection after the sort preserves partition-local order;
            # the z-key never reaches the files
            df = ranged.sortWithinPartitions(*rcols).drop(*drop_after)
        stamped = df.withColumn(
            "_load_timestamp",
            F.lit(datetime.now(timezone.utc).isoformat()),
        )
        if partition_cols:
            stamped = stamped.withColumn(
                "_partition_key",
                F.concat_ws("|", *[F.col(c).cast("string") for c in partition_cols]),
            ).withColumn("_partition_type", F.lit("multi" if len(partition_cols) > 1 else "single"))
            # Pin dynamic overwrite at the writer (not ambient session conf):
            # partition overwrite must replace only the slices present in
            # `df` regardless of how the caller built their session.
            writer = stamped.write.partitionBy(*partition_cols).option(
                "partitionOverwriteMode", "static" if full_refresh else "dynamic"
            )
        else:
            stamped = stamped.withColumn("_partition_key", F.lit(None).cast("string")).withColumn(
                "_partition_type", F.lit(None).cast("string")
            )
            writer = stamped.write
        mode = "append" if append_only else "overwrite"
        for c in bloom_cols or []:
            writer = writer.option(
                f"parquet.bloom.filter.enabled#{c}", "true"
            ).option(f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv))
        writer.mode(mode).parquet(self._path(name))
        return True

    # -- snapshots: poor-man's time travel ---------------------------------
    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Mirror ``src`` at ``dst`` as a hardlink tree (shared by
        snapshot and restore so a future walk fix lands once)."""
        for dirpath, _dirs, files in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            tgt = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(tgt, exist_ok=True)
            for f in files:
                os.link(os.path.join(dirpath, f), os.path.join(tgt, f))

    def snapshot(self, name: str, keep: int = 3) -> str:
        """Snapshot ``name``'s current state under
        ``<name>.__snapshots/<utc-stamp>`` and prune to the newest
        ``keep``. Returns the snapshot id (the stamp).

        Snapshots are HARDLINK trees: parquet writers never mutate a file
        in place (overwrites create new files and remove old names), so
        linked snapshots stay immutable while costing zero data copy and
        zero extra bytes until the live table diverges — the same
        copy-on-write economics a lakehouse format gets from its manifest
        versions, expressed on a plain filesystem. Call before a risky
        overwrite/merge; ``read_snapshot`` serves any kept version,
        ``restore_snapshot`` rolls the live table back."""
        import shutil

        src = self._path(name)
        if not self.exists(name):
            raise ValueError(f"snapshot: table {name!r} does not exist")
        if keep < 1:
            # snapshots[:-0] is the EMPTY slice — keep<=0 would silently
            # invert the prune into "keep everything"
            raise ValueError(f"snapshot: keep must be >= 1, got {keep}")
        stamp = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%S_%f")
        dst = os.path.join(self.root, f"{name}.__snapshots", stamp)
        self._link_tree(src, dst)
        for old in self.snapshots(name)[:-keep]:
            shutil.rmtree(
                os.path.join(self.root, f"{name}.__snapshots", old),
                ignore_errors=True,
            )
        return stamp

    def snapshots(self, name: str) -> list[str]:
        """Kept snapshot ids for ``name``, oldest first."""
        root = os.path.join(self.root, f"{name}.__snapshots")
        if not os.path.isdir(root):
            return []
        return sorted(e for e in os.listdir(root) if not e.startswith("."))

    def read_snapshot(self, name: str, snapshot_id: str) -> DataFrame:
        """Read a kept snapshot (meta columns stripped, like ``read``)."""
        p = os.path.join(self.root, f"{name}.__snapshots", snapshot_id)
        if not os.path.isdir(p):
            raise ValueError(f"no snapshot {snapshot_id!r} for table {name!r}")
        df = self.spark.read.parquet(p)
        return df.drop(*[c for c in META_COLS if c in df.columns])

    def restore_snapshot(self, name: str, snapshot_id: str) -> None:
        """Roll the live table back to ``snapshot_id``. The current state
        is snapshotted first (a restore must never be the operation that
        loses data), then the live directory is replaced by a hardlink
        tree of the target snapshot — the snapshot itself stays kept."""
        src = os.path.join(self.root, f"{name}.__snapshots", snapshot_id)
        if not os.path.isdir(src):
            raise ValueError(f"no snapshot {snapshot_id!r} for table {name!r}")
        _schema_memo_invalidate(self._path(name))
        import shutil

        if self.exists(name):
            # keep wide enough that this bookkeeping snapshot can never
            # prune the snapshot being restored from
            self.snapshot(name, keep=len(self.snapshots(name)) + 1)
        live = self._path(name)
        # build the restored tree at a sibling, then swap — a crash can
        # never leave a PARTIAL live directory for read() to serve
        # silently (the compact() two-rename discipline); the only
        # vulnerable window is between the two atomic renames, and the
        # pre-restore state is already snapshotted above
        tmp = live + ".__restoring"
        shutil.rmtree(tmp, ignore_errors=True)
        self._link_tree(src, tmp)
        if os.path.exists(live):
            old = live + ".__pre_restore"
            shutil.rmtree(old, ignore_errors=True)
            os.replace(live, old)
            os.replace(tmp, live)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.replace(tmp, live)

    def merge(
        self,
        changes: DataFrame,
        name: str,
        key_cols: list[str],
        partition_cols: list[str] | None = None,
        op_col: str | None = None,
        delete_op: str = "D",
        sequence_col: str | None = None,
    ) -> bool:
        """MERGE a change log into a keyed table — the Delta/Iceberg
        ``MERGE INTO`` pattern on open parquet: inserts and updates upsert
        by ``key_cols``, rows whose ``op_col`` equals ``delete_op`` are
        removed, everything else in the table survives untouched.

        Scale contract: with ``partition_cols`` the merge is PARTITION-
        SCOPED — only the partitions present in ``changes`` are read
        (partition-pruned semi join on a broadcast of the touched tuples)
        and rewritten (dynamic partition overwrite); a daily change batch
        against a years-deep table costs the touched days, not the
        history. The partition columns must be STABLE per key (a key
        cannot move between partitions — the same contract every
        partition-scoped lakehouse merge imposes); date/entity partitions
        satisfy it naturally. A touched partition whose rows are ALL
        deleted cannot be expressed by dynamic overwrite (nothing to
        write), so its directory is removed explicitly — resolved from the
        filesystem via a partition-pruned ``input_file_name`` scan with
        the partition column types PINNED to the change batch's schema
        (escaped path characters, NULL partitions, and inference-hostile
        values like zero-padded ints or minute-precision strings all
        round-trip correctly).

        ``sequence_col``: when one batch carries several changes for a
        key, keep the row with the highest sequence (ties undefined —
        pass a total-order column). ``op_col=None`` means a pure upsert
        feed (no deletes).

        Returns whether the table exists after the merge (False = the
        merge left NO table: either nothing pre-existed and the batch had
        no upserts, or the batch deleted every remaining row — the
        full-deletion paths remove the table directory outright, since
        write() skips empty frames and a leftover directory would either
        resurrect the deleted rows or be an unreadable husk)."""
        from pyspark.sql.window import Window

        _schema_memo_invalidate(self._path(name))

        if sequence_col:
            w = Window.partitionBy(*key_cols).orderBy(F.col(sequence_col).desc())
            changes = (
                changes.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                # changelog metadata, not data — like op_col, it must not
                # land in (or be expected from) the stored schema
                .drop("_rn", sequence_col)
            )
        if not self.exists(name):
            # eqNullSafe: a NULL op must mean "upsert", not "silently drop
            # the row" (plain != is NULL-valued on NULL and filters it out)
            upserts = (
                changes.filter(
                    ~F.col(op_col).eqNullSafe(F.lit(delete_op))
                ).drop(op_col)
                if op_col
                else changes
            )
            return self.write(upserts, name, partition_cols=partition_cols)
        # materialize the change batch once: its lineage (often joins and
        # the sequence window above) would otherwise re-run for the touched
        # collect, the key distinct, AND the final union
        changes = changes.localCheckpoint(eager=True)
        if op_col:
            upserts = changes.filter(
                ~F.col(op_col).eqNullSafe(F.lit(delete_op))
            ).drop(op_col)
        else:
            upserts = changes
        touched_vals: list[tuple] = []
        pinned_schema = None
        if partition_cols:
            # partition-column types PINNED to the change batch's schema:
            # a plain read INFERS types from the directory strings, and a
            # re-rendered value ('2024-01-01 10:00' → timestamp →
            # '2024-01-01 10:00:00', '0123' → 123) would make the same
            # partition compare unequal between the batch and the table —
            # falsely marking live partitions vanished (data loss) or
            # vanished ones live (resurrection). Computed ONCE — the
            # vanished-dir sweep reuses it (schema inference lists the
            # whole table; twice per merge would be pure waste).
            pinned_schema = self._pinned_schema(name, changes.schema, partition_cols)
            existing = self._read_pinned(name, pinned_schema)
            touched = changes.select(*partition_cols).distinct()
            # bounded: one tuple per touched partition
            touched_vals = [tuple(r) for r in touched.collect()]
            # eqNullSafe semi join: a NULL partition value is a real
            # partition (__HIVE_DEFAULT_PARTITION__) — plain equality
            # would skip its existing rows and the overwrite would drop
            # every untouched key in it
            tj = touched.select(
                [F.col(c).alias(f"_t_{c}") for c in partition_cols]
            )
            cond = None
            for c in partition_cols:
                eq = F.col(c).eqNullSafe(F.col(f"_t_{c}"))
                cond = eq if cond is None else (cond & eq)
            existing = existing.join(F.broadcast(tj), cond, "left_semi")
        else:
            existing = self.read(name)
        changed_keys = changes.select(*key_cols).distinct()
        survivors = existing.join(changed_keys, key_cols, "left_anti")
        # materialize BEFORE overwriting: the plan reads the very files the
        # write replaces, so every post-write action on the lazy lineage
        # (including the vanished-partition sweep below) would hit deleted
        # paths. The checkpoint holds only the TOUCHED partitions' rows —
        # the merge's working set, not the table.
        out = survivors.unionByName(upserts).localCheckpoint(eager=True)
        if not partition_cols and out.isEmpty():
            # the merge emptied an unpartitioned table: write() skips empty
            # frames, so express the deletion directly — leaving the old
            # files would silently resurrect every deleted row
            return self._remove_table(name)
        landed = self.write(out, name, partition_cols=partition_cols)
        if partition_cols:
            # a touched partition with no output rows vanished entirely —
            # dynamic overwrite can't delete it, so drop the directory.
            # The directories are resolved from the FILESYSTEM (a fresh
            # read of the stale files, semi-joined to the vanished value
            # tuples, input_file_name → dirname), never re-formatted from
            # Python values: Spark escapes special characters in partition
            # paths (':', '%', '#', …) and renders NULL as
            # __HIVE_DEFAULT_PARTITION__, so an f"{c}={v}" reconstruction
            # silently misses those partitions and resurrects deleted rows.
            remaining = {
                tuple(r) for r in out.select(*partition_cols).distinct().collect()
            }
            vanished = set(touched_vals) - remaining
            if vanished:
                self._drop_partition_dirs(
                    name, partition_cols, pinned_schema, vanished
                )
            if out.isEmpty() and not self._parquet_files(name):
                # every partition of the table was touched AND emptied: the
                # sweep removed all partition dirs, leaving a bare root that
                # read() cannot infer a schema from and a later merge would
                # crash on — express the full deletion like the
                # unpartitioned branch does
                return self._remove_table(name)
        return landed or self.exists(name)

    def _remove_table(self, name: str) -> bool:
        """Delete ``name``'s directory outright (the full-deletion tail of
        both merge branches). Returns False — the merge left no table."""
        import shutil

        _schema_memo_invalidate(self._path(name))
        shutil.rmtree(self._path(name), ignore_errors=True)
        return False

    def drop(self, name: str) -> bool:
        """Explicitly delete table ``name`` (no-op when absent). Returns
        True when a table was actually removed.

        This is the EMPTY-STATE writer's tool: ``write`` skips empty
        frames, so a state table whose new version is "no rows" (e.g. the
        decontamination digests after the benchmarks resource is removed,
        plans/corpus_pipeline.py) would otherwise silently keep serving
        the PREVIOUS run's rows — drop expresses "the state is now empty"
        where the skip cannot."""
        if not self.exists(name):
            return False
        self._remove_table(name)
        return True

    def _pinned_schema(self, name: str, batch_schema, partition_cols: list[str]):
        """The read schema for ``name`` with partition-column TYPES pinned
        to the change batch's schema instead of directory-string inference:
        data columns keep the file schema (one inferred read supplies it);
        partition columns parse from the directory strings into exactly
        the types the batch rendered them from, so batch↔table comparisons
        are an exact round trip (write renders, pinned read parses back —
        no inference re-typing '0123' to 123 or minute-precision strings
        to timestamps)."""
        from pyspark.sql.types import StructField, StructType

        inferred = self.spark.read.parquet(self._path(name)).schema
        batch = {f.name: f for f in batch_schema.fields}
        # contract check up front: a change batch missing a partition
        # column would otherwise surface as an opaque KeyError below
        # (this runs before the touched-partition select that would name
        # the column in a resolvable error)
        missing = [c for c in partition_cols if c not in batch]
        if missing:
            raise ValueError(
                f"merge: change batch is missing partition column(s)"
                f" {missing} required by table {name!r} — every merge"
                " batch must carry the table's full partition key"
            )
        return StructType(
            [
                StructField(f.name, batch[f.name].dataType, True)
                if f.name in partition_cols
                else f
                for f in inferred.fields
            ]
        )

    def _read_pinned(self, name: str, pinned_schema):
        """Read ``name`` under a :meth:`_pinned_schema`; meta columns are
        stripped like ``read``."""
        df = self.spark.read.schema(pinned_schema).parquet(self._path(name))
        return df.drop(*[c for c in META_COLS if c in df.columns])

    def _drop_partition_dirs(
        self,
        name: str,
        partition_cols: list[str],
        pinned_schema,
        vanished: set[tuple],
    ) -> None:
        """Remove the on-disk directories of the ``vanished`` partition
        value tuples. The scan is partition-PRUNED: the vanished values
        become literal predicates on the pinned-type partition columns,
        so only those directories' files are listed and read; directory
        names come from ``input_file_name`` — robust to Spark's
        partition-path escaping (':' → %3A, NULL →
        __HIVE_DEFAULT_PARTITION__), which an f"{c}={v}" reconstruction
        silently misses. A vanished tuple with no files is legal (a
        brand-new partition whose rows were all deleted in the same batch
        never hit disk); a failing rmtree raises (no silent no-op)."""
        import shutil
        from functools import reduce
        from urllib.parse import unquote, urlparse

        pinned = self._read_pinned(name, pinned_schema)
        clauses = []
        for vals in vanished:
            conj = None
            for c, v in zip(partition_cols, vals):
                e = F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
                conj = e if conj is None else (conj & e)
            clauses.append(conj)
        stale_files = (
            pinned.filter(reduce(lambda a, b: a | b, clauses))
            .select(F.input_file_name().alias("_f"))
            .distinct()
            .collect()  # bounded: the vanished partitions' file list
        )
        dirs = {
            os.path.dirname(unquote(urlparse(r["_f"]).path)) for r in stale_files
        }
        root = os.path.realpath(self._path(name))
        for d in sorted(dirs):
            if not os.path.realpath(d).startswith(root + os.sep):
                raise RuntimeError(
                    f"merge: refusing to remove {d!r} outside table root {root!r}"
                )
            shutil.rmtree(d)
            # multi-column partition layouts nest (a=1/b=2/...): removing
            # every leaf under an outer value leaves empty ancestor dirs
            # that accumulate forever and re-surface as phantom partition
            # values on some filesystems — walk up removing now-empty
            # parents, stopping at the table root
            parent = os.path.realpath(os.path.dirname(d))
            while parent.startswith(root + os.sep) and not os.listdir(parent):
                os.rmdir(parent)
                parent = os.path.realpath(os.path.dirname(parent))

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Persist ``df`` hash-bucketed (CLUSTERED BY) on ``bucket_cols``.

        Bucketing is the co-location tool the partition layout (K1) can't
        provide: two tables bucketed on the same key with the same bucket
        count join WITHOUT an Exchange — each task zips bucket i with
        bucket i (asserted in tests/test_io.py). For a 100 TB fact table
        joined repeatedly on the same key, the one-time bucketed write
        amortizes the shuffle out of every downstream join/agg on that
        key. Requires the session catalog (bucket metadata lives there,
        not in parquet); read back with ``read_bucketed``.

        ``mode="append"`` adds files into the EXISTING bucketed table —
        each new file still hash-routes rows by the bucket function, so
        co-location survives incremental ingest (Spark validates the
        bucket spec against the catalog and refuses a mismatch). The
        caller must pass the ORIGINAL ``n_buckets``/``sort_cols``."""
        _schema_memo_invalidate(self._path(name))
        writer = (
            df.write.format("parquet")
            .mode(mode)
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.option("path", self._path(name)).saveAsTable(name)

    def read_bucketed(self, name: str) -> DataFrame:
        """Catalog read preserving bucket metadata (a plain parquet read of
        the same files would lose the co-location guarantee)."""
        return self.spark.table(name)

    def _parquet_files(self, name: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(self._path(name)):
            out.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
            )
        return out

    def compact(
        self,
        name: str,
        partition_cols: list[str] | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_cols: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 16,
    ) -> tuple[int, int]:
        """Rewrite ``name`` with bounded file counts — the maintenance pass
        every incrementally-loaded table needs: daily partition overwrites
        and appends accrete small files (one per write task), and small
        files tax every downstream scan with per-file open/footer costs.

        Partitioned tables repartition BY the partition columns, so each
        partition directory collapses to exactly ONE file — hash
        partitioning cannot split a single partition value, so a
        partition whose bytes exceed ``target_file_bytes`` still becomes
        one (large) file; that is the right trade for the small-file
        problem this solves (split an oversized partition by adding a
        finer partition column, not by compaction). Unpartitioned tables
        coalesce to ceil(bytes / target). Rows, schema, partition layout, and the
        ``_load_timestamp`` provenance stamps are preserved exactly —
        compaction is a physical-layout change only.

        The rewrite lands in a sibling temp directory, the live directory
        is moved aside, the rewrite renamed in, then the old copy removed —
        so at every instant at least one complete copy exists on disk
        (reading and overwriting the same path in one job is not safe in
        any engine); the only vulnerable window is between the two
        atomic renames (microseconds), and a crash there leaves the full
        old copy recoverable at ``<name>.__old``. On object storage the
        same shape runs against the FileSystem API.

        A table written with ``cluster_by`` must pass those columns as
        ``sort_cols`` — compaction re-sorts within the rewrite so the
        disjoint min/max footer ranges (the data-skipping contract)
        survive the file-count change. A table written with ``zorder_by``
        must pass the same columns here as ``zorder_by``: the Morton key
        is a layout device dropped before write, so the rewrite recomputes
        it (fresh anchors over the current data) and re-clusters — without
        it, compaction silently degrades the multi-dim skipping to
        arrival order.

        Returns (files_before, files_after)."""
        import math
        import shutil

        _schema_memo_invalidate(self._path(name))
        if zorder_by and sort_cols:
            raise ValueError("pass sort_cols OR zorder_by, not both")

        # a bucketed table's co-location contract lives in the catalog; a
        # plain rewrite would leave bucket metadata pointing at files that
        # are no longer bucket-hashed — refuse instead of corrupting
        if self.spark.catalog.tableExists(name):
            raise ValueError(
                f"{name!r} is a catalog (bucketed) table; compaction would"
                " orphan its bucket metadata — rewrite via write_bucketed"
            )
        self._recover_interrupted_compact(name)
        files = self._parquet_files(name)
        if not files:
            return (0, 0)
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        df = self.spark.read.parquet(self._path(name))
        drop_after: list[str] = []
        if zorder_by:
            mins, maxs = _zorder_anchors(df, zorder_by)
            df = df.withColumn(
                "_zkey", morton_zkey(zorder_by, mins, maxs, bits=zorder_bits)
            )
            sort_cols = ["_zkey"]
            drop_after = ["_zkey"]
        tmp = self._path(name) + ".__compacting"
        if partition_cols:
            # hash-repartition on the partition cols: every partition value
            # lands in one task -> exactly one output file per partition
            # directory (an oversized partition stays one file — see
            # docstring)
            out = df.repartition(n_out, *[F.col(c) for c in partition_cols])
        elif sort_cols:
            # re-establish the GLOBAL clustering, not just per-file order: a
            # coalesce merges files in size order, so two sorted output
            # files could still overlap in range — range-repartition first
            out = df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
        else:
            out = df.coalesce(n_out)
        if sort_cols:
            # replay the cluster_by / z-order layout so footer min/max
            # ranges stay tight after the rewrite
            out = out.sortWithinPartitions(
                *[*(partition_cols or []), *sort_cols]
            ).drop(*drop_after)
        writer = out.write.partitionBy(*partition_cols) if partition_cols else out.write
        writer.mode("overwrite").parquet(tmp)
        old = self._path(name) + ".__old"
        marker = self._path(name) + ".__swap_pending"
        if os.path.exists(old):  # debris from a crashed prior compaction
            shutil.rmtree(old)
        # marker first: recovery restores .__old ONLY while it exists, so a
        # crash after the swap can never resurrect the stale copy
        with open(marker, "w") as f:
            f.write(name)
        os.replace(self._path(name), old)
        os.replace(tmp, self._path(name))
        os.remove(marker)
        shutil.rmtree(old)
        return (len(files), len(self._parquet_files(name)))

    def read(
        self,
        name: str,
        schema: StructType | None = None,
        where: str | None = None,
        keep_meta: bool = False,
    ) -> DataFrame:
        """Read a table; missing table → empty DataFrame with ``schema``
        (K3 404 handling, bigquery_io_manager.py:277-294). ``where`` is a SQL
        predicate; on partition columns it prunes at file-listing time."""
        if not self.exists(name):
            return local_df(self.spark, [], schema or StructType([]))
        path = self._path(name)
        known = _SCHEMA_MEMO.get(path)
        if known is not None:
            df = self.spark.read.schema(known).parquet(path)
        else:
            df = self.spark.read.parquet(path)
            _SCHEMA_MEMO[path] = df.schema
        if where:
            df = df.filter(where)
        if not keep_meta:
            df = df.drop(*[c for c in META_COLS if c in df.columns])
        return df
