"""TableIO — Iceberg-style snapshot table on parquet + JSON manifests.

The sandbox has no Iceberg jars (SURVEY.md §7), so the engine ships a thin
table layer with the same *semantics* the north_rule needs:

- append-only commits: each commit writes parquet files under ``data/``
  and an immutable ``snapshot-N.json`` manifest (file list, parent id,
  summary) — the commit is an exclusive-create (hard link) of the
  manifest, so concurrent committers conflict instead of clobbering;
- time travel: ``read(spark, snapshot_id)`` reads exactly the files listed
  in that manifest (old snapshots never change);
- checkpoint/resume: ``ResumableJob`` partitions work into named chunks;
  each completed chunk appends one snapshot and one lineage record
  (job_id, chunk, rows, seconds, snapshot_id).  Re-running the job skips
  committed chunks — per-partition idempotent writes keyed by
  (job_id, chunk), the Iceberg-snapshot checkpoint pattern of
  BASELINE.json.north_star.

With Iceberg jars present, ``make_table`` dispatches the same call sites
onto a real Iceberg catalog table (``IcebergTable``:
``df.writeTo(...).append()`` + the ``.snapshots`` metadata table + VERSION
AS OF time travel); the parquet+manifest ``SnapshotTable`` is the
jar-free fallback.  ``ResumableJob`` works against either backend
unchanged — both expose the same snapshots()/append()/read() surface.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session classpath
    (Class.forName probe through py4j — no catalog config needed to
    answer the question; using IcebergTable additionally requires a
    configured catalog, which is a deployment concern)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def make_table(spark: SparkSession, root: str, name: str | None = None):
    """Factory: an ``IcebergTable`` bound to catalog table ``name`` when
    the Iceberg runtime is present AND a table name is given; otherwise
    the parquet+manifest ``SnapshotTable`` at ``root``.  Call sites
    (ResumableJob included) are backend-agnostic."""
    if name is not None and iceberg_available(spark):
        return IcebergTable(spark, name)
    return SnapshotTable(root)


class IcebergTable:
    """SnapshotTable's surface over a real Iceberg catalog table.

    snapshots() rows mirror the manifest dicts (snapshot_id, parent_id,
    timestamp, summary) sourced from the ``<table>.snapshots`` metadata
    table; chunk identity for ResumableJob rides in snapshot summary
    properties via the ``snapshot-property.*`` write option; row counts
    come from the summary's ``added-records`` (no file re-read).  Only
    constructed when ``iceberg_available`` — import-time never touches
    the JVM, so the module works jar-free."""

    # ResumableJob must not derive a lineage path from a catalog name
    requires_lineage_dir = True

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name
        self.root = name
        if not spark.catalog.tableExists(name):
            raise ValueError(
                f"Iceberg table {name!r} does not exist; create it first"
                " (spark.sql CREATE TABLE ... USING iceberg)"
            )

    def snapshots(self) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, parent_id, committed_at, summary"
            f" FROM {self.name}.snapshots ORDER BY committed_at"
        ).collect()
        return [
            {
                "snapshot_id": r.snapshot_id,
                "parent_id": r.parent_id,
                "timestamp": r.committed_at.timestamp(),
                "summary": dict(r.summary or {}),
                "added_records": int(
                    (r.summary or {}).get("added-records", 0)
                ),
            }
            for r in rows
        ]

    def current_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def append(self, df: DataFrame, summary: dict | None = None) -> int:
        """Returns the id of the snapshot THIS call committed — matched
        by the summary properties (or set difference) among snapshots
        that appeared during the call, so a concurrent committer landing
        between our commit and the metadata read cannot be mis-attributed
        (SnapshotTable.append's contract)."""
        before = {s["snapshot_id"] for s in self.snapshots()}
        w = df.writeTo(self.name)
        for k, v in (summary or {}).items():
            w = w.option(f"snapshot-property.{k}", str(v))
        w.append()
        new = [
            s for s in self.snapshots() if s["snapshot_id"] not in before
        ]
        if summary:
            want = {k: str(v) for k, v in summary.items()}
            mine = [
                s for s in new
                if all(s["summary"].get(k) == v for k, v in want.items())
            ]
            if len(mine) == 1:
                return mine[0]["snapshot_id"]
        if len(new) == 1:
            return new[0]["snapshot_id"]
        raise RuntimeError(
            f"cannot attribute the committed snapshot among {len(new)}"
            " new snapshots; pass a distinguishing summary"
        )

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        if snapshot_id is None:
            return spark.read.table(self.name)
        return spark.sql(
            f"SELECT * FROM {self.name} VERSION AS OF {int(snapshot_id)}"
        )

    def schema(self, snapshot_id: int | None = None) -> list[dict]:
        """Column list in SnapshotTable's shape (ids are ordinal here:
        Iceberg tracks real field ids internally; the catalog surface
        exposes names/types)."""
        df = self.read(self.spark, snapshot_id)
        return [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(df.schema.fields)
        ]

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> int:
        """FULL-TABLE replace snapshot (SnapshotTable.overwrite's
        contract: new version == exactly df) — overwrite(lit(True)),
        NOT overwritePartitions(): dynamic partition overwrite would
        leave old rows alive in partitions df lacks (review finding).
        Iceberg commits copy-on-write; prior snapshots stay
        time-travelable."""
        from pyspark.sql import functions as F

        before = {s["snapshot_id"] for s in self.snapshots()}
        w = df.writeTo(self.name)
        for k, v in (summary or {}).items():
            w = w.option(f"snapshot-property.{k}", str(v))
        w.overwrite(F.lit(True))
        new = [s for s in self.snapshots() if s["snapshot_id"] not in before]
        return new[-1]["snapshot_id"] if new else self.current_snapshot()["snapshot_id"]

    def upsert(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> int:
        """MERGE INTO — Iceberg's native row-level upsert (the operation
        SnapshotTable emulates with a copy-on-write overwrite).  The
        source view name is unique per call and dropped afterwards so
        concurrent upserts in one session cannot clobber each other's
        source (review finding); the MERGE runs on the dataframe's own
        session, where the view actually exists."""
        sess = updates.sparkSession
        view = f"_upsert_src_{uuid.uuid4().hex}"
        updates.createOrReplaceTempView(view)
        try:
            on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            sess.sql(
                f"MERGE INTO {self.name} t USING {view} s ON {on}"
                " WHEN MATCHED THEN UPDATE SET *"
                " WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            sess.catalog.dropTempView(view)
        return self.current_snapshot()["snapshot_id"]

    def evolve_schema(self, add_columns=None, renames=None, summary=None):
        """On a real Iceberg table, schema evolution is native DDL with
        the same field-id semantics SnapshotTable implements (ALTER
        TABLE ... ADD COLUMN / RENAME COLUMN).  Issued through the
        catalog so the metadata commit is Iceberg's own."""
        for old, new in (renames or {}).items():
            self.spark.sql(
                f"ALTER TABLE {self.name} RENAME COLUMN {old} TO {new}"
            )
        for name, dtype in (add_columns or {}).items():
            self.spark.sql(
                f"ALTER TABLE {self.name} ADD COLUMN {name} {dtype}"
            )
        cur = self.current_snapshot()
        return cur["snapshot_id"] if cur else None

    def rewrite_data_files(
        self, spark=None, target_files=None, sort_by=None, summary=None
    ):
        """Small-file compaction on real Iceberg is the
        rewrite_data_files maintenance procedure; call it through the
        catalog's system namespace.  sort_by maps to the procedure's
        sort strategy.  ``target_files`` and ``summary`` have no
        Iceberg-procedure equivalent (Iceberg sizes output by
        target-file-size-bytes and stamps its own snapshot summary) —
        passing them warns instead of silently dropping (review
        finding)."""
        import warnings

        if target_files is not None or summary is not None:
            warnings.warn(
                "IcebergTable.rewrite_data_files ignores target_files/"
                "summary: Iceberg's procedure sizes output by "
                "target-file-size-bytes and writes its own summary",
                stacklevel=2,
            )
        # catalog component: only a 3+-part name carries one explicitly
        # ('cat.db.tbl'); 'db.tbl' or 'tbl' resolve in the CURRENT
        # catalog — naive rpartition would misread 'db' as the catalog
        # (review finding)
        parts = self.name.split(".")
        cat = (
            parts[0]
            if len(parts) >= 3
            else self.spark.catalog.currentCatalog()
        )
        strategy = (
            f", strategy => 'sort', sort_order => '{', '.join(sort_by)}'"
            if sort_by
            else ""
        )
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => '{self.name}'"
            f"{strategy})"
        )
        cur = self.current_snapshot()
        return cur["snapshot_id"] if cur else None


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.meta_dir = os.path.join(root, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # ------------------------------------------------------------ metadata

    def snapshots(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.meta_dir)):
            if f.startswith("snapshot-") and f.endswith(".json"):
                with open(os.path.join(self.meta_dir, f)) as fh:
                    out.append(json.load(fh))
        return out

    def current_snapshot(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _files_at(self, snapshot_id: int | None) -> list[str]:
        snaps = self.snapshots()
        if not snaps:
            return []
        if snapshot_id is None:
            chosen = snaps[-1]
        else:
            matches = [s for s in snaps if s["snapshot_id"] == snapshot_id]
            if not matches:
                raise KeyError(f"unknown snapshot {snapshot_id}")
            chosen = matches[0]
        return chosen["files"]

    # --------------------------------------------------- schema tracking

    def schema(self, snapshot_id: int | None = None) -> list[dict] | None:
        """Column list [{'id', 'name', 'type'}] of a snapshot; None for
        legacy snapshots committed before schema tracking.  Column ids
        are stable across renames — the Iceberg field-id model: a rename
        changes the NAME of an id, never remaps data."""
        snaps = self.snapshots()
        if not snaps:
            return None
        if snapshot_id is None:
            return snaps[-1].get("schema")
        for s in snaps:
            if s["snapshot_id"] == snapshot_id:
                return s.get("schema")
        raise KeyError(f"unknown snapshot {snapshot_id}")

    @staticmethod
    def _derive_schema(df: DataFrame) -> list[dict]:
        return [
            {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(df.schema.fields)
        ]

    def _schema_state(
        self, parent: dict | None, df: DataFrame, check_legacy: bool = False
    ):
        """(schema, schema_id, schemas) for a data commit: reuse the
        parent's current schema (validating df against it) or derive one
        on first write / on a legacy table (whose existing files are
        retro-tagged with the derived schema — they were all written
        under it, schema change was impossible before tracking).

        ``check_legacy`` applies only to the legacy-manifest branch and
        only the APPEND path sets it: append carries the legacy files
        into the new snapshot, so the derived schema must match their
        footers; overwrite/rewrite reference only freshly written files,
        where a column change is legitimate (review finding)."""
        if parent and parent.get("schema"):
            schema = parent["schema"]
            want = {c["name"] for c in schema}
            got = set(df.columns)
            if got != want:
                raise ValueError(
                    f"dataframe columns {sorted(got)} do not match table"
                    f" schema {sorted(want)}; use evolve_schema() to"
                    " add/rename columns first"
                )
            # types too (ADVICE r5): a same-named column of a different
            # type would commit parquet files physically conflicting
            # with earlier ones — fail at commit time, not read time
            df_types = {f.name: f.dataType.simpleString()
                        for f in df.schema.fields}
            mismatched = [
                f"{c['name']}: table={c['type']} df={df_types[c['name']]}"
                for c in schema
                if df_types[c["name"]] != c["type"]
            ]
            if mismatched:
                raise ValueError(
                    "dataframe column types do not match table schema: "
                    + "; ".join(mismatched)
                )
            return schema, parent["schema_id"], parent["schemas"]
        schema = self._derive_schema(df)
        if check_legacy and parent and parent.get("files"):
            # legacy table (committed before schema tracking): the new
            # df's derived schema retro-tags the old files, so it must
            # actually MATCH them — validate against one file's footer
            # instead of silently committing a wrong mapping (review
            # finding: a mismatched append would make read() return
            # NULL-poisoned columns with no error anywhere)
            legacy_cols = set(
                df.sparkSession.read.parquet(parent["files"][0]).columns
            )
            if set(df.columns) != legacy_cols:
                raise ValueError(
                    f"dataframe columns {sorted(df.columns)} do not match"
                    f" this legacy table's files {sorted(legacy_cols)};"
                    " schema changes require a schema-tracked table"
                )
        return schema, 1, {"1": schema}

    # ----------------------------------------------------------- commits

    def _commit(self, manifest: dict) -> int:
        sid = manifest["snapshot_id"]
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        final = os.path.join(self.meta_dir, f"snapshot-{sid:08d}.json")
        # atomic commit with CONFLICT DETECTION: os.rename silently
        # replaces on POSIX, so a concurrent committer could clobber a
        # sibling snapshot; link() fails with EEXIST instead — the loser
        # re-reads the parent and retries (optimistic concurrency, the
        # same protocol an Iceberg catalog provides)
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            os.unlink(tmp)
            raise RuntimeError(
                f"snapshot {sid} was committed concurrently; retry"
            ) from e
        os.unlink(tmp)
        return sid

    def _write_stage(self, df: DataFrame) -> list[str]:
        stage = os.path.join(self.data_dir, f"stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(stage)
        return [
            os.path.join(stage, f)
            for f in os.listdir(stage)
            if f.endswith(".parquet")
        ]

    def append(self, df: DataFrame, summary: dict | None = None) -> int:
        """Write df as new parquet files + commit a child snapshot."""
        parent = self.current_snapshot()
        schema, schema_id, schemas = self._schema_state(
            parent, df, check_legacy=True
        )
        # write columns in schema order so footers match across files
        files = self._write_stage(df.select(*[c["name"] for c in schema]))
        prev_files = parent["files"] if parent else []
        prev_fs = (parent.get("file_schemas") or {}) if parent else {}
        file_schemas = {
            **{f: prev_fs.get(f, schema_id) for f in prev_files},
            **{f: schema_id for f in files},
        }
        sid = (parent["snapshot_id"] + 1) if parent else 1
        return self._commit(
            {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "timestamp": time.time(),
                "files": prev_files + files,
                "added_files": files,
                "schema": schema,
                "schema_id": schema_id,
                "schemas": schemas,
                "file_schemas": file_schemas,
                "summary": summary or {},
            }
        )

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError("table has no snapshots")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            matches = [s for s in snaps if s["snapshot_id"] == snapshot_id]
            if not matches:
                raise KeyError(f"unknown snapshot {snapshot_id}")
            snap = matches[0]
        files = snap["files"]
        target = snap.get("schema")
        file_schemas = snap.get("file_schemas") or {}
        schemas = snap.get("schemas") or {}
        sids = {file_schemas.get(f, snap.get("schema_id")) for f in files}
        if target is None or sids == {snap.get("schema_id")}:
            # legacy table or single-schema file set: plain scan
            return spark.read.parquet(*files)
        # schema evolution in effect: read each write-schema's file group
        # and reconcile it to the target schema BY COLUMN ID (renamed
        # columns map through their id; columns added later become
        # NULLs), then union.  Schema-version count is tiny (one per
        # evolve call), so this is a handful of scan groups, not per-file
        # work — the same shape Iceberg's read path produces.
        from pyspark.sql import functions as F

        groups: dict[int, list[str]] = {}
        for f in files:
            groups.setdefault(file_schemas.get(f, snap["schema_id"]), []).append(f)
        parts = []
        for gsid, gfiles in sorted(groups.items()):
            written = {c["id"]: c for c in schemas[str(gsid)]}
            cols = []
            for c in target:
                w = written.get(c["id"])
                if w is not None:
                    cols.append(F.col(w["name"]).alias(c["name"]))
                else:
                    cols.append(
                        F.lit(None).cast(c["type"]).alias(c["name"])
                    )
            parts.append(spark.read.parquet(*gfiles).select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def evolve_schema(
        self,
        add_columns: dict[str, str] | None = None,
        renames: dict[str, str] | None = None,
        summary: dict | None = None,
    ) -> int:
        """Metadata-only schema commit: rename columns (ids preserved —
        existing files never rewritten) and/or add columns (fresh ids;
        they read as NULL from pre-evolution files).  Older snapshots
        keep their own schema, so time travel returns the data exactly
        as that snapshot defined it — Iceberg's schema-evolution
        contract without touching a single data file."""
        parent = self.current_snapshot()
        if parent is None or not parent.get("schema"):
            raise ValueError(
                "evolve_schema requires an initialized schema-tracked"
                " table (append at least once first)"
            )
        schema = [dict(c) for c in parent["schema"]]
        names = {c["name"] for c in schema}
        for old, new in (renames or {}).items():
            if old not in names:
                raise ValueError(f"cannot rename unknown column {old!r}")
            if new in names:
                raise ValueError(f"rename target {new!r} already exists")
            for c in schema:
                if c["name"] == old:
                    c["name"] = new
            names = {c["name"] for c in schema}
        next_id = max(c["id"] for c in schema) + 1
        for name, dtype in (add_columns or {}).items():
            if name in names:
                raise ValueError(f"column {name!r} already exists")
            schema.append({"id": next_id, "name": name, "type": dtype})
            next_id += 1
            names.add(name)
        schema_id = parent["schema_id"] + 1
        schemas = {**parent["schemas"], str(schema_id): schema}
        return self._commit(
            {
                "snapshot_id": parent["snapshot_id"] + 1,
                "parent_id": parent["snapshot_id"],
                "timestamp": time.time(),
                "files": parent["files"],
                "added_files": [],
                "operation": "evolve-schema",
                "schema": schema,
                "schema_id": schema_id,
                "schemas": schemas,
                "file_schemas": parent.get("file_schemas")
                or {f: parent["schema_id"] for f in parent["files"]},
                "summary": summary or {},
            }
        )

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> int:
        """Commit a REPLACE snapshot: the new version's file set is only
        the freshly written files (append's child snapshot instead keeps
        the parent's files).  Time travel to prior snapshots still works
        — old files are never deleted, exactly like Iceberg's
        copy-on-write overwrite."""
        parent = self.current_snapshot()
        schema, schema_id, schemas = self._schema_state(parent, df)
        files = self._write_stage(df.select(*[c["name"] for c in schema]))
        sid = (parent["snapshot_id"] + 1) if parent else 1
        return self._commit(
            {
                "snapshot_id": sid,
                "parent_id": parent["snapshot_id"] if parent else None,
                "timestamp": time.time(),
                "files": files,
                "added_files": files,
                "operation": "overwrite",
                "schema": schema,
                "schema_id": schema_id,
                "schemas": schemas,
                "file_schemas": {f: schema_id for f in files},
                "summary": summary or {},
            }
        )

    def rewrite_data_files(
        self,
        spark: SparkSession,
        target_files: int = 1,
        sort_by: list[str] | None = None,
        summary: dict | None = None,
    ) -> int:
        """Small-file COMPACTION — Iceberg's rewrite_data_files: read the
        current snapshot, rewrite it as ``target_files`` parquet files
        with IDENTICAL rows, and commit a replace snapshot.  Pre-
        compaction snapshots stay time-travelable (files are never
        deleted).  ``sort_by`` additionally range-partitions + sorts the
        rewrite (pass the Z-order layout key from plans/layout.py to
        pair compaction with the measured 2x scan-pruning win — each
        output file then covers a tight spatial range, so min/max footer
        stats prune).  At 100 TB this runs per partition-of-interest,
        not whole-table; the commit protocol is identical."""
        df = self.read(spark)
        if sort_by:
            df = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            df = df.repartition(target_files)
        parent = self.current_snapshot()
        # stage + verify BEFORE committing (review finding: a post-commit
        # guard leaves the corrupt snapshot durable and CURRENT for any
        # reader racing the exception); a failed rewrite leaves only an
        # orphan stage directory, never a visible snapshot
        schema, schema_id, schemas = self._schema_state(parent, df)
        files = self._write_stage(df.select(*[c["name"] for c in schema]))
        before = spark.read.parquet(*parent["files"]).count()
        after = spark.read.parquet(*files).count()
        if before != after:
            raise RuntimeError(
                f"compaction changed row count {before} -> {after};"
                f" staged files {files[:1]}... abandoned, table unchanged"
            )
        # parent is never None here: self.read() above raised for an
        # empty table and parent["files"] was already dereferenced
        return self._commit(
            {
                "snapshot_id": parent["snapshot_id"] + 1,
                "parent_id": parent["snapshot_id"],
                "timestamp": time.time(),
                "files": files,
                "added_files": files,
                "operation": "overwrite",
                "schema": schema,
                "schema_id": schema_id,
                "schemas": schemas,
                "file_schemas": {f: schema_id for f in files},
                "summary": {
                    **(summary or {}),
                    "op": "rewrite-data-files",
                    # carry the verified row count so consumers (e.g.
                    # the maintenance job's metrics line) need no
                    # third full-table scan
                    "rows": after,
                },
            }
        )

    def upsert(
        self, spark: SparkSession, updates: DataFrame, keys: list[str]
    ) -> int:
        """MERGE INTO: updates win on key collision, other rows survive;
        committed as a copy-on-write overwrite snapshot (operators/cdc.
        upsert_merge).  diff two snapshots afterwards with
        cdc.snapshot_diff(table.read(s, v1), table.read(s, v2), ...)."""
        from ionex_spark.operators.cdc import upsert_merge

        if self.current_snapshot() is None:
            return self.overwrite(updates, summary={"op": "upsert-init"})
        merged = upsert_merge(self.read(spark), updates, keys)
        return self.overwrite(merged, summary={"op": "upsert"})


class ResumableJob:
    """Chunked, checkpointed job with per-chunk lineage + metrics.

    ``chunks`` are (name, producer) pairs; ``producer(spark) -> DataFrame``
    computes that chunk's output.  Completed chunks are recorded in
    ``_lineage/<job_id>.json`` and skipped on re-run.
    """

    def __init__(self, table, job_id: str, lineage_dir: str | None = None):
        self.table = table
        self.job_id = job_id
        # IcebergTable's root is a catalog name, not a path: deriving a
        # lineage path from it would silently create a CWD-relative
        # directory named after the table, and a resume from a different
        # CWD would find no lineage — refuse instead of guessing.  The
        # SnapshotTable default co-locates lineage with the table.
        if lineage_dir is None and getattr(
            table, "requires_lineage_dir", False
        ):
            raise ValueError(
                "this table has no filesystem root; pass an explicit"
                " lineage_dir (shared filesystem or object-store prefix)"
            )
        self.lineage_dir = lineage_dir or os.path.join(table.root, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.lineage_path = os.path.join(self.lineage_dir, f"{job_id}.json")

    def lineage(self) -> list[dict]:
        if not os.path.exists(self.lineage_path):
            return []
        with open(self.lineage_path) as fh:
            return json.load(fh)

    def completed_chunks(self) -> set[str]:
        """Chunks that must not re-run: recorded in lineage OR already
        committed as a snapshot.  The snapshot scan closes the crash
        window between table.append() and the lineage write — without it
        a chunk committed-but-unrecorded would be appended a second time
        on resume (duplicated rows)."""
        done = {rec["chunk"] for rec in self.lineage()}
        done.update(self._committed_snapshots().keys())
        return done

    def _committed_snapshots(self) -> dict[str, dict]:
        """chunk -> snapshot manifest for every snapshot this job committed
        (identity carried in the snapshot summary at append time)."""
        out: dict[str, dict] = {}
        for s in self.table.snapshots():
            sm = s.get("summary") or {}
            if sm.get("job_id") == self.job_id and "chunk" in sm:
                out[sm["chunk"]] = s
        return out

    def run(self, spark: SparkSession, chunks: list[tuple[str, callable]]) -> dict:
        records = self.lineage()
        done = {rec["chunk"] for rec in records}
        committed = self._committed_snapshots()
        ran, skipped, recovered = [], [], []
        for name, producer in chunks:
            if name in done:
                skipped.append(name)
                continue
            if name in committed:
                # crash-resume: snapshot landed but the lineage record did
                # not — backfill lineage from the manifest, DO NOT re-run
                s = committed[name]
                rows = self._snapshot_rows(spark, s)
                records.append(
                    {
                        "job_id": self.job_id,
                        "chunk": name,
                        "rows": rows,
                        "seconds": 0.0,
                        "snapshot_id": s["snapshot_id"],
                        "ts": time.time(),
                    }
                )
                self._write_lineage(records)
                recovered.append(name)
                continue
            t0 = time.time()
            df = producer(spark)
            sid = self.table.append(
                df, summary={"job_id": self.job_id, "chunk": name}
            )
            # count from the snapshot just committed (parquet footer
            # metadata / Iceberg summary only) instead of re-computing
            # the chunk a second time
            committed_snap = [
                s_ for s_ in self.table.snapshots()
                if s_["snapshot_id"] == sid
            ][0]
            rows = self._snapshot_rows(spark, committed_snap)
            rec = {
                "job_id": self.job_id,
                "chunk": name,
                "rows": rows,
                "seconds": round(time.time() - t0, 3),
                "snapshot_id": sid,
                "ts": time.time(),
            }
            records.append(rec)
            self._write_lineage(records)
            ran.append(name)
        return {
            "ran": ran,
            "skipped": skipped,
            "recovered": recovered,
            "lineage": records,
        }

    @staticmethod
    def _snapshot_rows(spark: SparkSession, snap: dict) -> int:
        """Rows a snapshot added: Iceberg summaries carry added-records
        directly; manifest snapshots count via the added parquet footers."""
        if "added_records" in snap:
            return snap["added_records"]
        added = snap.get("added_files", [])
        return spark.read.parquet(*added).count() if added else 0

    def _write_lineage(self, records: list[dict]) -> None:
        tmp = self.lineage_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(records, fh)
        os.rename(tmp, self.lineage_path)

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        """The lineage as the engine's metrics table."""
        recs = self.lineage()
        if not recs:
            return spark.createDataFrame(
                [],
                "job_id string, chunk string, rows bigint, seconds double,"
                " snapshot_id bigint, ts double",
            )
        return spark.createDataFrame(recs).select(
            "job_id", "chunk", "rows", "seconds", "snapshot_id", "ts"
        )
