"""Deletion vectors: delete rows without rewriting data files.

The reference's only delete primitive is a whole-file-rewriting Delta
MERGE (``/root/reference/levi/__init__.py:157-166``) and its dedup ops
rewrite the entire table (``:347-351``). At 100 TB a point delete that
rewrites gigabyte files is the dominant cost, so this module adds the
modern Delta-protocol answer — deletion vectors — to the engine's own
log format:

* ``soft_delete(spark, path, predicate)`` marks matching rows deleted
  by writing a parquet *sidecar* of (file_name, row_index) keys under
  ``_deletion_vectors/`` and re-emitting the affected ``add`` actions
  with a ``deletionVector`` descriptor ({storageType: "path",
  pathOrInlineDv, cardinality} — the public Delta DV descriptor shape).
  Cost is O(matching rows), not O(bytes of touched files). A file whose
  every row is deleted becomes a plain ``remove`` tombstone.
* The read path (``Snapshot.to_df``) anti-joins the scan against the
  sidecar on (file, row_index) via the parquet reader's
  ``_metadata.row_index`` — pushdown and partition pruning on the scan
  are untouched, and the DV frame is broadcast.
* ``purge_deleted(spark, path)`` is the compaction half: physically
  rewrites only the DV-bearing files (their surviving rows), dropping
  the descriptors — the OPTIMIZE-style "hard delete" that bounds DV
  accumulation. Scan cost is O(files with DVs), never the whole table.

Sidecars are written by Spark executors (the doomed-key frame is never
collected); only per-file cardinalities (metadata scale: one row per
affected file) come to the driver to build the commit.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from urllib.parse import unquote as _unquote

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from levi_spark.delta.log import DeltaLog
from levi_spark.delta.writer import DEFAULT_CHECKPOINT_INTERVAL, write_delta

DV_DIR = "_deletion_vectors"


def _append_commit(
    log: DeltaLog,
    snap,
    version: int,
    actions: list[dict],
    operation: str,
    params: dict,
    protocol: dict | None = None,
) -> None:
    """Append one commit JSON (re-emitting protocol+metaData like the
    writer does). Published through the writer's conflict-safe
    ``_publish_commit`` with ``rebase_ok=False``: a DV commit re-emits
    add actions read from its snapshot, so a concurrent commit
    invalidates it — the conflict surfaces as the documented retryable
    ``ValueError``, never a raw ``FileExistsError``."""
    now_ms = int(time.time() * 1000)
    # default: preserve the table's current protocol (a feature upgrade
    # must never be reverted by an unrelated DV commit)
    lines = [json.dumps({"protocol": protocol or snap.protocol})]
    meta = snap.metadata
    lines.append(
        json.dumps(
            {
                "metaData": {
                    "id": meta.id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": meta.schema.json(),
                    "partitionColumns": meta.partition_columns,
                    "configuration": meta.configuration,
                    "createdTime": meta.created_time or now_ms,
                }
            }
        )
    )
    lines += [json.dumps(a) for a in actions]
    from levi_spark.delta.writer import _publish_commit, in_commit_timestamp

    ci: dict = {
        "timestamp": now_ms,
        "operation": operation,
        "operationParameters": params,
        "engineInfo": "levi-spark/0.1.0",
    }
    ict = in_commit_timestamp(meta.configuration, log.log_path, now_ms)
    if ict is not None:
        ci["inCommitTimestamp"] = ict
    lines.append(json.dumps({"commitInfo": ci}))

    _publish_commit(log.log_path, version, "\n".join(lines) + "\n", rebase_ok=False)


def _write_standard_dvs(spark, table_path: str, dv_out) -> dict[str, dict]:
    """Write one SPEC-CONFORMANT deletion-vector file per affected data
    file — ``deletion_vector_<uuid>.bin`` at the table root, framed +
    CRC'd roaring-bitmap blobs (:mod:`levi_spark.delta.roaring`) — and
    return ``file_name -> 'u' descriptor``. Encoding and file writes
    happen EXECUTOR-side via applyInPandas over the file_name groups
    (each group is bounded by one data file's row count); only the
    per-file descriptor rows come back to the driver."""
    import pandas as pd

    from levi_spark.fs import local_form

    remote_root = None
    lp = local_form(table_path)
    if lp is None:
        # Remote URI table: executors' Python open() cannot speak the
        # scheme, so the DV ``.bin`` files are encoded into a
        # DRIVER-VISIBLE local scratch (``LEVI_EXEC_SCRATCH`` or the
        # system tempdir — on a real cluster a shared mount; in
        # local/local-cluster mode the tempdir qualifies) and copied
        # out to the table root through the scheme filesystem (one
        # streaming driver-side pass, one file per affected data file
        # — DV count is bounded by the commit's file count, a
        # metadata-plane volume). ``dv_format='sidecar'`` remains the
        # zero-copy object-store path (its sidecars ride ``df.write``).
        import tempfile

        remote_root = table_path
        lp = tempfile.mkdtemp(
            prefix="levi_dvstage_",
            dir=os.environ.get("LEVI_EXEC_SCRATCH") or None,
        )
    table_path = lp

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import os as _os
        import uuid as _uuid

        from levi_spark.delta.roaring import (
            INLINE_DV_MAX_BYTES,
            encode_rbm_array,
            write_dv_file,
            z85_encode,
        )

        rows = []
        for fname, grp in pdf.groupby("file_name"):
            blob = encode_rbm_array(grp["row_index"].tolist())
            if len(blob) <= INLINE_DV_MAX_BYTES:
                # tiny bitmap: inline it in the log ('i'), no file IO —
                # the spec's small-DV optimization (z85 needs 4-byte
                # alignment; sizeInBytes recovers the true length)
                padded = blob + b"\x00" * ((-len(blob)) % 4)
                rows.append(
                    (fname, "i", z85_encode(padded), None, len(blob), len(grp))
                )
                continue
            data, offs = write_dv_file([blob])
            u = _uuid.uuid4()
            with open(
                _os.path.join(table_path, f"deletion_vector_{u}.bin"), "wb"
            ) as f:
                f.write(data)
            rows.append(
                (fname, "u", z85_encode(u.bytes), offs[0], len(blob), len(grp))
            )
        return pd.DataFrame(
            rows,
            columns=["file_name", "st", "pod", "offset", "size", "cardinality"],
        )

    desc_rows = (
        dv_out.repartition("file_name")
        .groupBy("file_name")
        .applyInPandas(
            encode,
            "file_name string, st string, pod string, offset int, size int, "
            "cardinality long",
        )
        .collect()
    )
    descs = {
        r["file_name"]: {
            "storageType": r["st"],
            "pathOrInlineDv": r["pod"],
            **({"offset": int(r["offset"])} if r["offset"] is not None else {}),
            "sizeInBytes": int(r["size"]),
            "cardinality": int(r["cardinality"]),
        }
        for r in desc_rows
    }
    if remote_root is not None:
        from levi_spark.fs import copy_file, fs_for

        fs_for(remote_root).mkdirs(remote_root)
        for name in os.listdir(table_path):
            if name.startswith("deletion_vector_"):
                copy_file(os.path.join(table_path, name),
                          f"{remote_root.rstrip('/')}/{name}")
        import shutil

        shutil.rmtree(table_path, ignore_errors=True)
    return descs


def _standard_dv_protocol(snap) -> dict:
    """The table's protocol upgraded (never downgraded) for standard
    deletion vectors: reader/writer feature lists union in
    deletionVectors, and any active legacy reader feature — column
    mapping — is enumerated so the v3 protocol stays truthful."""
    from levi_spark.delta.writer import merge_protocol

    req_reader = ["deletionVectors"]
    if snap.metadata.column_mapping_mode != "none":
        req_reader = req_reader + ["columnMapping"]
    return merge_protocol(
        snap.protocol,
        {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": req_reader,
            "writerFeatures": ["deletionVectors"],
        },
    )


def soft_delete(
    spark: SparkSession,
    path: str,
    predicate: str | Column,
    checkpoint_interval: int | None = DEFAULT_CHECKPOINT_INTERVAL,
    emit_cdf: bool = False,
    dv_format: str = "sidecar",
) -> dict:
    """Logically delete every row matching ``predicate`` (SQL string or
    Column over the table's columns, partition columns included).

    Returns {"version", "rows_deleted", "files_affected",
    "files_removed"} — version is -1 when nothing matched (no commit).

    ``emit_cdf=True`` records the deleted rows (``_change_type =
    'delete'``) as change data in the same commit, making the DELETE
    visible to :func:`levi_spark.delta.changes.table_changes_cdf` —
    one extra pass over the matching rows, still O(matches).

    ``dv_format``: ``"sidecar"`` (default) writes the engine's parquet
    sidecar directory; ``"standard"`` writes SPEC-CONFORMANT deletion
    vectors — per-file ``deletion_vector_<uuid>.bin`` roaring-bitmap
    files with 'u' descriptors, and bumps the commit's protocol to
    minReaderVersion 3 + deletionVectors so any conforming Delta
    reader (delta-spark included) applies them. Both formats read back
    identically through this engine.
    """
    log = DeltaLog(spark, path)
    path = log.table_path
    snap = log.snapshot()
    if snap.metadata.configuration.get("delta.appendOnly") == "true":
        raise ValueError(
            "table is append-only (delta.appendOnly=true): DELETE is "
            "forbidden"
        )
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate

    # Doomed keys: already-DV'd rows are invisible to to_df, so re-deleting
    # the same predicate is a no-op commit, not a double delete.
    doomed = (
        snap.to_df(with_lineage=True)
        .where(pred)
        .select(
            F.col("_file_name").alias("file_name"),
            F.col("_row_index").alias("row_index"),
        )
    )

    # Cumulative per affected file: old sidecar rows for those files ride
    # into the new sidecar so each add points at exactly one directory.
    old = snap.deletion_vector_rows().select(
        F.col("__file_name").alias("file_name"), F.col("__row_index").alias("row_index")
    )
    affected_names = doomed.select("file_name").distinct()
    dv_out = doomed.unionByName(
        old.join(F.broadcast(affected_names), on="file_name", how="left_semi")
    )

    if dv_format not in ("sidecar", "standard"):
        raise ValueError(f"dv_format must be 'sidecar' or 'standard', got {dv_format!r}")
    out_dir = None
    std_descs: dict[str, dict] = {}
    if dv_format == "standard":
        std_descs = _write_standard_dvs(spark, path, dv_out)
        counts = {f: d["cardinality"] for f, d in std_descs.items()}
    else:
        rel_dir = os.path.join(DV_DIR, f"dv-{uuid.uuid4().hex}")
        out_dir = os.path.join(path, rel_dir)
        dv_out.write.parquet(out_dir)
        counts = {
            r["file_name"]: r["n"]
            for r in spark.read.parquet(out_dir)
            .groupBy("file_name")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    def _cleanup():
        from levi_spark.fs import fs_for

        if out_dir is not None:
            fs_for(out_dir).rmtree(out_dir)
        from levi_spark.delta.roaring import dv_file_path

        for d in std_descs.values():
            if d["storageType"] != "u":
                continue  # inline DVs live in the (uncommitted) log only
            try:
                fs_for(path).remove(dv_file_path(path, d["pathOrInlineDv"]))
            except OSError:
                pass

    if not counts:
        _cleanup()
        return {"version": -1, "rows_deleted": 0, "files_affected": 0, "files_removed": 0}

    # A table must not end up with MIXED descriptor families: sidecar
    # ('path') descriptors under a deletionVectors protocol would hit
    # foreign readers as an unknown storageType, and standard
    # descriptors on a v1 table would be silently ignored by them.
    # Affected files get this delete's format; check the survivors.
    surviving_formats = {
        "standard" if r["add"]["deletionVector"]["storageType"] != "path" else "sidecar"
        for r in snap.live_adds_collected()
        if r["add"]["deletionVector"] is not None
        and r["add"]["deletionVector"]["pathOrInlineDv"] is not None
        and os.path.basename(_unquote(r["add"]["path"])) not in counts
    }
    if surviving_formats - {dv_format}:
        _cleanup()
        raise ValueError(
            f"table has live {surviving_formats.pop()!r}-format deletion "
            f"vectors; a {dv_format!r}-format delete would mix descriptor "
            "families. purge_deleted() first, or keep one dv_format per "
            "table"
        )

    # Driver-side commit build over the (metadata-scale) affected adds.
    now_ms = int(time.time() * 1000)
    actions: list[dict] = []
    files_removed = 0
    rows_deleted = 0
    for row in snap.live_adds_collected():
        add = row["add"].asDict(recursive=True)
        name = os.path.basename(add["path"])
        if name not in counts:
            continue
        card = counts[name]
        prev_card = (add.get("deletionVector") or {}).get("cardinality") or 0
        rows_deleted += card - prev_card
        num_records = None
        if add.get("stats"):
            num_records = json.loads(add["stats"]).get("numRecords")
        if num_records is not None and card >= num_records:
            actions.append(
                {
                    "remove": {
                        "path": add["path"],
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
            files_removed += 1
            continue
        add["deletionVector"] = (
            std_descs[name]
            if dv_format == "standard"
            else {
                "storageType": "path",
                "pathOrInlineDv": rel_dir,
                "cardinality": card,
            }
        )
        actions.append({"add": {k: v for k, v in add.items() if v is not None}})

    if emit_cdf:
        from levi_spark.delta.writer import cdc_action_lines, write_cdc_files

        deleted_rows = (
            snap.to_df(with_lineage=True)
            .where(pred)
            .select(*snap.metadata.data_columns)
            .withColumn("_change_type", F.lit("delete"))
        )
        actions += [
            json.loads(ln)
            for ln in cdc_action_lines(write_cdc_files(deleted_rows, path))
        ]

    version = snap.version + 1
    try:
        _append_commit(
            log, snap, version, actions, "DELETE", {"predicate": str(predicate)},
            protocol=_standard_dv_protocol(snap) if dv_format == "standard" else None,
        )
    except ValueError:
        # Lost the commit race: the DV files written above are
        # unreachable from any committed version — remove them rather
        # than leaving orphans for vacuum, then surface the retry
        # contract.
        _cleanup()
        raise
    if checkpoint_interval and version % checkpoint_interval == 0:
        from levi_spark.delta.checkpoint import write_checkpoint

        write_checkpoint(spark, path, version)
    return {
        "version": version,
        "rows_deleted": rows_deleted,
        "files_affected": len(counts),
        "files_removed": files_removed,
    }


def purge_deleted(spark: SparkSession, path: str) -> dict:
    """Physically rewrite every DV-bearing file without its deleted
    rows, in one commit (new files + tombstones via the writer's
    ``replace_paths`` primitive). Untouched files keep their stats.
    Returns {"version", "files_rewritten"} (version -1 if no DVs)."""
    log = DeltaLog(spark, path)
    path = log.table_path
    snap = log.snapshot()
    from urllib.parse import unquote

    dv_paths = [
        unquote(r["add"]["path"])
        for r in snap.live_adds_collected()
        if r["add"]["deletionVector"] is not None
        and r["add"]["deletionVector"]["pathOrInlineDv"] is not None
    ]
    if not dv_paths:
        return {"version": -1, "files_rewritten": 0}
    # a purge rewrite does not logically modify the surviving rows —
    # preserve their row ids (same materialized-column mechanism as
    # OPTIMIZE) on row-tracked tables
    from levi_spark.operators.layout import _with_preserved_row_ids

    survivors = _with_preserved_row_ids(
        snap, lambda rid: snap.to_df(paths=dv_paths, with_row_ids=rid)
    )
    version = write_delta(
        survivors,
        path,
        mode="append",
        partition_by=list(snap.metadata.partition_columns),
        replace_paths=dv_paths,
        operation="PURGE",
        checkpoint_interval=None,
        identity_passthrough=True,  # rewrite carries existing ids
    )
    return {"version": version, "files_rewritten": len(dv_paths)}
