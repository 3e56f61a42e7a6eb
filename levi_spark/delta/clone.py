"""CLONE TABLE — zero-copy (shallow) and file-copy (deep) clones.

Mirrors Databricks' ``CREATE TABLE ... [SHALLOW|DEEP] CLONE``:

* **Shallow**: the clone's version-0 commit re-emits the source
  snapshot's add actions with ABSOLUTE paths into the source table —
  stats, partition values and deletion-vector descriptors included.
  Zero bytes of data move and no Spark job runs: the commit is
  O(live files) of driver-side metadata. Reads of the clone scan the
  source's files directly; writes to the clone land as ordinary
  relative-path files under the clone's own directory, so the clone
  diverges without ever touching the source (the Delta spec allows
  mixed relative/absolute add paths — our reader resolves both).
  At 100 TB this is THE way to fork a table for an experiment: the
  alternative copies the lake.

* **Deep**: live data files (and DV sidecars) are copied
  byte-for-byte and the same add actions re-emitted with their
  original relative paths — no row is ever re-encoded, so the work is
  a distcp-style transfer, not a read-decode-write of the dataset.
  CDC replication's bootstrap (:mod:`levi_spark.operators.replicate`)
  is this operation plus a ``txn`` action.

Both flavors preserve the source's schemaString, partitionColumns and
configuration verbatim (a clone of a column-mapped or
constraint-bearing table keeps those semantics); the table id is
fresh, and history does NOT follow the clone — its log starts at
version 0, exactly like Delta's CLONE.

Known hazard (same as Delta's documented one): VACUUM on the SOURCE
table can reclaim files a shallow clone still references — the
source's log no longer knows about the clone. Deep-clone (or
re-clone) before vacuuming a shallow clone's source. VACUUM on the
clone itself is safe: absolute references outside the clone's
directory are never reclaim candidates.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import SparkSession

from levi_spark.delta.log import DeltaLog
from levi_spark.fs import absolutize, copy_file, copy_tree, fs_for


def clone_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    shallow: bool = True,
    version: int | None = None,
    extra_action_lines: list[str] | None = None,
) -> dict:
    """Clone ``src_path``'s snapshot (latest, or ``version``) into a
    fresh Delta table at ``dst_path``. Returns
    ``{"version": 0, "files": n, "bytes": total, "shallow": bool}``.

    ``extra_action_lines`` lets a caller append raw action JSON lines
    (e.g. a ``txn`` marker) into the clone commit atomically.
    Raises ``ValueError`` if ``dst_path`` is already a Delta table, or
    for a DEEP clone of a source whose adds reference external
    (absolute/URI) files that cannot be re-linked locally.
    """
    from levi_spark.delta.writer import _publish_commit

    src_log = DeltaLog(spark, src_path)
    snap = src_log.snapshot(version)
    meta = snap.metadata
    dst_path = absolutize(dst_path)
    dfs = fs_for(dst_path)
    if dfs.isdir(os.path.join(dst_path, "_delta_log")):
        raise ValueError(f"destination is already a Delta table: {dst_path}")

    adds = [r["add"] for r in snap.live_adds_collected()]
    total_bytes = sum(a["size"] or 0 for a in adds)
    dfs.mkdirs(dst_path)

    out_adds: list[dict] = []
    if shallow:
        for a in adds:
            rel = unquote(a["path"])
            # absolute path into the SOURCE table, percent-encoded the
            # way the spec encodes add paths (reader unquotes)
            abs_path = (
                rel
                if os.path.isabs(rel) or "://" in rel
                else os.path.join(src_log.table_path, rel)
            )
            dv = a["deletionVector"]
            abs_dv = None
            dv_storage = None
            if dv is not None and dv["pathOrInlineDv"]:
                _require_path_dv(dv, shallow=True)
                st = dv["storageType"]
                d = dv["pathOrInlineDv"]
                if st == "u":
                    # relative-UUID DV: resolves against the TABLE dir,
                    # which for the clone would be the wrong table —
                    # rewrite to the spec's absolute marker 'p' pointing
                    # into the source
                    from levi_spark.delta.roaring import dv_file_path

                    abs_dv = dv_file_path(src_log.table_path, d)
                    dv_storage = "p"
                elif st == "i":
                    abs_dv = d  # inline payload: portable verbatim
                else:
                    # 'path' (ours) / 'p': absolute into the source
                    # (emitted verbatim — no quoting round-trip in the
                    # reader)
                    abs_dv = d if os.path.isabs(d) else os.path.join(
                        src_log.table_path, d
                    )
            out_adds.append(
                _add_dict(a, quote(abs_path, safe="/"), abs_dv, dv_storage)
            )
    else:
        # Validate EVERY add and DV descriptor (relinkability, storage
        # type, source existence) in a full pass BEFORE the first byte
        # is copied: a failure must leave dst_path untouched, not
        # strewn with orphan data files that a later clone to the same
        # destination would silently merge over.
        from levi_spark.delta.roaring import dv_file_path

        rels: list[str] = []
        # per add: (emitted pathOrInlineDv, table-relative file to copy
        # or None for inline)
        dv_plans: list[tuple[str, str | None] | None] = []
        for a in adds:
            rel = unquote(a["path"])
            if os.path.isabs(rel) or "://" in rel:
                raise ValueError(
                    f"deep clone cannot re-link external file: {rel}"
                )
            if not src_log.fs.exists(os.path.join(src_log.table_path, rel)):
                raise ValueError(
                    f"deep clone source file missing on disk: {rel}"
                )
            dv = a["deletionVector"]
            plan = None
            if dv is not None and dv["pathOrInlineDv"]:
                _require_path_dv(dv, shallow=False)
                st = dv["storageType"]
                d = dv["pathOrInlineDv"]
                if st == "i":
                    plan = (d, None)  # inline payload, nothing to copy
                elif st == "u":
                    # standard UUID DV: resolves relative to the table
                    # dir — copy under the same relative name, emit
                    # the descriptor verbatim
                    copy_rel = os.path.relpath(
                        dv_file_path(src_log.table_path, d),
                        src_log.table_path,
                    )
                    plan = (d, copy_rel)
                else:  # 'path'
                    if os.path.isabs(d) or "://" in d:
                        raise ValueError(
                            "deep clone cannot re-link external DV "
                            f"sidecar: {d}"
                        )
                    plan = (d, d)
                if plan[1] is not None and not src_log.fs.exists(
                    os.path.join(src_log.table_path, plan[1])
                ):
                    raise ValueError(
                        f"deep clone DV sidecar missing on disk: {plan[1]}"
                    )
            rels.append(rel)
            dv_plans.append(plan)
        copied_dv: set[str] = set()
        for a, rel, plan in zip(adds, rels, dv_plans):
            dst_f = os.path.join(dst_path, rel)
            dfs.mkdirs(os.path.dirname(dst_f))
            copy_file(os.path.join(src_log.table_path, rel), dst_f)
            if plan is not None and plan[1] is not None and plan[1] not in copied_dv:
                src_dv = os.path.join(src_log.table_path, plan[1])
                dst_dv = os.path.join(dst_path, plan[1])
                # our writer emits a sidecar parquet *directory*;
                # a foreign log may reference a single sidecar file
                if src_log.fs.isdir(src_dv):
                    copy_tree(src_dv, dst_dv)
                else:
                    dfs.mkdirs(os.path.dirname(dst_dv))
                    copy_file(src_dv, dst_dv)
                copied_dv.add(plan[1])
            out_adds.append(
                _add_dict(a, a["path"], plan[0] if plan else None)
            )

    now_ms = int(time.time() * 1000)
    from levi_spark.delta.writer import in_commit_timestamp

    _clone_ci: dict = {
        "timestamp": now_ms,
        "operation": "CLONE",
        "operationParameters": {
            "source": src_log.table_path,
            "sourceVersion": str(snap.version),
            "isShallow": str(bool(shallow)).lower(),
        },
        "engineInfo": "levi-spark/0.1.0",
    }
    # the clone inherits the source configuration verbatim — if that
    # enables inCommitTimestamps, the clone's version-0 commit is
    # stamped (fresh log: predecessor is the wall clock)
    _ict = in_commit_timestamp(
        meta.configuration, os.path.join(dst_path, "_delta_log"), now_ms
    )
    if _ict is not None:
        _clone_ci["inCommitTimestamp"] = _ict
    lines = [
        # the clone inherits the SOURCE's protocol: its adds may carry
        # standard DV descriptors and its configuration may enable
        # column mapping — a default {1,2} protocol would make the
        # clone spec-invalid for foreign readers
        json.dumps({"protocol": snap.protocol}),
        json.dumps(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": meta.schema.json(),
                    "partitionColumns": meta.partition_columns,
                    "configuration": meta.configuration,
                    "createdTime": now_ms,
                }
            }
        ),
        *[json.dumps({"add": a}) for a in out_adds],
        *(extra_action_lines or []),
        json.dumps({"commitInfo": _clone_ci}),
    ]
    log_dir = os.path.join(dst_path, "_delta_log")
    dfs.mkdirs(log_dir)
    _publish_commit(log_dir, 0, "\n".join(lines) + "\n", rebase_ok=False)
    return {
        "version": 0,
        "files": len(out_adds),
        "bytes": total_bytes,
        "shallow": bool(shallow),
    }


def _require_path_dv(dv: dict, *, shallow: bool) -> None:
    """Clone supports file-based deletion vectors only. The engine's
    own sidecars use storageType='path' (relative file reference) and
    work for both flavors. A foreign log's spec marker 'p' means the
    reference is ALREADY an absolute path (Delta protocol, deletion
    vector descriptor) — portable verbatim for a SHALLOW clone (the
    add action is re-emitted pointing at the same absolute sidecar)
    but not re-linkable by a deep clone's relative-path copy. Inline
    DVs ('i', base85 payload in pathOrInlineDv) and relative-UUID ones
    ('u') must never be treated as filesystem paths: absolutizing or
    copying them would manufacture a bogus descriptor. Refuse up
    front, before any bytes move."""
    st = dv["storageType"]
    if st in ("path", "u", "i") or (shallow and st == "p"):
        # 'path' copies/absolutizes like data files; 'u' resolves
        # relative to the table dir (shallow rewrites it to an absolute
        # 'p' into the source, deep copies the DV file under the same
        # relative name); 'i' carries its payload inline — portable
        # everywhere; 'p' (external absolute file) is portable only
        # for shallow clones
        return
    if st == "p":
        raise ValueError(
            "deep clone cannot re-link an absolute-path ('p') deletion "
            "vector; shallow-clone it instead"
        )
    raise ValueError(
        f"clone supports storageType 'path'/'u'/'i' deletion vectors "
        f"(plus 'p' for shallow clones), got {st!r}"
    )


def _add_dict(
    a, path: str, dv_path: str | None, dv_storage: str | None = None
) -> dict:
    dv = a["deletionVector"]
    out_dv = None
    if dv is not None and dv["pathOrInlineDv"]:
        out_dv = {
            "storageType": dv_storage or dv["storageType"],
            "pathOrInlineDv": dv_path,
            "cardinality": dv["cardinality"],
        }
        # standard DV framing fields ride along when present (needed
        # to locate + verify the blob inside a shared DV file). The
        # descriptor may be a raw JSON dict (driver fast path) or a
        # schema-conformed Row — index both uniformly.
        for k in ("offset", "sizeInBytes"):
            try:
                v = dv[k]
            except (KeyError, ValueError, IndexError):
                v = None
            if v is not None:
                out_dv[k] = v
    out = {
        "path": path,
        "partitionValues": dict(a["partitionValues"] or {}),
        "size": a["size"],
        "modificationTime": a["modificationTime"],
        "dataChange": True,
        "stats": a["stats"],
        "deletionVector": out_dv,
    }
    # row tracking rides along: the clone references the same bytes at
    # the same positions, so baseRowId/defaultRowCommitVersion remain
    # valid (the clone's high-water mark re-derives from these adds)
    for k in ("baseRowId", "defaultRowCommitVersion"):
        try:
            v = a[k]
        except (KeyError, ValueError, IndexError):
            v = None
        if v is not None:
            out[k] = v
    return out
