"""Full Dremel record ASSEMBLY for parquet — arbitrary nesting.

:mod:`levi_spark.operators.parquetmeta` reads flat columns and
single-level lists; this module closes the general case: any tree of
OPTIONAL / REQUIRED / REPEATED groups — lists of lists, lists of
structs, structs holding lists, maps, and any composition — is
reassembled into Python row objects from nothing but the raw
definition/repetition level streams and the footer schema tree
(Dremel record shredding run backwards; Melnik et al., VLDB 2010,
§4.1-4.2 describe the forward striping these levels encode).

Two layers:

* :func:`assemble_leaf` — one leaf column's (defs, reps, values)
  streams -> one *path repr* per record.  The repr mirrors every
  node on the root->leaf path so NOTHING is collapsed early: a
  REPEATED node becomes a Python list, an OPTIONAL node becomes
  ``None`` or a :class:`_Present` wrapper (the wrapper is what keeps
  "struct is null" distinct from "struct present, field null" — both
  would read ``None`` unwrapped), a REQUIRED node passes through.
* :func:`merge_leaves` — zips every leaf's path reprs back together
  over the schema tree: struct nodes merge their children field by
  field (asserting the leaves agree on presence — they must, the
  levels encode the same ancestors), repeated nodes zip
  position-by-position (same skeleton length by construction).

A final logical pass collapses the LIST / MAP wrapper groups the
format mandates (three-level ``group (LIST) -> repeated group list
-> element`` and the two-level backward-compat forms from the
parquet-format spec's rules) so ``read_rows`` returns what users
mean: ``[1, 2]`` not ``{"list": [{"element": 1}, ...]}``, maps as
``[(key, value), ...]`` — byte-for-byte the shape of pyarrow's
``Table.to_pylist()``, which the tests cross-check against.

Scale shape: assembly is a per-file, per-leaf streaming pass over
pages already decoded by the first-principles reader — at 100 TB it
runs inside the same map task as the page decode, no shuffle, no
driver involvement.
"""

from __future__ import annotations

from levi_spark.operators.parquetmeta import (
    _iter_pages,
    parse_footer,
)
import struct


class _Present:
    """Wrapper marking an OPTIONAL node as defined (vs None =
    absent); keeps struct-null distinguishable from field-null."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __repr__(self):  # pragma: no cover - debug aid
        return f"P({self.v!r})"

    def __eq__(self, other):
        return isinstance(other, _Present) and self.v == other.v


def _path_nodes(tree: list[dict], dotted: str) -> list[dict]:
    """Root->leaf node list for a dotted leaf path."""
    parts = dotted.split(".")
    nodes: list[dict] = []
    level = tree
    for p in parts:
        node = next((n for n in level if n["name"] == p), None)
        if node is None:
            raise ValueError(f"schema path {dotted!r}: no node {p!r}")
        nodes.append(node)
        level = node["children"]
    if nodes[-1]["ptype"] is None:
        raise ValueError(f"{dotted!r} is a group, not a leaf")
    return nodes


def assemble_leaf(nodes: list[dict], defs: list[int],
                  reps: list[int], vals: list) -> list:
    """One leaf's level/value streams -> one path repr per record.

    ``nodes`` is the root->leaf path (each with cumulative ``def``,
    ``repl`` and its own ``rep`` type).  Records split where the
    repetition level returns to 0; inside a record the levels drive
    a recursive descent over the path.
    """
    it = iter(vals)
    max_def = nodes[-1]["def"]

    def build(ni: int, entries: list[tuple[int, int]]):
        node = nodes[ni]
        d0 = entries[0][0]
        if node["rep"] == 1:  # OPTIONAL
            if d0 < node["def"]:
                if len(entries) != 1:
                    raise ValueError("parquet levels: entries below "
                                     "an absent optional node")
                return None
            return _Present(inner(ni, entries))
        if node["rep"] == 2:  # REPEATED
            if d0 < node["def"]:
                if len(entries) != 1:
                    raise ValueError("parquet levels: entries below "
                                     "an empty repeated node")
                return []
            items: list[list[tuple[int, int]]] = []
            start = 0
            for k in range(1, len(entries)):
                if entries[k][1] <= node["repl"]:
                    items.append(entries[start:k])
                    start = k
            items.append(entries[start:])
            return [inner(ni, item) for item in items]
        return inner(ni, entries)  # REQUIRED

    def inner(ni: int, entries: list[tuple[int, int]]):
        if ni == len(nodes) - 1:  # leaf content (presence settled)
            if len(entries) != 1:
                raise ValueError("parquet levels: multiple entries "
                                 "for one leaf value")
            if entries[0][0] != max_def:
                raise ValueError("parquet levels: leaf content with "
                                 "def level below max")
            return next(it)
        return build(ni + 1, entries)

    records: list = []
    n = len(defs)
    i = 0
    while i < n:
        if reps[i] != 0:
            raise ValueError("parquet levels: record starts with "
                             f"repetition level {reps[i]}")
        j = i + 1
        while j < n and reps[j] != 0:
            j += 1
        records.append(
            build(0, [(defs[k], reps[k]) for k in range(i, j)])
        )
        i = j
    leftover = next(it, _SENTINEL)
    if leftover is not _SENTINEL:
        raise ValueError("parquet levels: values left over after "
                         "assembly — level/value streams disagree")
    return records


_SENTINEL = object()


def merge_leaves(node: dict, reprs: dict[str, object]):
    """Merge per-leaf path reprs (keyed by dotted leaf path) for the
    subtree at ``node`` into one structural value: dicts for groups,
    lists for repeated nodes."""
    vals = list(reprs.values())
    if node["rep"] == 1:
        if all(v is None for v in vals):
            return None
        if not all(isinstance(v, _Present) for v in vals):
            raise ValueError(
                f"parquet assembly: leaves disagree on presence of "
                f"optional node {node['name']!r}"
            )
        return _merge_content(
            node, {p: v.v for p, v in reprs.items()}
        )
    if node["rep"] == 2:
        lens = {len(v) for v in vals}
        if len(lens) != 1:
            raise ValueError(
                f"parquet assembly: leaves disagree on length of "
                f"repeated node {node['name']!r}: {sorted(lens)}"
            )
        (ln,) = lens
        return [
            _merge_content(node, {p: v[i] for p, v in reprs.items()})
            for i in range(ln)
        ]
    return _merge_content(node, reprs)


def _merge_content(node: dict, reprs: dict[str, object]):
    if not node["children"]:  # leaf: exactly one repr, the value
        (v,) = reprs.values()
        return v
    out = {}
    for ch in node["children"]:
        prefix = ch["name"] if node["path_prefix"] == "" else (
            node["path_prefix"] + "." + ch["name"]
        )
        sub = {
            p: v for p, v in reprs.items()
            if p == prefix or p.startswith(prefix + ".")
        }
        if sub:  # a group with no read leaves contributes nothing
            out[ch["name"]] = merge_leaves(ch, sub)
    return out


def _annotate_prefixes(tree: list[dict], prefix: str = "") -> None:
    for n in tree:
        n["path_prefix"] = (
            n["name"] if prefix == "" else prefix + "." + n["name"]
        )
        _annotate_prefixes(n["children"], n["path_prefix"])


def _is_list_group(node: dict) -> bool:
    # ConvertedType LIST == 3, LogicalType union member 3 (LIST)
    return node["ptype"] is None and (
        node["converted"] == 3
        or (node["logical"] is not None and 3 in node["logical"])
    )


def _is_map_group(node: dict) -> bool:
    # ConvertedType MAP == 1 / MAP_KEY_VALUE == 2, LogicalType 2
    return node["ptype"] is None and (
        node["converted"] in (1, 2)
        or (node["logical"] is not None and 2 in node["logical"])
    )


def _leaf_converter(node: dict):
    """Value converter for a leaf's logical/converted type, or None.
    Mirrors pyarrow ``to_pylist``: DATE -> datetime.date, TIMESTAMP
    -> datetime (tz-aware iff isAdjustedToUTC; pandas.Timestamp for
    NANOS, which datetime cannot hold), TIME -> datetime.time,
    DECIMAL -> decimal.Decimal, unsigned INTEGER -> reinterpreted
    int.  LogicalType wins over the legacy ConvertedType when both
    are present (pyarrow writes both)."""
    import datetime as _dt
    import decimal as _dec

    conv = node["converted"]
    lt = node["logical"] or {}
    ptype = node["ptype"]
    if 6 in lt or conv == 6:  # DATE (epoch days)
        epoch = _dt.date(1970, 1, 1)
        return lambda v: epoch + _dt.timedelta(days=v)
    if 8 in lt or conv in (9, 10):  # TIMESTAMP
        if 8 in lt:
            unit = lt[8].get(2) or {}
            utc = bool(lt[8].get(1))
            u = "ms" if 1 in unit else ("us" if 2 in unit else "ns")
        else:
            # legacy ConvertedType: per parquet.thrift these are
            # UTC-adjusted instants
            u = "ms" if conv == 9 else "us"
            utc = True
        if u == "ns":
            import pandas as _pd

            tz = "UTC" if utc else None
            return lambda v: _pd.Timestamp(v, unit="ns", tz=tz)
        ep = _dt.datetime(
            1970, 1, 1,
            tzinfo=_dt.timezone.utc if utc else None,
        )
        mult = 1000 if u == "ms" else 1
        return lambda v: ep + _dt.timedelta(microseconds=v * mult)
    if 7 in lt or conv in (7, 8):  # TIME
        if 7 in lt:
            unit = lt[7].get(2) or {}
            u = "ms" if 1 in unit else ("us" if 2 in unit else "ns")
        else:
            u = "ms" if conv == 7 else "us"
        # integer arithmetic only: 7 ms / 0.001 in floats floors to
        # 6999 us (0.001 has no exact binary form)
        def to_time(v, _u=u):
            if _u == "ms":
                us = v * 1000
            elif _u == "ns":
                us = v // 1000
            else:
                us = v
            return (_dt.datetime.min
                    + _dt.timedelta(microseconds=us)).time()

        return to_time
    if 5 in lt or conv == 5:  # DECIMAL
        scale = (lt.get(5) or {}).get(1)
        if scale is None:
            scale = node["scale"] or 0
        if ptype in ("INT32", "INT64"):
            return lambda v: _dec.Decimal(v).scaleb(-scale)
        return lambda v: _dec.Decimal(
            int.from_bytes(v, "big", signed=True)
        ).scaleb(-scale)
    if 10 in lt and not lt[10].get(2, True):  # unsigned INTEGER
        bw = lt[10].get(1) or (
            32 if ptype == "INT32" else 64
        )
        mask = (1 << bw) - 1
        return lambda v: v & mask
    return None


def _collapse(node: dict, value):
    """Apply the LIST / MAP logical annotations to a merged
    structural value so the result matches the logical row shape
    (pyarrow ``to_pylist``).  Implements the parquet-format
    backward-compatibility rules: a 3-level list's repeated group is
    unwrapped to its single child; a repeated node that is itself a
    primitive, has >1 fields, or is named ``array`` /
    ``<parent>_tuple`` IS the element (2-level forms)."""
    if value is None:
        return None
    if node["ptype"] is not None:  # leaf primitive
        cv = node.get("_leaf_conv")
        if cv is None:
            cv = _leaf_converter(node) or False
            node["_leaf_conv"] = cv
        return cv(value) if cv else value
    if node["rep"] == 2:
        # repeated group used directly: value is a list of contents
        return [_collapse_group_content(node, item) for item in value]
    if _is_list_group(node):
        repeated = node["children"][0]
        items = value.get(repeated["name"], [])
        if repeated["ptype"] is not None:
            return list(items)  # 2-level: repeated primitive
        two_level = (
            len(repeated["children"]) != 1
            or repeated["name"] == "array"
            or repeated["name"] == node["name"] + "_tuple"
        )
        if two_level:
            return [
                _collapse_group_content(repeated, item)
                for item in items
            ]
        elem = repeated["children"][0]
        return [
            _collapse(elem, item[elem["name"]]) for item in items
        ]
    if _is_map_group(node):
        kv = node["children"][0]
        items = value.get(kv["name"], [])
        key_n, val_n = kv["children"][0], kv["children"][1]
        return [
            (
                _collapse(key_n, item.get(key_n["name"])),
                _collapse(val_n, item.get(val_n["name"])),
            )
            for item in items
        ]
    return _collapse_group_content(node, value)


def _collapse_group_content(node: dict, content):
    if node["ptype"] is not None:
        return content
    if content is None:
        return None
    return {
        ch["name"]: _collapse(ch, content[ch["name"]])
        for ch in node["children"]
        if ch["name"] in content
    }


def _leaf_streams_group(data: bytes, footer: dict, path: str,
                        group: dict):
    """Concatenated (defs, reps, vals) for one leaf within ONE row
    group.  Row groups never split records (v1 pages may, so
    per-page assembly would be wrong — the row group is the
    correctness boundary, and also the 100 TB memory boundary: a map
    task holds one group's level streams at a time)."""
    ptype = dict(footer["columns"])[path]
    max_def, max_rep = footer["levels"][path]
    tlen = footer["type_lengths"][path]
    utf8 = footer["utf8"][path]
    defs: list[int] = []
    reps: list[int] = []
    vals: list = []
    chunk = next(c for c in group["columns"] if c["path"] == path)
    for d, r, v in _iter_pages(
        data, chunk, ptype, max_def, max_rep, tlen, utf8
    ):
        defs.extend(d)
        reps.extend(r)
        vals.extend(v)
    return defs, reps, vals


def _parse_file(data: bytes) -> dict:
    if data[-4:] != b"PAR1":
        raise ValueError("trailing PAR1 magic missing")
    (flen,) = struct.unpack_from("<I", data, len(data) - 8)
    return parse_footer(data[len(data) - 8 - flen: len(data) - 8])


def _select_tops(footer: dict, tree: list[dict],
                 columns: list[str] | None
                 ) -> tuple[list[dict], list[str]]:
    top = [
        n for n in tree
        if columns is None or n["name"] in columns
    ]
    if columns is not None:
        missing = set(columns) - {n["name"] for n in top}
        if missing:
            raise ValueError(f"no such top-level fields: "
                             f"{sorted(missing)}")
    want = [
        p for p, _t in footer["columns"]
        if any(p == n["name"] or p.startswith(n["name"] + ".")
               for n in top)
    ]
    return top, want


def iter_row_groups_bytes(data: bytes,
                          columns: list[str] | None = None):
    """Yield one list of row dicts PER ROW GROUP — the 100 TB memory
    shape: row groups never split records, so each group's level
    streams assemble independently and a map task only ever holds
    one group's worth of levels and values.  ``columns`` limits the
    read to the named TOP-LEVEL fields (their full subtrees)."""
    footer = _parse_file(data)
    tree = footer["schema_tree"]
    _annotate_prefixes(tree)
    top, want = _select_tops(footer, tree, columns)
    nodes_by_path = {p: _path_nodes(tree, p) for p in want}
    total = 0
    for g in footer["row_groups"]:
        per_leaf: dict[str, list] = {}
        n_records = None
        for path in want:
            defs, reps, vals = _leaf_streams_group(
                data, footer, path, g
            )
            recs = assemble_leaf(nodes_by_path[path], defs, reps,
                                 vals)
            if n_records is None:
                n_records = len(recs)
            elif len(recs) != n_records:
                raise ValueError(
                    f"leaf {path!r}: {len(recs)} records, expected "
                    f"{n_records} — level streams disagree across "
                    "leaves"
                )
            per_leaf[path] = recs
        if n_records is None:  # no leaves selected
            n_records = g["num_rows"] or 0
            total += n_records
            yield [{} for _ in range(n_records)]
            continue
        if g["num_rows"] not in (None, n_records):
            raise ValueError(
                f"assembled {n_records} records in a row group of "
                f"{g['num_rows']}"
            )
        total += n_records
        rows: list[dict] = []
        for i in range(n_records):
            row = {}
            for node in top:
                sub = {
                    p: per_leaf[p][i] for p in want
                    if p == node["name"]
                    or p.startswith(node["name"] + ".")
                }
                merged = merge_leaves(node, sub)
                row[node["name"]] = _collapse(node, merged)
            rows.append(row)
        yield rows
    if footer["num_rows"] not in (None, total):
        raise ValueError(
            f"assembled {total} records, footer says "
            f"{footer['num_rows']}"
        )


def read_rows_bytes(data: bytes, columns: list[str] | None = None
                    ) -> list[dict]:
    """Read an in-memory parquet file's ROWS from first principles:
    every leaf column is page-decoded, Dremel-assembled, merged over
    the schema tree and logically collapsed into one dict per row —
    the shape of ``pyarrow.Table.to_pylist()``.  ``columns`` limits
    the read to the named TOP-LEVEL fields (their full subtrees).
    Assembly runs row group by row group
    (:func:`iter_row_groups_bytes`)."""
    return [
        r for grp in iter_row_groups_bytes(data, columns)
        for r in grp
    ]


def read_rows(path: str, columns: list[str] | None = None
              ) -> list[dict]:
    """File-path variant of :func:`read_rows_bytes`."""
    with open(path, "rb") as f:
        return read_rows_bytes(f.read(), columns)
