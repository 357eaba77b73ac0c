"""Apache Iceberg v2 metadata reader (r12): the second open table
format beside the Delta layer, implemented from the PUBLIC Iceberg
table spec only (iceberg.apache.org/spec — §Table Metadata, §Snapshots,
§Manifest Lists, §Manifests) with the from-scratch Avro OCF codec in
iceberg_format.py (no iceberg-java / pyiceberg / avro lib exists in
this container).

Iceberg's layering differs from Delta's in exactly the ways these keys
grade: there is no JSON commit log to replay — each snapshot is
SELF-CONTAINED, naming one manifest LIST (Avro), which names manifest
FILES (Avro), whose entries carry per-data-file status
(EXISTING/ADDED/DELETED), partition values, and stats. Table state
lives in `metadata/v<N>.metadata.json` (snapshots, schemas, partition
specs, snapshot-log), discovered via `version-hint.text`.

Each key stages its own spec-layout table from the shipped `orders`
fixture and grades the READER against a DuckDB oracle over the
unstaged source of truth — a reader that lists directories instead of
manifests double-counts replaced files; one that ignores entry status
returns deleted rows; one that ignores manifest partition values scans
every file.

Scale stance (100 TB): Iceberg metadata IS the planner's data
structure — manifest lists are one row per manifest and manifests one
row per file, so parsing them driver-side is the same bounded
scheduler-class work iceberg-core's planner does (real deployments
additionally shard manifest reads; the format keeps them independently
readable for exactly that). The data files the metadata selects are
read in ONE distributed parquet scan; partition pruning happens on
metadata alone, so a pruned query never opens an excluded file.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.iceberg_format import ocf_read, ocf_write
from random_forest_using_hadoop_spark.operators.scans import (
    _norm_file_uri,
    _tmp,
)
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table
from random_forest_using_hadoop_spark.helpers import local_rows

# entry statuses per the spec (§Manifests)
_ST_EXISTING, _ST_ADDED, _ST_DELETED = 0, 1, 2

# Broadcast gate for delete-application anti-joins: manifests record
# each delete file's record_count, so the planner can decide broadcast
# vs shuffle on REAL statistics instead of a hint-by-faith. Under the
# cap (~tens of MB of (path, pos) / key pairs) the delete set ships to
# every executor; past it the anti-join shuffles both sides on the
# join key — the plan a 100 TB CDC backlog needs.
_DELETE_BROADCAST_MAX_ROWS = 1_000_000


def _maybe_broadcast_deletes(df: DataFrame, n_rows: int) -> DataFrame:
    """Apply a broadcast hint only when manifest-recorded delete
    cardinality says the set is broadcast-sized."""
    return F.broadcast(df) if n_rows <= _DELETE_BROADCAST_MAX_ROWS else df



# Avro schemas for the metadata this layer stages/reads — the spec's
# field names and ids (field-id keys ride along as inert annotations;
# the codec is schema-driven and ignores unknown keys).
_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {
            "name": "file_sequence_number",
            "type": ["null", "long"],
            "field-id": 4,
        },
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [
                                {
                                    "name": "o_orderpriority",
                                    "type": ["null", "string"],
                                    "field-id": 1000,
                                }
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {
                        "name": "file_size_in_bytes",
                        "type": "long",
                        "field-id": 104,
                    },
                    # per-column value bounds (spec: map<field id, bytes>
                    # with single-value binary serialization) — Avro maps
                    # key on strings, so Iceberg models these as arrays
                    # of key/value records
                    {
                        "name": "lower_bounds",
                        "field-id": 125,
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "items": {
                                    "type": "record",
                                    "name": "k126_v127",
                                    "fields": [
                                        {"name": "key", "type": "int"},
                                        {"name": "value", "type": "bytes"},
                                    ],
                                },
                            },
                        ],
                    },
                    {
                        "name": "upper_bounds",
                        "field-id": 128,
                        "type": ["null", {"type": "array", "items": "k126_v127"}],
                    },
                    # equality-delete key columns (content=2 files only)
                    {
                        "name": "equality_ids",
                        "field-id": 135,
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}

# deterministic staged snapshot ids / timestamps (ms)
_S1, _S2, _S3 = 3051729675574597004, 3051729675574597005, 3051729675574597006
_T1, _T2, _T3 = 1_700_000_000_000, 1_700_000_060_000, 1_700_000_120_000


def _pfiles(
    data_dir: str, sub: str, col: str = "o_orderpriority"
) -> list[tuple[str, str]]:
    """(absolute path, partition value) of every parquet file under a
    partitionBy(col) output directory."""
    out = []
    base = os.path.join(data_dir, sub)
    if not os.path.isdir(base):
        return out
    for d in sorted(os.listdir(base)):
        pdir = os.path.join(base, d)
        if not (os.path.isdir(pdir) and d.startswith(f"{col}=")):
            continue
        pval = d.split("=", 1)[1]
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                out.append((os.path.join(pdir, f), pval))
    return out


def _entry(
    status: int,
    snap_id: int,
    seq: int,
    path: str,
    pval: str,
    bounds: tuple[list, list] | None = None,
    equality_ids: list[int] | None = None,
    content: int = 0,
    partition: dict | None = None,
    record_count: int | None = None,
) -> dict:
    """One manifest_entry record; record_count/file_size come from the
    parquet footer / filesystem — driver-side, bounded by file count
    (the stats a real writer records at commit time). `bounds` is
    (lower, upper) lists of {key, value} single-value-serialized pairs;
    `equality_ids` marks an equality-delete file's key columns;
    `partition` overrides the default single-field priority tuple for
    entries written under a different partition spec."""
    import pyarrow.parquet as pq

    return {
        "status": status,
        "snapshot_id": snap_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": (
                partition
                if partition is not None
                else {"o_orderpriority": pval}
            ),
            "record_count": (
                record_count
                if record_count is not None  # non-parquet (e.g. Puffin DV)
                else pq.ParquetFile(path).metadata.num_rows
            ),
            "file_size_in_bytes": os.path.getsize(path),
            "lower_bounds": bounds[0] if bounds else None,
            "upper_bounds": bounds[1] if bounds else None,
            "equality_ids": equality_ids,
        },
    }


def _write_manifest(
    meta_dir: str,
    name: str,
    entries: list[dict],
    schema: dict | None = None,
    spec_id: int = 0,
) -> str:
    path = os.path.join(meta_dir, name)
    ocf_write(
        path,
        schema or _MANIFEST_ENTRY_SCHEMA,
        entries,
        metadata={
            "format-version": "2",
            "content": "data",
            "partition-spec-id": str(spec_id),
        },
    )
    return path


def _entry_schema_for(partition_fields: list[tuple[str, int]]) -> dict:
    """Manifest-entry Avro schema whose partition record carries the
    given (name, field-id) string fields — each spec's manifests
    serialize their OWN partition tuple shape (spec §Manifests: the
    partition struct follows the manifest's declared spec)."""
    import copy

    schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    df_fields = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]["fields"]
    part = next(f for f in df_fields if f["name"] == "partition")
    part["type"]["fields"] = [
        {"name": n, "type": ["null", "string"], "field-id": fid}
        for n, fid in partition_fields
    ]
    return schema


def _write_manifest_list(
    meta_dir: str, snap_id: int, seq: int, manifests: list[tuple[str, int]]
) -> str:
    """Manifest list for one snapshot: (manifest path, added_snapshot_id)
    per manifest. Counts are filled from the manifests themselves.

    A carried-over manifest keeps the sequence number it was COMMITTED
    under (spec §Manifest Lists) — re-stamping it with the referencing
    snapshot's seq was the r13 advice finding; derive each manifest's
    own seq from its ADDED/DELETED entries (the ones its committing
    snapshot stamped). A carried manifest holding ONLY EXISTING
    entries (every original add compacted away) has no such stamp; its
    EXISTING entries keep their ORIGINAL sequence numbers, so the min
    over ALL entries is a faithful lower bound — falling back to the
    referencing list's seq would re-introduce the exact re-stamping
    bug. Only a fully entry-less manifest takes the list's seq."""
    recs = []
    for mpath, added_by in manifests:
        _, entries, _ = ocf_read(mpath)
        own_seq = max(
            (
                e["sequence_number"]
                for e in entries
                if e["status"] in (_ST_ADDED, _ST_DELETED)
                and e["sequence_number"] is not None
            ),
            default=None,
        )
        if own_seq is None:
            own_seq = min(
                (
                    e["sequence_number"]
                    for e in entries
                    if e["sequence_number"] is not None
                ),
                default=seq,
            )
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,  # data manifests
                "sequence_number": own_seq,
                "min_sequence_number": 1,
                "added_snapshot_id": added_by,
                "added_files_count": sum(
                    1 for e in entries if e["status"] == _ST_ADDED
                ),
                "existing_files_count": sum(
                    1 for e in entries if e["status"] == _ST_EXISTING
                ),
                "deleted_files_count": sum(
                    1 for e in entries if e["status"] == _ST_DELETED
                ),
                "added_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_ADDED
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_EXISTING
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_DELETED
                ),
            }
        )
    path = os.path.join(meta_dir, f"snap-{snap_id}-1-fixture.avro")
    ocf_write(path, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "2"})
    return path


def _iceberg_stage(spark: SparkSession, o: DataFrame, root: str) -> None:
    """Stage the shared three-snapshot Iceberg v2 table under `root`
    (wiped first), partitioned by o_orderpriority (identity transform):

    - s1 APPEND  even-orderkey rows  → manifest m1 (ADDED)
    - s2 APPEND  odd-orderkey rows   → manifest m2 (ADDED); the s2
      manifest LIST carries m1 + m2 (manifests are immutable and
      re-referenced — the structural property that makes Iceberg
      commits O(change), not O(table))
    - s3 DELETE  the 1-URGENT partition → rewrite-manifests style: one
      new manifest m3 with survivors EXISTING and the urgent files
      DELETED; the s3 list carries only m3 (deleted entries stay in the
      manifest for one snapshot per spec so incremental consumers see
      them)

    metadata/v1..v3.metadata.json accumulate the snapshots +
    snapshot-log; version-hint.text names the current metadata version
    (the HadoopCatalog discovery rule)."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir, exist_ok=True)
    # one parquet file per partition dir per snapshot slice (coalesce(1)
    # keeps the layout deterministic at fixture scale; a real writer
    # shards — the reader below never assumes one file per partition).
    # The two snapshot slices are INDEPENDENT writes to disjoint dirs,
    # so they run as concurrent jobs (optimization guide §2.6: overlap
    # independent jobs so the second fills the first's task tail) —
    # byte-identical output, ~halved wall time for the shared stage.
    def _write_slice(parity_dir):
        parity, dirname = parity_dir
        o.filter(F.col("o_orderkey") % 2 == parity).coalesce(1).write.mode(
            "overwrite"
        ).partitionBy("o_orderpriority").parquet(
            os.path.join(data_dir, dirname)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(_write_slice, [(0, "s1"), (1, "s2")]))
    evens = _pfiles(data_dir, "s1")
    odds = _pfiles(data_dir, "s2")

    m1 = _write_manifest(
        meta_dir,
        "m1-fixture.avro",
        [_entry(_ST_ADDED, _S1, 1, p, v) for p, v in evens],
    )
    m2 = _write_manifest(
        meta_dir,
        "m2-fixture.avro",
        [_entry(_ST_ADDED, _S2, 2, p, v) for p, v in odds],
    )
    # rewrite manifest: DELETED entries are stamped by the deleting
    # snapshot; EXISTING entries keep their ORIGINAL snapshot id and
    # data sequence number (spec §Manifests — inheritance is what lets
    # incremental consumers distinguish carried-over files from new
    # ones, and sequence-gated deletes stay correct across rewrites)
    m3 = _write_manifest(
        meta_dir,
        "m3-fixture.avro",
        [
            _entry(_ST_DELETED, _S3, 3, p, v)
            if v == "1-URGENT"
            else _entry(
                _ST_EXISTING,
                _S1 if (p, v) in set(evens) else _S2,
                1 if (p, v) in set(evens) else 2,
                p,
                v,
            )
            for p, v in evens + odds
        ],
    )
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    l2 = _write_manifest_list(meta_dir, _S2, 2, [(m1, _S1), (m2, _S2)])
    l3 = _write_manifest_list(meta_dir, _S3, 3, [(m3, _S3)])

    snaps = [
        (_S1, 1, _T1, l1, "append"),
        (_S2, 2, _T2, l2, "append"),
        (_S3, 3, _T3, l3, "delete"),
    ]
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
            {
                "id": 2,
                "name": "o_totalprice",
                "required": False,
                "type": "double",
            },
            {
                "id": 3,
                "name": "o_orderpriority",
                "required": False,
                "type": "string",
            },
        ],
    }
    for v in (1, 2, 3):
        sub = snaps[:v]
        meta = {
            "format-version": 2,
            "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-fixt",
            "location": root,
            "last-sequence-number": sub[-1][1],
            "last-updated-ms": sub[-1][2],
            "last-column-id": 3,
            "schemas": [schema],
            "current-schema-id": 0,
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "source-id": 3,
                            "field-id": 1000,
                            "name": "o_orderpriority",
                            "transform": "identity",
                        }
                    ],
                }
            ],
            "default-spec-id": 0,
            "current-snapshot-id": sub[-1][0],
            "snapshots": [
                {
                    "snapshot-id": sid,
                    "sequence-number": seq,
                    "timestamp-ms": ts,
                    "manifest-list": ml,
                    "summary": {"operation": op},
                    "schema-id": 0,
                }
                for sid, seq, ts, ml, op in sub
            ],
            "snapshot-log": [
                {"timestamp-ms": ts, "snapshot-id": sid}
                for sid, _, ts, _, _ in sub
            ],
        }
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
            json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("3")


def _iceberg_table_meta(root: str) -> dict:
    """Load the CURRENT table metadata: version-hint.text names the
    metadata version (HadoopCatalog rule); fall back to the highest
    v<N>.metadata.json when the hint is absent. One driver-side JSON of
    table-metadata size."""
    meta_dir = os.path.join(root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = int(fh.read().strip())
    else:
        # strict filename match — a stray 'vx.metadata.json' (editor
        # backup, partial upload) must be skipped, not crash discovery
        versions = [
            int(m.group(1))
            for f in os.listdir(meta_dir)
            if (m := re.fullmatch(r"v(\d+)\.metadata\.json", f))
        ]
        if not versions:
            raise FileNotFoundError(f"no metadata.json under {meta_dir}")
        v = max(versions)
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as fh:
        meta = json.load(fh)
    if meta.get("format-version") not in (2, 3):
        # fail AT OPEN, never mid-read with silently wrong semantics —
        # the same posture as the Delta reader-features gate
        raise ValueError(
            f"unsupported Iceberg format-version "
            f"{meta.get('format-version')!r}; this reader implements v2 "
            "and the v3 deletion-vector subset"
        )
    return meta


def _iceberg_snapshot(
    meta: dict,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    ref: str | None = None,
) -> dict:
    """Resolve a snapshot: by named REF (spec §Snapshot References —
    the metadata's `refs` map holds branches and tags, each pinning a
    snapshot-id; `main` tracks the current snapshot), by id, by
    timestamp (latest snapshot-log entry at or before `as_of_ms` — the
    spec's time-travel rule), or the current one."""
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if ref is not None:
        if snapshot_id is not None or as_of_ms is not None:
            raise ValueError("ref resolution excludes id/timestamp")
        entry = (meta.get("refs") or {}).get(ref)
        if entry is None:
            raise ValueError(f"unknown snapshot ref {ref!r}")
        snapshot_id = entry["snapshot-id"]
    if snapshot_id is None and as_of_ms is not None:
        eligible = [
            e for e in meta["snapshot-log"] if e["timestamp-ms"] <= as_of_ms
        ]
        if not eligible:
            raise ValueError(f"no snapshot at or before {as_of_ms}")
        snapshot_id = max(eligible, key=lambda e: e["timestamp-ms"])[
            "snapshot-id"
        ]
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    if snapshot_id not in snaps:
        raise ValueError(f"unknown snapshot id {snapshot_id}")
    return snaps[snapshot_id]


def _partition_value(part: dict | None, spec: dict | None):
    """Interpret one manifest entry's partition tuple UNDER A SPEC: an
    unpartitioned spec yields None, a single-field spec the field's
    value BY NAME, a multi-field spec the name-ordered value tuple.
    Without a spec (single-spec fixtures), fall back to first-value
    positional — exact there because the Avro writer schema preserves
    field order and every such table has one partition field."""
    part = part or {}
    if spec is None:
        return next(iter(part.values()), None)
    fields = spec.get("fields", [])
    if not fields:
        return None
    if len(fields) == 1:
        return part.get(fields[0]["name"])
    return tuple(part.get(f["name"]) for f in fields)


# ScanReport-style planning metrics for the LAST _iceberg_files_full
# call (mirrors iceberg-core's ScanReport: skipped-manifest counts are
# the planner's own telemetry) — read by plan gates, never by queries.
_LAST_SCAN_REPORT: dict = {}


def _iceberg_files_full(
    snapshot: dict,
    partition_pred=None,
    specs: dict[int, dict] | None = None,
    pred_spec_id: int | None = None,
    manifest_pred=None,
) -> tuple[list[tuple], list[dict]]:
    """(data files, delete files) LIVE in a snapshot — data items are
    (file path, partition value, record count, data sequence number,
    partition spec id). Read the manifest list, then each manifest;
    keep entries whose status is not DELETED; data manifests (content
    0) contribute data files, delete manifests (content 1) contribute
    delete files (content 1 = position, 2 = equality deletes).

    SPEC EVOLUTION (spec §Partition Evolution): each manifest carries
    the `partition_spec_id` it was written under, and its entries'
    partition tuples are meaningful ONLY under that spec — a table that
    evolved from partition-by-status to partition-by-priority has
    manifests of both, and interpreting a spec-0 tuple under spec-1
    names mis-prunes real files. Pass `specs` ({spec-id: spec}) to
    resolve each manifest's tuple by ITS spec's field names, and
    `pred_spec_id` to scope `partition_pred` to manifests of that spec
    alone — files written under other specs are never pruned by a
    predicate that doesn't speak their partitioning (they scan + row
    filter instead, exactly what iceberg-core plans).

    `partition_pred(pval) -> bool` prunes BOTH lists on manifest
    metadata alone — an excluded partition's files (and its
    partition-scoped delete files) are never handed to a scan, the
    planner behavior that makes a partition query O(selected) at
    100 TB. Driver-side and bounded: one row per manifest, one per
    file — the planner's working set.

    MANIFEST-LEVEL pruning (spec §Manifest Lists, field 507): a
    manifest-list entry may carry per-partition-field SUMMARIES
    (contains_null + lower/upper bounds). `manifest_pred(summaries) ->
    bool` is evaluated on that row alone — a False skips the WHOLE
    manifest without ever opening it, shrinking planning cost from
    O(files) to O(matching manifests) + O(files in them): the second
    pruning tier a million-file table needs. Entries without summaries
    are conservatively read. Skips are recorded in _LAST_SCAN_REPORT
    (manifests_total / manifests_skipped / skipped_paths), mirroring
    iceberg-core's ScanReport metrics."""
    _, manifests, _ = ocf_read(snapshot["manifest-list"])
    data, deletes = [], []
    report = {
        "manifests_total": len(manifests),
        "manifests_skipped": 0,
        "skipped_paths": [],
    }
    _LAST_SCAN_REPORT.clear()
    _LAST_SCAN_REPORT.update(report)
    for m in manifests:
        spec_id = m.get("partition_spec_id", 0)
        spec = specs.get(spec_id) if specs is not None else None
        prunable = pred_spec_id is None or spec_id == pred_spec_id
        summaries = m.get("partitions")
        if (
            manifest_pred is not None
            and prunable
            and summaries
            and not manifest_pred(summaries)
        ):
            report["manifests_skipped"] += 1
            report["skipped_paths"].append(m["manifest_path"])
            _LAST_SCAN_REPORT.update(report)
            continue  # whole manifest skipped, never opened
        _, entries, _ = ocf_read(m["manifest_path"])
        for e in entries:
            if e["status"] == _ST_DELETED:
                continue
            df = e["data_file"]
            pval = _partition_value(df["partition"], spec)
            # delete files with a NULL partition tuple are global (an
            # unpartitioned-spec write) — never pruned away
            if (
                partition_pred is not None
                and prunable
                and pval is not None
                and not partition_pred(pval)
            ):
                continue
            if m["content"] == 0 and df["content"] == 0:
                data.append(
                    {
                        "path": df["file_path"],
                        "pval": pval,
                        "n": df["record_count"],
                        "seq": e["sequence_number"],
                        "spec_id": spec_id,
                        # v3 row-lineage coordinate (absent pre-v3)
                        "first_row_id": df.get("first_row_id"),
                    }
                )
            elif m["content"] == 1 and df["content"] in (1, 2):
                deletes.append(
                    {
                        "path": df["file_path"],
                        "pval": pval,
                        "n": df["record_count"],
                        "seq": e["sequence_number"],
                        "content": df["content"],
                        "equality_ids": df.get("equality_ids"),
                        "spec_id": spec_id,
                        # v3 deletion-vector coordinates (absent pre-v3)
                        "format": df.get("file_format", "PARQUET"),
                        "referenced_data_file": df.get(
                            "referenced_data_file"
                        ),
                        "content_offset": df.get("content_offset"),
                        "content_size_in_bytes": df.get(
                            "content_size_in_bytes"
                        ),
                    }
                )
    return data, deletes


def _iceberg_files(
    snapshot: dict, partition_pred=None
) -> tuple[list[tuple], list[dict]]:
    """Single-spec view of [[_iceberg_files_full]]: data items as
    (file path, partition value, record count, data sequence number)."""
    data, deletes = _iceberg_files_full(snapshot, partition_pred)
    return [
        (d["path"], d["pval"], d["n"], d["seq"]) for d in data
    ], deletes


def _iceberg_live_files(
    snapshot: dict, partition_pred=None
) -> list[tuple[str, str, int]]:
    """Back-compat view of [[_iceberg_files]]: the live DATA files as
    (file path, partition value, record count)."""
    data, _ = _iceberg_files(snapshot, partition_pred)
    return [(p, v, n) for p, v, n, _ in data]


def _scan_with_partition(
    spark: SparkSession, files: list[tuple[str, str, int]]
) -> DataFrame | None:
    """ONE distributed scan over ALL selected files with the identity
    partition column restored from MANIFEST metadata (per spec the
    partition column is not stored in the data files) via a broadcast
    path→value map — plan size is O(1) in both files and partition
    values (the r14 shape planned one relation per value and unioned
    them). The data schema comes from one driver-side pyarrow footer
    read, so Spark never runs its footer-inference pass."""
    if not files:
        return None
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    paths = sorted({p for p, _, _ in files})
    schema = from_arrow_schema(pq.read_schema(paths[0]))
    df = (
        spark.read.schema(schema)
        .parquet(*paths)
        .withColumn("_fp", _norm_file_uri(F.input_file_name()))
    )
    pmap = local_rows(spark, 
        sorted(
            {(p, v) for p, v, _ in files},
            # None-safe: unpartitioned entries carry a None value
            key=lambda t: (t[0], t[1] is None, t[1] or ""),
        ),
        "_mpath string, o_orderpriority string",
    )
    return df.join(F.broadcast(pmap), df["_fp"] == pmap["_mpath"]).drop(
        "_mpath", "_fp"
    )


def _cents_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


_SNAP_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderpriority
"""


@register("src_iceberg_snapshot", oracle=_SNAP_ORACLE)
def q_src_iceberg_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 CURRENT-SNAPSHOT read: version-hint →
    metadata.json → current snapshot → manifest list (Avro) → manifests
    (Avro) → live data files → ONE distributed parquet scan. The staged
    s3 deleted the 1-URGENT partition via a rewrite manifest whose
    urgent entries carry status DELETED — a reader that lists the data
    directory (both parities of every partition exist on disk), reads
    only ADDED entries, or ignores entry status entirely gets the wrong
    counts; partition values restored from manifest metadata make
    mis-mapped partitions fail on cents, not just rows.

    Scale: the metadata walk is one row per manifest + one per file
    (planner-class, bounded); the data path is one distributed scan of
    exactly the live files.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_snap")
    _iceberg_stage(spark, o, root)
    meta = _iceberg_table_meta(root)
    files = _iceberg_live_files(_iceberg_snapshot(meta))
    df = _scan_with_partition(spark, files)
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)


_TT_ICE_ORACLE = """
SELECT s.snapshot,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM (VALUES ('as_of_s1'), ('latest')) AS s(snapshot)
LEFT JOIN orders o
       ON ((s.snapshot = 'as_of_s1' AND o.o_orderkey % 2 = 0)
        OR (s.snapshot = 'latest' AND o.o_orderpriority <> '1-URGENT'))
GROUP BY s.snapshot
"""


@register("src_iceberg_time_travel", oracle=_TT_ICE_ORACLE)
def q_src_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg TIME TRAVEL by timestamp: resolve the snapshot-log entry
    at or before the requested time (the spec's rule — the log maps
    wall-clock to snapshot ids), then read that snapshot's
    self-contained manifest list. Unlike Delta there is NO log replay:
    `as_of_s1` reconstructs from s1's own list (evens only — a reader
    that unions later manifests or takes current-snapshot-id fails on
    rows), and `latest` must reflect s3's partition delete. Both
    reconstructions are graded in one output against the unstaged
    source of truth.

    Scale: two bounded metadata walks + one distributed scan per
    snapshot label; historical reads cost the same planner work as
    current ones because snapshots are self-contained — the property
    this key pins.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_tt")
    _iceberg_stage(spark, o, root)
    meta = _iceberg_table_meta(root)
    # as-of a wall-clock BETWEEN s1 and s2 → must resolve to s1
    s1 = _iceberg_snapshot(meta, as_of_ms=_T1 + 30_000)
    latest = _iceberg_snapshot(meta)
    parts = []
    for label, snap in (("as_of_s1", s1), ("latest", latest)):
        df = _scan_with_partition(spark, _iceberg_live_files(snap))
        if df is not None:
            parts.append(df.withColumn("snapshot", F.lit(label)))
    spine = local_rows(spark, 
        [("as_of_s1",), ("latest",)], "snapshot string"
    )
    if not parts:
        return spine.select(
            "snapshot",
            F.lit(0).cast("bigint").alias("n_rows"),
            F.lit(0).cast("bigint").alias("total_cents"),
        )
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    per = both.groupBy("snapshot").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )
    return spine.join(per, "snapshot", "left").select(
        "snapshot",
        F.coalesce("n_rows", F.lit(0).cast("bigint")).alias("n_rows"),
        F.coalesce("total_cents", F.lit(0).cast("bigint")).alias(
            "total_cents"
        ),
    )


_PRUNE_ICE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority IN ('2-HIGH', '5-LOW')
GROUP BY o_orderpriority
"""


@register("src_iceberg_partition_prune", oracle=_PRUNE_ICE_ORACLE)
def q_src_iceberg_partition_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Metadata-only PARTITION PRUNING from Iceberg manifests: every
    manifest entry carries the file's partition tuple under the
    snapshot's partition spec (identity transform on o_orderpriority
    here), so a partition predicate selects files from the MANIFESTS
    ALONE — no directory listing, no footer reads, no excluded file
    ever opened. `tests/test_plans.py::
    test_iceberg_partition_prune_reads_only_pruned_files` asserts the
    scan's input files are exactly the pruned live set.

    Graded on content: the partition column is restored from manifest
    metadata (identity partitions are not stored in the data files), so
    a reader that mis-maps partition values fails on cents even when
    file selection happens to be right. The predicate targets the
    CURRENT snapshot — 1-URGENT is already deleted, so an ADDED-entries
    union (ignoring s3's rewrite) would also leak it here if the
    predicate included it; the companion snapshot key pins that
    direction.

    Scale: pruning cost ∝ manifest entries (planner metadata), scan
    cost ∝ selected partitions only — the 100 TB behavior this feature
    exists for.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_prune")
    _iceberg_stage(spark, o, root)
    wanted = {"2-HIGH", "5-LOW"}
    meta = _iceberg_table_meta(root)
    files = _iceberg_live_files(
        _iceberg_snapshot(meta), partition_pred=lambda v: v in wanted
    )
    df = _scan_with_partition(spark, files)
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)


# --- position deletes (Iceberg v2 row-level deletes) ---------------------------

_POSDEL_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT' AND o_orderkey % 10 <> 3
GROUP BY o_orderpriority
"""


@register("src_iceberg_pos_delete", oracle=_POSDEL_ORACLE)
def q_src_iceberg_pos_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION DELETES — the format's row-level delete
    mechanism (spec §Position Delete Files): a delete commit writes
    parquet files of (file_path, pos) pairs under the spec's reserved
    column names/ids, referenced by DELETE manifests (content 1), and a
    reader must drop exactly those ordinals from exactly those data
    files. O(deleted rows) commit cost at 100 TB, same as Delta's
    deletion vectors but with the inverse layering: positions live in
    PARQUET (scannable, mergeable) instead of roaring bitmaps.

    Staged: the shared three-snapshot table, then s4 = DELETE of every
    o_orderkey % 10 == 3 row via one position-delete parquet file PER
    affected partition (delete files are partition-scoped under a
    partitioned spec), a delete manifest m4, and a manifest list
    carrying m3 (data, re-referenced) + m4 (deletes). The reader
    applies a delete file to a data file only when the data file's
    data sequence number is ≤ the delete file's (the spec's ordering
    rule — younger data is never affected by older deletes).

    Graded: per-priority counts AND cents — a reader that ignores
    delete manifests returns the deleted rows; one that joins on pos
    alone (not file_path) or mis-applies the sequence rule drops wrong
    rows. The (file, pos) coordinate is Spark's `_metadata.row_index`,
    the same per-file ordinal the spec indexes.

    Scale: the delete-pair set rides a DISTRIBUTED parquet scan (never
    collected) and anti-joins the data scan on (file, pos). Broadcast
    is STATS-GATED, not hint-forced: manifests record each delete
    file's record_count, so the reader hints broadcast only under
    `_DELETE_BROADCAST_MAX_ROWS`; a larger delete backlog shuffles
    both sides on the equi keys. Staging's per-file position collect
    is ∝ deleted rows — they ARE the commit payload.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_posdel")
    _iceberg_stage(spark, o, root)
    meta_dir = os.path.join(root, "metadata")
    meta = _iceberg_table_meta(root)
    s3 = _iceberg_snapshot(meta)
    live, _ = _iceberg_files(s3)

    # s4 staging: positions of o_orderkey % 10 == 3 across ALL live
    # files in ONE job (collect ∝ deleted rows — they are the commit
    # payload), one delete parquet per affected partition, driver-side
    from urllib.parse import unquote

    _S4, _T4 = _S3 + 1, _T3 + 60_000
    pval_by_path = {p: v for p, v, _, _ in live}
    hit_rows = (
        spark.read.parquet(*sorted(pval_by_path))
        .select(
            F.input_file_name().alias("fp"),
            F.col("_metadata.row_index").alias("pos"),
            "o_orderkey",
        )
        .filter(F.col("o_orderkey") % 10 == 3)
        .collect()
    )
    by_part: dict[str, list[tuple[str, int]]] = {}
    for r in hit_rows:
        path = unquote(r["fp"].removeprefix("file://").removeprefix("file:"))
        by_part.setdefault(pval_by_path[path], []).append((path, r["pos"]))
    del_entries = []
    for pval, pairs in sorted(by_part.items()):
        pairs.sort()
        dpath = os.path.join(
            meta_dir, f"delete-{pval.replace(' ', '_')}-s4.parquet"
        )
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([p for p, _ in pairs], pa.string()),
                    "pos": pa.array([x for _, x in pairs], pa.int64()),
                }
            ),
            dpath,
        )
        del_entries.append(
            _entry(_ST_ADDED, _S4, 4, dpath, pval, content=1)
        )
    m4 = _write_manifest(meta_dir, "m4-deletes.avro", del_entries)
    # the delete manifest's content field must say 1; patch the list
    m3 = os.path.join(meta_dir, "m3-fixture.avro")
    recs = []
    for mpath, content, mseq in ((m3, 0, 3), (m4, 1, 4)):
        _, entries, _ = ocf_read(mpath)
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": mseq,
                "min_sequence_number": 1,
                "added_snapshot_id": _S4 if content == 1 else _S3,
                "added_files_count": sum(
                    1 for e in entries if e["status"] == _ST_ADDED
                ),
                "existing_files_count": sum(
                    1 for e in entries if e["status"] == _ST_EXISTING
                ),
                "deleted_files_count": sum(
                    1 for e in entries if e["status"] == _ST_DELETED
                ),
                "added_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_ADDED
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_EXISTING
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_DELETED
                ),
            }
        )
    l4 = os.path.join(meta_dir, f"snap-{_S4}-1-fixture.avro")
    ocf_write(l4, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "2"})
    with open(os.path.join(meta_dir, "v3.metadata.json")) as fh:
        m3_meta = json.load(fh)
    m3_meta["snapshots"].append(
        {
            "snapshot-id": _S4,
            "sequence-number": 4,
            "timestamp-ms": _T4,
            "manifest-list": l4,
            "summary": {"operation": "delete"},
            "schema-id": 0,
        }
    )
    m3_meta["snapshot-log"].append({"timestamp-ms": _T4, "snapshot-id": _S4})
    m3_meta["current-snapshot-id"] = _S4
    m3_meta["last-sequence-number"] = 4
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(m3_meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")

    # --- reader: current snapshot → data + delete files; anti-join on
    # (file, pos) gated by the sequence-number ordering rule
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    data_files, delete_files = _iceberg_files(snap)
    df = _scan_apply_pos_deletes(spark, data_files, delete_files)
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)


def _scan_apply_pos_deletes(
    spark: SparkSession,
    data_files: list[tuple],
    delete_files: list[dict],
) -> DataFrame | None:
    """The v2 position-delete READ path, shared by the reader key above
    and the lake_r15 DELETE writer (which must apply the CURRENT
    deletes before matching, so an already-deleted row never re-enters
    a commit payload): ONE multi-path scan over every live data file
    (explicit schema — no footer-inference pass) with the (file,
    position) coordinate captured at scan level, the identity-partition
    value and the file's data sequence number attached via a single
    broadcast path map, then ONE anti-join on (file, pos) gated by the
    spec's `data_seq <= delete_seq` ordering rule, broadcast
    stats-gated on manifest record counts. Returns rows with the
    normalized `_fp` and `_pos` coordinates kept, or None when no data
    files are live."""
    if not data_files:
        return None
    df = (
        spark.read.schema("o_orderkey long, o_totalprice double")
        .parquet(*sorted({p for p, _, _, _ in data_files}))
        .select(
            "o_orderkey",
            "o_totalprice",
            # normalize the scan's file URI to the staged
            # absolute-path form the delete files reference
            # (input_file_name percent-encodes e.g. the space in
            # `o_orderpriority=4-NOT SPECIFIED`)
            _norm_file_uri(F.input_file_name()).alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
        )
    )
    # ONE broadcast path map restores the identity-partition value and
    # carries the data sequence number — both manifest metadata
    fmap = local_rows(spark, 
        [(p, v, s) for p, v, _, s in data_files],
        "file_path string, o_orderpriority string, data_seq long",
    )
    df = df.join(F.broadcast(fmap), df["_fp"] == fmap["file_path"]).drop(
        "file_path"
    )
    if delete_files:
        # tag each delete row with its file's sequence number via a
        # broadcast (FULL normalized delete-file path → seq) map — the
        # same url_decode/scheme-strip normalization the data side
        # uses; keying on basename would cross-assign sequence numbers
        # between same-named delete files in different directories
        dseq = local_rows(spark, 
            [(d["path"], d["seq"]) for d in delete_files],
            "dpath string, dseq long",
        )
        dels = (
            spark.read.schema("file_path string, pos long")
            .parquet(*sorted(d["path"] for d in delete_files))
            .withColumn(
                "dpath",
                _norm_file_uri(F.input_file_name()),
            )
            .join(F.broadcast(dseq), "dpath")
            .select("file_path", "pos", "dseq")
        )
        n_del = sum(d["n"] for d in delete_files)
        df = df.join(
            _maybe_broadcast_deletes(dels, n_del),
            (df["_fp"] == dels["file_path"])
            & (df["_pos"] == dels["pos"])
            & (df["data_seq"] <= dels["dseq"]),  # spec ordering rule
            "left_anti",
        )
    return df.drop("data_seq")


def _scan_apply_eq_deletes(
    spark: SparkSession,
    data_files: list[tuple],
    delete_files: list[dict],
) -> DataFrame | None:
    """The v2 EQUALITY-delete read path, shared by the reader key, the
    upsert writer's read-back, and the rewrite-deletes maintenance
    commit (one contract, graded from three angles): ONE multi-path
    scan (explicit schema) over every live data file with the
    identity-partition value and data sequence number attached via a
    single broadcast path map; ALL equality-delete files ride ONE
    unioned key scan, each key tagged with its file's sequence number
    via a broadcast (full normalized path → seq) map; then a SINGLE
    anti-join on `(key, data_seq < dseq)` — the STRICT bound that keeps
    same-commit upsert replacements alive. A per-delete-file join loop
    would chain one anti-join per commit: unbounded plan depth for a
    CDC stream landing a delete file per minute. Broadcast of the key
    table is stats-gated on manifest record counts. Returns None when
    no data files are live."""
    if not data_files:
        return None
    df = (
        spark.read.schema("o_orderkey long, o_totalprice double")
        .parquet(*sorted({p for p, _, _, _ in data_files}))
        .select(
            "o_orderkey",
            "o_totalprice",
            _norm_file_uri(F.input_file_name()).alias("_fp"),
        )
    )
    fmap = local_rows(spark, 
        [(p, v, s) for p, v, _, s in data_files],
        "file_path string, o_orderpriority string, data_seq long",
    )
    df = df.join(F.broadcast(fmap), df["_fp"] == fmap["file_path"]).drop(
        "file_path"
    )
    eq = [d for d in delete_files if d["content"] == 2]
    if eq:
        for d in eq:
            if d["equality_ids"] != [1]:
                raise ValueError(
                    f"unsupported equality_ids {d['equality_ids']}; this "
                    "fixture keys on field 1 (o_orderkey)"
                )
        dseq = local_rows(spark, 
            [(d["path"], d["seq"]) for d in eq],
            "dpath string, dseq long",
        )
        keys = (
            spark.read.schema("o_orderkey long")
            .parquet(*sorted(d["path"] for d in eq))
            .withColumn("dpath", _norm_file_uri(F.input_file_name()))
            .join(F.broadcast(dseq), "dpath")
            .select(F.col("o_orderkey").alias("_delkey"), "dseq")
        )
        df = df.join(
            _maybe_broadcast_deletes(keys, sum(d["n"] for d in eq)),
            (df["o_orderkey"] == keys["_delkey"])
            & (df["data_seq"] < keys["dseq"]),  # STRICT: upserts live
            "left_anti",
        )
    return df.drop("data_seq")


# --- schema evolution (field-id projection + name mapping) ---------------------

def _scan_with_name_mapping(
    spark: SparkSession, meta: dict
) -> DataFrame | None:
    """Field-id projection to the CURRENT schema through
    `schema.name-mapping.default` (spec §Column Projection), shared by
    the schema-evolution reader and the lake_r15 ALTER-schema writer's
    read-back: live files are grouped by PHYSICAL footer schema
    (bounded by schema versions, not file count — the same grouping a
    real planner's scan-task assembly does), each group projects every
    current field from whichever historical physical name it carries
    (null-filled with the declared type when the column postdates the
    files), and the groups union to one frame. None when no files are
    live."""
    import pyarrow.parquet as pq

    current = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    mapping = json.loads(meta["properties"]["schema.name-mapping.default"])
    names_by_id = {m["field-id"]: set(m["names"]) for m in mapping}
    spark_types = {"long": "bigint", "double": "double", "string": "string"}
    files = _iceberg_live_files(_iceberg_snapshot(meta))
    groups: dict[tuple, list[str]] = {}
    for path, _, _ in files:
        cols = tuple(pq.read_schema(path).names)
        groups.setdefault(cols, []).append(path)
    parts = []
    for cols, paths in sorted(groups.items()):
        raw = spark.read.parquet(*sorted(paths))
        proj = []
        for fld in current["fields"]:
            phys = [c for c in cols if c in names_by_id[fld["id"]]]
            if phys:
                proj.append(F.col(phys[0]).alias(fld["name"]))
            else:  # column added after these files were written
                proj.append(
                    F.lit(None)
                    .cast(spark_types[fld["type"]])
                    .alias(fld["name"])
                )
        parts.append(raw.select(*proj))
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


_EVO_ORACLE = """
SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
            ELSE '<missing>' END AS order_status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY 1
"""


@register("src_iceberg_schema_evolution", oracle=_EVO_ORACLE)
def q_src_iceberg_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg SCHEMA EVOLUTION read (spec §Schemas / §Column
    Projection): columns are identified by FIELD ID, so renames are
    metadata-only and added columns read as null from older files. The
    staged table renames `o_totalprice` → `price` (same field id 2) and
    ADDS `o_orderstatus` (field id 4) between s1 and s2: s1's files
    physically store the OLD column name and LACK the added column;
    s2's files store the new names. Files without embedded field ids
    resolve through the table's `schema.name-mapping.default` property
    (the spec's fallback for imported files), which maps every physical
    name each file generation used onto its field id.

    Graded: per-status counts and CENTS OF THE RENAMED COLUMN — a
    reader that projects by current NAME alone loses every pre-rename
    file's prices (nulls → wrong cents); one that drops old files
    entirely loses half the rows; one that mis-fills the added column
    mislabels the '<missing>' group.

    Scale: schema resolution happens once per distinct physical file
    schema (driver-side, bounded by schema versions, NOT file count —
    grouping files by their footer schema is exactly what a real
    planner's scan-task grouping does); each group is one distributed
    scan, unioned after projection to the current schema.
    """
    import pyarrow.parquet as pq

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    root = _tmp(sf_dir, "iceberg_evo")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir, exist_ok=True)
    # s1 files: OLD schema — (o_orderkey, o_totalprice), no status
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(data_dir, "s1"))
    # s2 files: NEW schema — renamed price + added o_orderstatus
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        "o_orderstatus",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(data_dir, "s2"))

    def _flat(sub: str) -> list[str]:
        base = os.path.join(data_dir, sub)
        return [
            os.path.join(base, f)
            for f in sorted(os.listdir(base))
            if f.endswith(".parquet")
        ]

    m1 = _write_manifest(
        meta_dir,
        "m1-evo.avro",
        [_entry(_ST_ADDED, _S1, 1, p, None) for p in _flat("s1")],
    )
    m2 = _write_manifest(
        meta_dir,
        "m2-evo.avro",
        [_entry(_ST_ADDED, _S2, 2, p, None) for p in _flat("s2")],
    )
    l2 = _write_manifest_list(meta_dir, _S2, 2, [(m1, _S1), (m2, _S2)])
    schema_v0 = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
            {
                "id": 2,
                "name": "o_totalprice",
                "required": False,
                "type": "double",
            },
        ],
    }
    schema_v1 = {
        "type": "struct",
        "schema-id": 1,
        "fields": [
            {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
            {"id": 2, "name": "price", "required": False, "type": "double"},
            {
                "id": 4,
                "name": "o_orderstatus",
                "required": False,
                "type": "string",
            },
        ],
    }
    name_mapping = [
        {"field-id": 1, "names": ["o_orderkey"]},
        {"field-id": 2, "names": ["o_totalprice", "price"]},
        {"field-id": 4, "names": ["o_orderstatus"]},
    ]
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-evo1",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": _T2,
        "last-column-id": 4,
        "schemas": [schema_v0, schema_v1],
        "current-schema-id": 1,
        "partition-specs": [{"spec-id": 0, "fields": []}],  # unpartitioned
        "default-spec-id": 0,
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping)
        },
        "current-snapshot-id": _S2,
        "snapshots": [
            {
                "snapshot-id": _S2,
                "sequence-number": 2,
                "timestamp-ms": _T2,
                "manifest-list": l2,
                "summary": {"operation": "append"},
                "schema-id": 1,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T2, "snapshot-id": _S2}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: field-id projection through the name mapping
    meta = _iceberg_table_meta(root)
    df = _scan_with_name_mapping(spark, meta)
    if df is None:
        return local_rows(spark, 
            [], "order_status string, n_rows long, total_cents long"
        )
    return df.groupBy(
        F.coalesce(F.col("o_orderstatus"), F.lit("<missing>")).alias(
            "order_status"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- metrics-based file skipping (manifest value bounds) ------------------------

_STATS_LO, _STATS_HI = 1000.0, 50000.0

_STATS_ICE_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_totalprice >= {_STATS_LO} AND o_totalprice <= {_STATS_HI}
"""


def _sv_double(x: float) -> bytes:
    """Iceberg single-value binary serialization for double (spec
    Appendix D): 8-byte IEEE 754 little-endian."""
    import struct

    return struct.pack("<d", x)


def _sv_double_de(b: bytes) -> float:
    import struct

    return struct.unpack("<d", b)[0]


def _stats_surviving_iceberg_files(root: str) -> tuple[list[str], int]:
    """(surviving file paths, total file count) for the staged stats
    table: decode each manifest entry's o_totalprice bounds (field id
    2) and keep files whose [lower, upper] interval intersects
    [_STATS_LO, _STATS_HI] — manifest metadata only, no footer reads."""
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    _, manifests, _ = ocf_read(snap["manifest-list"])
    survivors, total = [], 0
    for m in manifests:
        if m["content"] != 0:
            continue
        _, entries, _ = ocf_read(m["manifest_path"])
        for e in entries:
            if e["status"] == _ST_DELETED:
                continue
            df = e["data_file"]
            total += 1
            lo = {p["key"]: p["value"] for p in df["lower_bounds"] or []}
            hi = {p["key"]: p["value"] for p in df["upper_bounds"] or []}
            if 2 in lo and _sv_double_de(lo[2]) > _STATS_HI:
                continue
            if 2 in hi and _sv_double_de(hi[2]) < _STATS_LO:
                continue
            survivors.append(df["file_path"])
    return survivors, total


@register("src_iceberg_stats_prune", oracle=_STATS_ICE_ORACLE)
def q_src_iceberg_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg METRICS-BASED FILE SKIPPING: manifest entries carry
    per-column value bounds (`lower_bounds`/`upper_bounds`, maps of
    field id → single-value-serialized bytes per spec Appendix D), so a
    range predicate skips whole files from MANIFEST METADATA — no
    parquet footer is ever opened for a skipped file. The Iceberg
    sibling of src_delta_stats_skipping, and the planner behavior that
    turns a selective range query on 100 TB into a scan of the few
    range-clustered files that can match.

    Staged: orders range-clustered into 8 files on o_totalprice
    (repartitionByRange — a real table gets this layout from a sorted
    write or compaction), one manifest whose entries carry the exact
    per-file double bounds read from the parquet footers at commit
    time. The reader decodes bounds, keeps files whose interval
    intersects [1000, 50000], then applies the row-level filter on the
    pruned scan (bounds are file-granular; rows outside the range
    inside a surviving file must still drop). `tests/test_plans.py::
    test_iceberg_stats_prune_reads_proper_subset` asserts the scan
    opened a PROPER subset of the table's files.

    Graded on content: n_rows + cents of the range — decoding bounds
    with the wrong endianness/width selects wrong files AND the
    row-filter would mask it, so the plan gate and the value hash
    together pin both halves.
    """
    import pyarrow.parquet as pq

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = _tmp(sf_dir, "iceberg_stats")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir, exist_ok=True)
    o.repartitionByRange(8, "o_totalprice").write.mode("overwrite").parquet(
        os.path.join(data_dir, "s1")
    )
    base = os.path.join(data_dir, "s1")
    entries = []
    for f in sorted(os.listdir(base)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(base, f)
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().names.index("o_totalprice")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if not mins:  # empty file: no row groups → no bounds
            bounds = None
        else:
            bounds = (
                [{"key": 2, "value": _sv_double(min(mins))}],
                [{"key": 2, "value": _sv_double(max(maxs))}],
            )
        entries.append(_entry(_ST_ADDED, _S1, 1, path, None, bounds=bounds))
    m1 = _write_manifest(meta_dir, "m1-stats.avro", entries)
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-stat",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": _T1,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": _S1,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T1, "snapshot-id": _S1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    survivors, _ = _stats_surviving_iceberg_files(root)
    if not survivors:
        return local_rows(spark, [], "n_rows long, total_cents long")
    return (
        spark.read.parquet(*sorted(survivors))
        .filter(
            (F.col("o_totalprice") >= F.lit(_STATS_LO))
            & (F.col("o_totalprice") <= F.lit(_STATS_HI))
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("total_cents"),
        )
    )


# --- equality deletes (the CDC/upsert shape) ------------------------------------

_EQDEL_ORACLE = """
WITH kept AS (
  SELECT o_orderpriority, floor(o_totalprice * 100 + 0.5) AS cents
  FROM orders
  WHERE o_orderpriority <> '1-URGENT' AND o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderpriority, floor((o_totalprice + 10.0) * 100 + 0.5)
  FROM orders
  WHERE o_orderpriority <> '1-URGENT' AND o_orderkey % 14 = 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(cents AS BIGINT)) AS BIGINT) AS total_cents
FROM kept
GROUP BY o_orderpriority
"""


@register("src_iceberg_eq_delete", oracle=_EQDEL_ORACLE)
def q_src_iceberg_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg EQUALITY DELETES — the CDC/upsert primitive (spec
    §Equality Delete Files): a delete file stores KEY VALUES
    (`equality_ids` names the key columns) instead of positions, and
    applies to data files whose data sequence number is STRICTLY LESS
    than the delete's — which is exactly what lets one commit delete an
    old row by key and insert its replacement: the same-sequence insert
    survives its own commit's delete. This is how Flink CDC writes
    Iceberg upserts at scale without reading anything.

    Staged: the shared three-snapshot table, then s4 = one UPSERT
    commit carrying (a) TWO GLOBAL equality-delete files (null
    partition tuple, equality_ids=[1] → o_orderkey, range-split as a
    real CDC writer lands them) covering every key with
    o_orderkey % 7 == 0, and (b) re-inserted replacement rows (the
    non-urgent % 14 == 0 keys at price + 10.00) as seq-4 data files.
    Correct semantics: seq-3 originals in the delete set vanish, their
    seq-4 replacements SURVIVE (strict <), untouched keys pass through.
    A reader that applies ≤ instead of < kills the upserts; one that
    prunes the null-partition delete file loses the deletes entirely;
    one that anti-joins without the sequence gate also kills the
    replacements — each fails the value hash differently.

    Scale: ALL delete files union into ONE distributed key scan, each
    key tagged with its file's sequence number from planner metadata,
    and apply in a SINGLE anti-join (plan depth independent of how
    many delete commits have landed). Broadcast is stats-gated on the
    manifests' record_count (`_DELETE_BROADCAST_MAX_ROWS`); a larger
    CDC backlog shuffles both sides on the key. Data files scan once
    with their sequence numbers attached from planner metadata.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_eqdel")
    _iceberg_stage(spark, o, root)
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    _S4, _T4 = _S3 + 1, _T3 + 60_000

    # (a) replacement rows — seq-4 data files, partitioned like the base
    o.filter(
        (F.col("o_orderkey") % 14 == 0)
        & (F.col("o_orderpriority") != "1-URGENT")
    ).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(10.0)
    ).coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(os.path.join(data_dir, "s4"))
    ins_entries = [
        _entry(_ST_ADDED, _S4, 4, p, v) for p, v in _pfiles(data_dir, "s4")
    ]
    # (b) the global equality-delete file (key values only, one job)
    eq_dir = os.path.join(meta_dir, "eqdel")
    # TWO delete files in the commit (range-split by key) — a real CDC
    # writer lands many per commit; the reader must union them into one
    # key scan and apply them in a SINGLE anti-join (plan-gated)
    o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey"
    ).repartitionByRange(2, "o_orderkey").write.mode("overwrite").parquet(
        eq_dir
    )
    eq_files = [
        os.path.join(eq_dir, f)
        for f in sorted(os.listdir(eq_dir))
        if f.endswith(".parquet")
    ]
    del_entries = [
        _entry(_ST_ADDED, _S4, 4, p, None, equality_ids=[1], content=2)
        for p in eq_files
    ]
    m4i = _write_manifest(meta_dir, "m4-upsert-data.avro", ins_entries)
    m4d = _write_manifest(meta_dir, "m4-upsert-deletes.avro", del_entries)
    m3 = os.path.join(meta_dir, "m3-fixture.avro")
    recs = []
    for mpath, content, added_by, mseq in (
        (m3, 0, _S3, 3),  # carried manifests keep their COMMIT seq
        (m4i, 0, _S4, 4),
        (m4d, 1, _S4, 4),
    ):
        _, entries, _ = ocf_read(mpath)
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": mseq,
                "min_sequence_number": 1,
                "added_snapshot_id": added_by,
                "added_files_count": sum(
                    1 for e in entries if e["status"] == _ST_ADDED
                ),
                "existing_files_count": sum(
                    1 for e in entries if e["status"] == _ST_EXISTING
                ),
                "deleted_files_count": sum(
                    1 for e in entries if e["status"] == _ST_DELETED
                ),
                "added_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_ADDED
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_EXISTING
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_DELETED
                ),
            }
        )
    l4 = os.path.join(meta_dir, f"snap-{_S4}-1-upsert.avro")
    ocf_write(l4, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "2"})
    with open(os.path.join(meta_dir, "v3.metadata.json")) as fh:
        tm = json.load(fh)
    tm["snapshots"].append(
        {
            "snapshot-id": _S4,
            "sequence-number": 4,
            "timestamp-ms": _T4,
            "manifest-list": l4,
            "summary": {"operation": "overwrite"},
            "schema-id": 0,
        }
    )
    tm["snapshot-log"].append({"timestamp-ms": _T4, "snapshot-id": _S4})
    tm["current-snapshot-id"] = _S4
    tm["last-sequence-number"] = 4
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(tm, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")

    # --- reader: data scans with per-file sequence numbers, equality
    # anti-join gated by the STRICT ordering rule
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    data_files, delete_files = _iceberg_files(snap)
    df = _scan_apply_eq_deletes(spark, data_files, delete_files)
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)


# --- snapshot expiry (the Iceberg maintenance sibling of Delta VACUUM) ----------

def _iceberg_reachable(
    meta: dict, snapshot_ids: set[int], readable_only: bool = False
) -> set[str]:
    """Every file path reachable from the given snapshots: their
    manifest lists, the manifests those lists name, and the files those
    manifests' entries reference. With ``readable_only``, entries with
    status DELETED are excluded — a DELETED entry is history (it tells
    incremental consumers a file left the table), not a data reference:
    no reader of the snapshot will ever open that file, so it must not
    keep the bytes alive once every snapshot that could READ them is
    expired. Driver-side, bounded by metadata size."""
    out: set[str] = set()
    for s in meta["snapshots"]:
        if s["snapshot-id"] not in snapshot_ids:
            continue
        out.add(s["manifest-list"])
        _, manifests, _ = ocf_read(s["manifest-list"])
        for m in manifests:
            out.add(m["manifest_path"])
            _, entries, _ = ocf_read(m["manifest_path"])
            for e in entries:
                if readable_only and e["status"] == _ST_DELETED:
                    continue
                out.add(e["data_file"]["file_path"])
    return out


def _iceberg_expire_snapshots(root: str, older_than_ms: int) -> list[str]:
    """EXPIRE SNAPSHOTS honoring refs (spec §Snapshot References;
    Iceberg's `expireSnapshots(olderThan)` contract): a snapshot is
    RETAINED iff it is (a) pinned by any surviving ref — every tag's
    snapshot and every branch's head; `main` falls back to the current
    snapshot when no refs map exists — or (b) at/after the horizon, or
    (c) within a branch's `min-snapshots-to-keep` newest log ancestors.
    Everything else is dropped from the metadata and every file
    reachable ONLY from expired snapshots is physically deleted —
    expired manifest lists, manifests no retained snapshot names, and
    data files whose last reference was expired (e.g. a partition
    dropped two snapshots ago). Returns the deleted paths (sorted).
    Never touches a file any retained snapshot can reach — the
    invariant the graded reads pin. Expire a tag first
    (lake_r15.iceberg_expire_refs) and the snapshot it pinned becomes
    expirable here — the chained lifecycle sink_iceberg_ref_lifecycle
    grades.

    Scale: pure metadata work (two bounded reachability walks) plus
    storage deletes that are embarrassingly parallel on a real object
    store; no data is read."""
    meta_dir = os.path.join(root, "metadata")
    meta = _iceberg_table_meta(root)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    refs = meta.get("refs") or {
        "main": {
            "snapshot-id": meta["current-snapshot-id"],
            "type": "branch",
        }
    }
    pinned = {
        r["snapshot-id"] for r in refs.values() if r["snapshot-id"] in by_id
    }
    pinned.add(meta["current-snapshot-id"])
    # branch history retention over the snapshot-log (main's lineage)
    log_ids = [e["snapshot-id"] for e in meta.get("snapshot-log", [])]
    for r in refs.values():
        keep_n = r.get("min-snapshots-to-keep")
        if r["type"] == "branch" and keep_n and r["snapshot-id"] in log_ids:
            upto = log_ids.index(r["snapshot-id"]) + 1
            pinned |= set(log_ids[max(0, upto - keep_n) : upto])
    retained, expired = [], []
    for s in meta["snapshots"]:
        if (
            s["snapshot-id"] in pinned
            or s["timestamp-ms"] >= older_than_ms
        ):
            retained.append(s)
        else:
            expired.append(s)
    if not expired:
        return []
    keep = _iceberg_reachable(
        meta, {s["snapshot-id"] for s in retained}, readable_only=True
    )
    drop = _iceberg_reachable(meta, {s["snapshot-id"] for s in expired})
    doomed = sorted(drop - keep)
    retained_ids = {s["snapshot-id"] for s in retained}
    meta["snapshots"] = retained
    meta["snapshot-log"] = [
        e for e in meta["snapshot-log"] if e["snapshot-id"] in retained_ids
    ]
    hint = os.path.join(meta_dir, "version-hint.text")
    with open(hint) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(hint, "w") as fh:
        fh.write(str(v + 1))
    for p in doomed:
        os.remove(p)
    return doomed


_EXPIRE_ORACLE = """
SELECT CAST(o_orderkey % 2 AS BIGINT) AS parity,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderkey % 2
"""


@register("sink_iceberg_expire_snapshots", oracle=_EXPIRE_ORACLE)
def q_sink_iceberg_expire_snapshots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXPIRE SNAPSHOTS — Iceberg's storage-reclaim maintenance (the
    sibling of Delta VACUUM, but expressed in snapshot algebra): old
    snapshots are dropped from table metadata and every file reachable
    ONLY from them is physically deleted; files any retained snapshot
    can still reach are untouchable. At 100 TB a skipped expiry doubles
    storage under churn; an over-eager one corrupts the table — both
    failure directions are pinned here.

    Staged: the shared three-snapshot table, then TWO expiry passes:
    horizon BEFORE s1 (expires nothing — every snapshot is younger;
    asserted empty), then horizon just after s2 (expires s1+s2). The
    second pass must delete exactly s1's and s2's manifest lists, the
    m1/m2 manifests only they referenced, and the 1-URGENT partition's
    data files — dropped at s3, so their last reference died with s2 —
    while every file the retained s3 reaches survives on disk
    (asserted). The graded read then replays the retained snapshot and
    must still produce every non-urgent order exactly once; time travel
    to the expired s1 now fails (asserted).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_expire")
    _iceberg_stage(spark, o, root)
    meta0 = _iceberg_table_meta(root)
    urgent = {
        p
        for p, v, _, _ in _iceberg_files(
            _iceberg_snapshot(meta0, snapshot_id=_S2)
        )[0]
        if v == "1-URGENT"
    }

    assert _iceberg_expire_snapshots(root, _T1 - 1) == [], (
        "horizon before s1 must expire nothing"
    )
    deleted = _iceberg_expire_snapshots(root, _T2 + 1)
    assert set(deleted) & urgent == urgent, (
        "the dropped partition's files must be reclaimed with s1/s2"
    )
    meta = _iceberg_table_meta(root)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [_S3]
    live = _iceberg_files(_iceberg_snapshot(meta))[0]
    assert all(os.path.exists(p) for p, _, _, _ in live), (
        "expiry must never touch a retained snapshot's files"
    )
    try:
        _iceberg_snapshot(meta, snapshot_id=_S1)
        raise AssertionError("expired snapshot must be unresolvable")
    except ValueError:
        pass

    df = _scan_with_partition(spark, [(p, v, n) for p, v, n, _ in live])
    if df is None:
        return local_rows(spark, 
            [], "parity bigint, n_rows long, total_cents long"
        )
    return df.groupBy(
        (F.col("o_orderkey") % 2).cast("bigint").alias("parity")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- compaction (rewrite small files, content-identical) ------------------------

_COMPACT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderpriority
"""


@register("sink_iceberg_compact", oracle=_COMPACT_ORACLE)
def q_sink_iceberg_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION (rewrite data files) — the small-files maintenance
    every streaming-fed 100 TB table lives or dies by: many small files
    per partition are rewritten into one, committed as a REPLACE
    snapshot whose new manifest marks the old files DELETED and the
    compacted ones ADDED. Content must be IDENTICAL across the
    boundary, and the old snapshot must still read the old layout
    (asserted) — Iceberg's snapshot isolation is what lets compaction
    run concurrently with readers.

    Staged: the shared table (after s3 each surviving partition holds
    TWO files — its even and odd slices), then s4 = per-partition
    rewrite into ONE file each (one partitionBy write job reading
    exactly the live set). Asserted: the s4 live set is half the size
    of s3's, the s3 snapshot still resolves and reads the OLD file
    list, and the graded read of s4 matches the unstaged source of
    truth per priority — a compactor that loses or duplicates a slice
    fails on values.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_compact")
    _iceberg_stage(spark, o, root)
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    meta = _iceberg_table_meta(root)
    s3_files = _iceberg_files(_iceberg_snapshot(meta))[0]
    _S4, _T4 = _S3 + 1, _T3 + 60_000

    # rewrite: ONE distributed job reads exactly the live set and
    # writes one file per partition (the partition column is restored
    # from metadata, as everywhere in this layer)
    src = _scan_with_partition(
        spark, [(p, v, n) for p, v, n, _ in s3_files]
    )
    src.coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(os.path.join(data_dir, "s4"))
    compacted = _pfiles(data_dir, "s4")
    entries = [
        _entry(_ST_ADDED, _S4, 4, p, v) for p, v in compacted
    ] + [
        _entry(_ST_DELETED, _S4, s, p, v) for p, v, _, s in s3_files
    ]
    m4 = _write_manifest(meta_dir, "m4-compact.avro", entries)
    l4 = _write_manifest_list(meta_dir, _S4, 4, [(m4, _S4)])
    meta["snapshots"].append(
        {
            "snapshot-id": _S4,
            "sequence-number": 4,
            "timestamp-ms": _T4,
            "manifest-list": l4,
            "summary": {"operation": "replace"},
            "schema-id": 0,
        }
    )
    meta["snapshot-log"].append({"timestamp-ms": _T4, "snapshot-id": _S4})
    meta["current-snapshot-id"] = _S4
    meta["last-sequence-number"] = 4
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")

    meta = _iceberg_table_meta(root)
    new_live = _iceberg_files(_iceberg_snapshot(meta))[0]
    assert len(new_live) <= len(s3_files)
    n_per_part: dict[str, int] = {}
    for _, v, _, _ in s3_files:
        n_per_part[v] = n_per_part.get(v, 0) + 1
    if any(n > 1 for n in n_per_part.values()):  # something to compact
        assert len(new_live) < len(s3_files), (
            "compaction must shrink a fragmented partition's file count"
        )
    old_live = _iceberg_files(_iceberg_snapshot(meta, snapshot_id=_S3))[0]
    assert {p for p, _, _, _ in old_live} == {p for p, _, _, _ in s3_files}, (
        "the pre-compaction snapshot must still read the old layout"
    )
    df = _scan_with_partition(spark, [(p, v, n) for p, v, n, _ in new_live])
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)


# --- bucket transform partitioning ----------------------------------------------

_N_BUCKETS = 8
_BUCKET_LOOKUP_KEYS = (1, 2, 3, 101, 105)

_BUCKET_ORACLE = f"""
SELECT o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderkey IN {_BUCKET_LOOKUP_KEYS}
GROUP BY o_orderkey
"""

# the bucket table's partition record (one int field, spec-style name)
_BUCKET_ENTRY_SCHEMA = json.loads(
    json.dumps(_MANIFEST_ENTRY_SCHEMA)
    .replace('"name": "r2"', '"name": "r2b"')
    .replace('"name": "r102"', '"name": "r102b"')
    .replace('"name": "k126_v127"', '"name": "k126_v127b"')
    .replace(
        '{"name": "o_orderpriority", "type": ["null", "string"], "field-id": 1000}',
        '{"name": "o_orderkey_bucket", "type": ["null", "int"], "field-id": 1000}',
    )
)


@register("src_iceberg_bucket_transform", oracle=_BUCKET_ORACLE)
def q_src_iceberg_bucket_transform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg BUCKET TRANSFORM partitioning (spec §Partition
    Transforms + Appendix B): `bucket[N](x)` hashes the value's 8-byte
    little-endian form with 32-bit Murmur3 (seed 0; the unit test pins
    the spec's published `hash(34L) == 2017239379` vector), masks to
    non-negative, mods N. Point lookups on the bucket key then touch
    ONLY the looked-up keys' buckets — the layout that makes key-fetch
    and storage-partitioned joins O(selected buckets) on a 100 TB
    table where identity partitioning is impossible (unbounded key
    domain).

    Staged: orders bucket-partitioned on o_orderkey into 8 buckets —
    the bucket column is computed IN SPARK by an Arrow-batched pandas
    UDF running a vectorized uint32 Murmur3 (legitimately Python: the
    spec's exact hash has no Catalyst builtin — Spark's own `hash()`
    uses seed 42 and a different input layout), then one partitionBy
    write. The reader computes the LOOKUP keys' buckets driver-side
    (bounded: 5 keys), selects manifest entries whose bucket ordinal
    matches, scans only those files, and row-filters to the exact keys
    (bucket membership is necessary, not sufficient).
    `tests/test_plans.py::test_iceberg_bucket_lookup_scans_only_target_buckets`
    asserts the scan's input files sit in exactly the target buckets
    (2 of 8 for these keys).
    """
    from pyspark.sql.functions import pandas_udf

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = _tmp(sf_dir, "iceberg_bucket")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir, exist_ok=True)

    @pandas_udf("int")
    def _bucket(keys: pd.Series) -> pd.Series:
        # vectorized murmur3_x86_32 over fixed 8-byte LE longs: two
        # 4-byte blocks per value, no tail — pure uint32 numpy ops
        # (kept inline so cloudpickle ships the whole closure by value)
        import numpy as np

        v = keys.to_numpy().astype(np.uint64)
        c1 = np.uint32(0xCC9E2D51)
        c2 = np.uint32(0x1B873593)
        h = np.zeros(len(v), dtype=np.uint32)
        for blk in (v & np.uint64(0xFFFFFFFF), v >> np.uint64(32)):
            k = blk.astype(np.uint32)
            k *= c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k *= c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # input length
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
        return pd.Series(
            ((h & np.uint32(0x7FFFFFFF)) % np.uint32(_N_BUCKETS)).astype(
                "int32"
            )
        )

    o.withColumn("o_orderkey_bucket", _bucket("o_orderkey")).coalesce(
        1
    ).write.mode("overwrite").partitionBy("o_orderkey_bucket").parquet(
        os.path.join(data_dir, "s1")
    )
    entries = []
    base = os.path.join(data_dir, "s1")
    for d in sorted(os.listdir(base)):
        pdir = os.path.join(base, d)
        if not (os.path.isdir(pdir) and d.startswith("o_orderkey_bucket=")):
            continue
        bval = int(d.split("=", 1)[1])
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                e = _entry(
                    _ST_ADDED, _S1, 1, os.path.join(pdir, f), None
                )
                e["data_file"]["partition"] = {"o_orderkey_bucket": bval}
                entries.append(e)
    m1 = _write_manifest(
        meta_dir, "m1-bucket.avro", entries, schema=_BUCKET_ENTRY_SCHEMA
    )
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-bckt",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": _T1,
        "last-column-id": 2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 1,
                        "field-id": 1000,
                        "name": "o_orderkey_bucket",
                        "transform": f"bucket[{_N_BUCKETS}]",
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "current-snapshot-id": _S1,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T1, "snapshot-id": _S1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: lookup keys → target buckets (driver-side, 5 hashes)
    # → manifest-pruned scan → exact-key row filter
    from random_forest_using_hadoop_spark.iceberg_format import (
        iceberg_bucket_long,
    )

    targets = {
        iceberg_bucket_long(k, _N_BUCKETS) for k in _BUCKET_LOOKUP_KEYS
    }
    meta = _iceberg_table_meta(root)
    # look the default spec up BY ID — spec-ids are stable identifiers,
    # not list positions (an evolved table's list is not id-ordered)
    spec = next(
        s
        for s in meta["partition-specs"]
        if s["spec-id"] == meta["default-spec-id"]
    )
    assert spec["fields"][0]["transform"] == f"bucket[{_N_BUCKETS}]"
    files = _iceberg_live_files(
        _iceberg_snapshot(meta), partition_pred=lambda b: b in targets
    )
    if not files:
        return local_rows(spark, 
            [], "o_orderkey long, n_rows long, total_cents long"
        )
    return (
        spark.read.parquet(*sorted(p for p, _, _ in files))
        .filter(F.col("o_orderkey").isin(*_BUCKET_LOOKUP_KEYS))
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("total_cents"),
        )
    )


# --- incremental append scan ------------------------------------------------------

_INCR_ORACLE = """
SELECT s.segment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM (VALUES ('s1_to_s2'), ('s2_to_s3')) AS s(segment)
LEFT JOIN orders o
       ON (s.segment = 's1_to_s2' AND o.o_orderkey % 2 = 1)
GROUP BY s.segment
"""


@register("src_iceberg_incremental", oracle=_INCR_ORACLE)
def q_src_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg INCREMENTAL APPEND SCAN — read only the rows ADDED
    between two snapshots (the consumer shape every downstream pipeline
    on a 100 TB table uses instead of re-reading the world): for each
    snapshot in (from, to], take its manifest list, keep entries with
    status ADDED stamped by that snapshot, and read just those files —
    O(appended data), never O(table).

    Staged: the shared history. Segment (s1, s2] must yield exactly the
    odd-orderkey append; segment (s2, s3] must yield ZERO rows — s3 is
    a delete whose rewrite manifest carries the survivors as EXISTING
    entries with their ORIGINAL snapshot ids (spec inheritance), so a
    reader that filters on status alone but not snapshot id, or treats
    EXISTING as new, re-emits the whole table into the second segment
    and fails on rows.

    Scale: per-segment planning is the usual bounded manifest walk;
    the appended files read in one distributed scan per segment.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_incr")
    _iceberg_stage(spark, o, root)
    meta = _iceberg_table_meta(root)
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    ordered = [e["snapshot-id"] for e in meta["snapshot-log"]]

    def _appended(from_id: int, to_id: int) -> list[str]:
        lo, hi = ordered.index(from_id), ordered.index(to_id)
        paths: list[str] = []
        for sid in ordered[lo + 1 : hi + 1]:
            _, manifests, _ = ocf_read(by_id[sid]["manifest-list"])
            for m in manifests:
                if m["content"] != 0 or m["added_snapshot_id"] != sid:
                    continue  # carried-over manifests add nothing here
                _, entries, _ = ocf_read(m["manifest_path"])
                paths.extend(
                    e["data_file"]["file_path"]
                    for e in entries
                    if e["status"] == _ST_ADDED and e["snapshot_id"] == sid
                )
        return paths

    spine = local_rows(spark, 
        [("s1_to_s2",), ("s2_to_s3",)], "segment string"
    )
    parts = []
    for label, frm, to in (
        ("s1_to_s2", _S1, _S2),
        ("s2_to_s3", _S2, _S3),
    ):
        paths = _appended(frm, to)
        if paths:
            parts.append(
                spark.read.parquet(*sorted(paths)).select(
                    F.lit(label).alias("segment"),
                    "o_orderkey",
                    "o_totalprice",
                )
            )
    if not parts:
        return spine.select(
            "segment",
            F.lit(0).cast("bigint").alias("n_rows"),
            F.lit(0).cast("bigint").alias("total_cents"),
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    per = df.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )
    return spine.join(per, "segment", "left").select(
        "segment",
        F.coalesce("n_rows", F.lit(0).cast("bigint")).alias("n_rows"),
        F.coalesce("total_cents", F.lit(0).cast("bigint")).alias(
            "total_cents"
        ),
    )


# --- temporal (year) transform partitioning ---------------------------------------

_YEAR_LO, _YEAR_HI = 1996, 1998  # [lo, hi) predicate window

_YEAR_ORACLE = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_YEAR_LO}-01-01'
  AND o_orderdate <  TIMESTAMP '{_YEAR_HI}-01-01'
GROUP BY 1
"""

_YEAR_ENTRY_SCHEMA = json.loads(
    json.dumps(_MANIFEST_ENTRY_SCHEMA)
    .replace('"name": "r2"', '"name": "r2y"')
    .replace('"name": "r102"', '"name": "r102y"')
    .replace('"name": "k126_v127"', '"name": "k126_v127y"')
    .replace(
        '{"name": "o_orderpriority", "type": ["null", "string"], "field-id": 1000}',
        '{"name": "o_orderdate_year", "type": ["null", "int"], "field-id": 1000}',
    )
)


@register("src_iceberg_year_transform", oracle=_YEAR_ORACLE)
def q_src_iceberg_year_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg TEMPORAL TRANSFORM partitioning (`year(ts)` — spec
    §Partition Transforms: the partition value is the ordinal YEARS
    SINCE 1970, and unlike identity partitioning the lossy source
    column stays IN the data files): a date-range predicate maps to a
    contiguous ordinal range, so the planner opens only the matching
    years' files from manifest metadata — the layout every time-series
    fact table at 100 TB uses, where identity partitioning on a
    timestamp is impossible.

    Staged: orders partitioned by year(o_orderdate) (the ordinal
    computed with built-in `year()` — pure Catalyst, no UDF), one
    manifest whose entries carry the ordinal. The reader converts the
    `[1996, 1998)` predicate to ordinal targets {26, 27} driver-side,
    prunes manifests, then applies the EXACT row-level range on the
    pruned scan (the transform is monthly-granular-lossy; rows of a
    matching year outside the exact bounds must still drop — here the
    bounds are year-aligned, which the oracle's EXTRACT(year) grouping
    verifies value-by-value anyway).
    `tests/test_plans.py::test_iceberg_year_transform_prunes_years`
    asserts only the target ordinals' files are opened.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    root = _tmp(sf_dir, "iceberg_year")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir, exist_ok=True)
    o.withColumn(
        "o_orderdate_year", (F.year("o_orderdate") - F.lit(1970)).cast("int")
    ).coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderdate_year"
    ).parquet(os.path.join(data_dir, "s1"))
    entries = []
    base = os.path.join(data_dir, "s1")
    for d in sorted(os.listdir(base)):
        pdir = os.path.join(base, d)
        if not (os.path.isdir(pdir) and d.startswith("o_orderdate_year=")):
            continue
        yval = int(d.split("=", 1)[1])
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                e = _entry(_ST_ADDED, _S1, 1, os.path.join(pdir, f), None)
                e["data_file"]["partition"] = {"o_orderdate_year": yval}
                entries.append(e)
    m1 = _write_manifest(
        meta_dir, "m1-year.avro", entries, schema=_YEAR_ENTRY_SCHEMA
    )
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-year",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": _T1,
        "last-column-id": 3,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
                    {"id": 2, "name": "o_totalprice", "required": False, "type": "double"},
                    {"id": 3, "name": "o_orderdate", "required": False, "type": "timestamp"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 3,
                        "field-id": 1000,
                        "name": "o_orderdate_year",
                        "transform": "year",
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "current-snapshot-id": _S1,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T1, "snapshot-id": _S1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    targets = set(range(_YEAR_LO - 1970, _YEAR_HI - 1970))
    meta = _iceberg_table_meta(root)
    assert (
        meta["partition-specs"][0]["fields"][0]["transform"] == "year"
    )
    files = _iceberg_live_files(
        _iceberg_snapshot(meta), partition_pred=lambda y: y in targets
    )
    if not files:
        return local_rows(spark, 
            [], "order_year bigint, n_rows long, total_cents long"
        )
    return (
        spark.read.parquet(*sorted(p for p, _, _ in files))
        .filter(
            (
                F.col("o_orderdate")
                >= F.lit(f"{_YEAR_LO}-01-01").cast("timestamp_ntz")
            )
            & (
                F.col("o_orderdate")
                < F.lit(f"{_YEAR_HI}-01-01").cast("timestamp_ntz")
            )
        )
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("total_cents"),
        )
    )


# --- streaming commit tail ----------------------------------------------------------

_STREAM_ICE_ORACLE = """
SELECT s.seq,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_appended,
       CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM (VALUES (1), (2), (3)) AS s(seq)
LEFT JOIN orders o
       ON ((s.seq = 1 AND o.o_orderkey % 2 = 0)
        OR (s.seq = 2 AND o.o_orderkey % 2 = 1))
GROUP BY s.seq
"""


@register("stream_iceberg_commits", oracle=_STREAM_ICE_ORACLE)
def q_stream_iceberg_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING tail of an Iceberg table's commit history (the
    Iceberg sibling of stream_delta_commits): Structured Streaming
    watches `metadata/*.metadata.json` (availableNow replay), and each
    micro-batch's newly visible SNAPSHOTS are resolved to their
    APPENDED rows via the same manifest walk the batch incremental
    reader uses — O(appended data) per refresh, the only viable
    downstream-consumer shape at 100 TB.

    Staged: the shared three-snapshot history (its three metadata
    versions arrive as stream input). Graded per sequence number:
    seq 1 = the even base, seq 2 = the odd append, seq 3 = the DELETE
    (zero appended rows — a consumer that re-emits EXISTING entries
    replays the whole table here). The foreachBatch sink follows the
    at-least-once contract: snapshot ids already processed are skipped,
    each batch's contribution is computed fully before the atomic
    driver-side merge, and batch ids are deduped.
    """
    import tempfile

    from pyspark.sql import types as T

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_stream")
    _iceberg_stage(spark, o, root)
    meta_dir = os.path.join(root, "metadata")

    meta_schema = T.StructType(
        [
            T.StructField(
                "snapshots",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("snapshot-id", T.LongType()),
                            T.StructField("sequence-number", T.LongType()),
                            T.StructField("manifest-list", T.StringType()),
                        ]
                    )
                ),
            )
        ]
    )
    done_snaps: set[int] = set()
    done_batches: set[int] = set()
    acc: dict[int, list[int]] = {}  # seq -> [n, cents]

    def sink(batch_df, batch_id: int) -> None:
        if batch_id in done_batches:
            return
        snaps = {}
        for r in batch_df.select(
            F.explode("snapshots").alias("s")
        ).collect():  # bounded: snapshot metadata rows
            s = r["s"]
            if s["snapshot-id"] is not None:
                snaps[s["snapshot-id"]] = s
        todo = sorted(set(snaps) - done_snaps)
        new_results: dict[int, list[int]] = {}
        for sid in todo:
            s = snaps[sid]
            _, manifests, _ = ocf_read(s["manifest-list"])
            paths = []
            for m in manifests:
                if m["content"] != 0 or m["added_snapshot_id"] != sid:
                    continue
                _, entries, _ = ocf_read(m["manifest_path"])
                paths.extend(
                    e["data_file"]["file_path"]
                    for e in entries
                    if e["status"] == _ST_ADDED and e["snapshot_id"] == sid
                )
            seq = int(s["sequence-number"])
            if not paths:
                new_results[seq] = [0, 0]
                continue
            row = (
                spark.read.parquet(*sorted(paths))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.floor(
                            F.col("o_totalprice") * 100 + F.lit(0.5)
                        ).cast("bigint")
                    ).alias("c"),
                )
                .collect()[0]
            )
            new_results[seq] = [row["n"], row["c"] or 0]
        # compute fully, then merge atomically (at-least-once contract)
        for seq, (n, c) in new_results.items():
            got = acc.setdefault(seq, [0, 0])
            got[0] += n
            got[1] += c
        done_snaps.update(todo)
        done_batches.add(batch_id)

    ckpt = tempfile.mkdtemp(prefix="iceberg_stream_ckpt_")
    query = (
        spark.readStream.schema(meta_schema)
        .option("pathGlobFilter", "*.metadata.json")
        .json(meta_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    query.stop()
    rows = [
        (int(seq), int(n), int(c)) for seq, (n, c) in sorted(acc.items())
    ]
    spine = local_rows(spark, [(1,), (2,), (3,)], "seq int")
    got = (
        local_rows(spark, 
            rows, "seq int, n_appended bigint, total_cents bigint"
        )
        if rows
        else local_rows(spark, 
            [], "seq int, n_appended bigint, total_cents bigint"
        )
    )
    return spine.join(got, "seq", "left").select(
        "seq",
        F.coalesce("n_appended", F.lit(0).cast("bigint")).alias("n_appended"),
        F.coalesce("total_cents", F.lit(0).cast("bigint")).alias(
            "total_cents"
        ),
    )


# --- partition-spec evolution (r13) ---------------------------------------------

_SPEC_EVO_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority IN ('2-HIGH', '5-LOW')
GROUP BY o_orderpriority
"""


def _iceberg_stage_spec_evo(spark: SparkSession, o: DataFrame, root: str) -> None:
    """Stage a table whose PARTITION SPEC CHANGED mid-history (spec
    §Partition Evolution — specs are additive, each manifest pins the
    spec-id it was written under):

    - spec-0 identity(o_orderstatus):   s1 APPEND even-orderkey rows,
      one file per STATUS partition, manifest m1 (spec-id 0)
    - spec-1 identity(o_orderpriority): s2 APPEND odd-orderkey rows,
      one file per PRIORITY partition, manifest m2 (spec-id 1);
      default-spec-id flips to 1 in v2.metadata.json

    The current snapshot's manifest list carries BOTH manifests, so a
    reader sees partition tuples of two different shapes in one plan —
    the long-lived-table state the spec's evolution rules exist for."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir)

    o.filter(F.col("o_orderkey") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).partitionBy("o_orderstatus").parquet(os.path.join(data_dir, "s1"))
    o.filter(F.col("o_orderkey") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).partitionBy("o_orderpriority").parquet(os.path.join(data_dir, "s2"))

    m1 = _write_manifest(
        meta_dir,
        "m1-spec0-status.avro",
        [
            _entry(_ST_ADDED, _S1, 1, p, v, partition={"o_orderstatus": v})
            for p, v in _pfiles(data_dir, "s1", col="o_orderstatus")
        ],
        schema=_entry_schema_for([("o_orderstatus", 1000)]),
        spec_id=0,
    )
    m2 = _write_manifest(
        meta_dir,
        "m2-spec1-priority.avro",
        [
            _entry(_ST_ADDED, _S2, 2, p, v)
            for p, v in _pfiles(data_dir, "s2")
        ],
        schema=_entry_schema_for([("o_orderpriority", 1001)]),
        spec_id=1,
    )

    # manifest list for s2: both manifests, each under ITS spec-id
    recs = []
    for mpath, added_by, spec_id, seq in (
        (m1, _S1, 0, 1),
        (m2, _S2, 1, 2),
    ):
        _, entries, _ = ocf_read(mpath)
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": spec_id,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": added_by,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in entries
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    l2 = os.path.join(meta_dir, f"snap-{_S2}-1-fixture.avro")
    ocf_write(l2, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "2"})
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])

    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "o_orderkey", "required": False, "type": "long"},
            {
                "id": 2,
                "name": "o_totalprice",
                "required": False,
                "type": "double",
            },
            {
                "id": 3,
                "name": "o_orderpriority",
                "required": False,
                "type": "string",
            },
            {
                "id": 4,
                "name": "o_orderstatus",
                "required": False,
                "type": "string",
            },
        ],
    }
    spec0 = {
        "spec-id": 0,
        "fields": [
            {
                "source-id": 4,
                "field-id": 1000,
                "name": "o_orderstatus",
                "transform": "identity",
            }
        ],
    }
    spec1 = {
        "spec-id": 1,
        "fields": [
            {
                "source-id": 3,
                "field-id": 1001,
                "name": "o_orderpriority",
                "transform": "identity",
            }
        ],
    }
    snaps = [
        {
            "snapshot-id": _S1,
            "sequence-number": 1,
            "timestamp-ms": _T1,
            "manifest-list": l1,
            "summary": {"operation": "append"},
            "schema-id": 0,
        },
        {
            "snapshot-id": _S2,
            "sequence-number": 2,
            "timestamp-ms": _T2,
            "manifest-list": l2,
            "summary": {"operation": "append"},
            "schema-id": 0,
        },
    ]
    for v, n_snaps, specs, default in (
        (1, 1, [spec0], 0),
        (2, 2, [spec0, spec1], 1),
    ):
        meta = {
            "format-version": 2,
            "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-sevo",
            "location": root,
            "last-sequence-number": n_snaps,
            "last-updated-ms": snaps[n_snaps - 1]["timestamp-ms"],
            "last-column-id": 4,
            "schemas": [schema],
            "current-schema-id": 0,
            "partition-specs": specs,
            "default-spec-id": default,
            "last-partition-id": 1000 + len(specs) - 1,
            "current-snapshot-id": snaps[n_snaps - 1]["snapshot-id"],
            "snapshots": snaps[:n_snaps],
            "snapshot-log": [
                {"timestamp-ms": s["timestamp-ms"], "snapshot-id": s["snapshot-id"]}
                for s in snaps[:n_snaps]
            ],
        }
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
            json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("2")


@register("src_iceberg_spec_evolution", oracle=_SPEC_EVO_ORACLE)
def q_src_iceberg_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg PARTITION SPEC EVOLUTION read (spec §Partition
    Evolution): a long-lived table re-partitions without rewriting
    data — old manifests keep their old spec-id, and each manifest's
    partition tuples are meaningful ONLY under its own spec. The staged
    table wrote s1 under identity(o_orderstatus) (spec 0) and s2 under
    identity(o_orderpriority) (spec 1, now the default), so the current
    snapshot mixes both tuple shapes.

    The graded query filters o_orderpriority IN ('2-HIGH','5-LOW'):
    spec-1 manifests PRUNE on their partition value; spec-0 files
    cannot be pruned by a predicate that doesn't speak their
    partitioning, so they all scan with the predicate pushed into the
    parquet row filter instead. A positional reader that interprets
    every tuple under the current spec prunes spec-0 files by their
    STATUS value ('O'/'F'/'P' never matches a priority literal) and
    silently loses every pre-evolution row — the first wall a
    production table that changed its layout hits.

    Scale: pruning stays metadata-only for the spec the predicate
    speaks (O(selected) scan there); legacy-spec files degrade to
    scan + pushed filter, never to wrong answers — iceberg-core's
    planning rule. One distributed scan per spec family, one union.
    Cites: _iceberg_files_full (per-manifest spec resolution),
    VERDICT r12 'What's missing' item 1.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    )
    root = _tmp(sf_dir, "iceberg_specevo")
    _iceberg_stage_spec_evo(spark, o, root)
    meta = _iceberg_table_meta(root)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    default_spec = meta["default-spec-id"]
    wanted = {"2-HIGH", "5-LOW"}
    data, _ = _iceberg_files_full(
        _iceberg_snapshot(meta),
        partition_pred=lambda v: v in wanted,
        specs=specs,
        pred_spec_id=default_spec,
    )
    if not data:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    lit_files: dict[str, list[str]] = {}
    filter_files: list[str] = []
    for d in data:
        if d["spec_id"] == default_spec:
            lit_files.setdefault(d["pval"], []).append(d["path"])
        else:
            filter_files.append(d["path"])
    scans = []
    if filter_files:
        scans.append(
            spark.read.parquet(*sorted(filter_files))
            .filter(F.col("o_orderpriority").isin(*sorted(wanted)))
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
        )
    for v, paths in sorted(lit_files.items()):
        scans.append(
            spark.read.parquet(*sorted(paths)).select(
                "o_orderkey",
                "o_totalprice",
                F.lit(v).alias("o_orderpriority"),
            )
        )
    df = scans[0]
    for s in scans[1:]:
        df = df.unionByName(s)
    return _cents_agg(df)


# --- Iceberg v3 deletion vectors (Puffin) (r13) ---------------------------------

_V3DV_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority <> '1-URGENT' AND o_orderkey % 10 <> 7
GROUP BY o_orderpriority
"""


def _entry_schema_v3dv() -> dict:
    """Manifest-entry schema + the v3 deletion-vector coordinates
    (table spec v3 §data_file fields): referenced_data_file (143),
    content_offset (144), content_size_in_bytes (145)."""
    import copy

    schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    df_fields = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]["fields"]
    df_fields.extend(
        [
            {
                "name": "referenced_data_file",
                "type": ["null", "string"],
                "field-id": 143,
            },
            {
                "name": "content_offset",
                "type": ["null", "long"],
                "field-id": 144,
            },
            {
                "name": "content_size_in_bytes",
                "type": ["null", "long"],
                "field-id": 145,
            },
        ]
    )
    return schema


@register("src_iceberg_v3_dv", oracle=_V3DV_ORACLE)
def q_src_iceberg_v3_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg V3 DELETION VECTORS (table spec v3 §Deletion Vectors +
    the Puffin spec): v3 replaces per-commit position-delete parquet
    with ONE roaring bitmap per data file, stored as a
    `deletion-vector-v1` blob in a Puffin container; the manifest entry
    carries the blob's exact coordinates (file_format PUFFIN,
    referenced_data_file, content_offset, content_size_in_bytes), so a
    reader never parses the Puffin footer on the hot path. The bitmap
    serialization is byte-compatible with Delta's RoaringBitmapArray —
    the spec chose that deliberately — so one codec serves both lakes.

    Staged: the shared three-snapshot table, then s4 = a v3 DELETE
    commit removing every o_orderkey % 10 == 7 row: one Puffin file
    holding one DV blob per affected data file, a delete manifest
    whose entries pin each blob's coordinates, and v4.metadata.json
    flipping format-version to 3 (v3 tables carry their v2 history).

    Graded: per-priority counts AND cents — a reader that ignores the
    delete manifest returns deleted rows; one that misreads blob
    framing (BE length/CRC/magic) fails loudly; one that applies a DV
    to the wrong file (referenced_data_file is the binding) drops the
    wrong rows and fails on cents.

    Scale: DV descriptors are planner metadata (one row per DV). Blob
    decode happens EXECUTOR-SIDE — mapInPandas over the descriptor
    frame reads + integrity-checks each blob and explodes positions —
    so the driver never materializes a bitmap; the anti-join is the
    same stats-gated (file, pos) plan as v2 position deletes, with
    cardinality known from manifest record_count.
    """
    from pyspark import cloudpickle

    from random_forest_using_hadoop_spark import delta_format as _dfmt
    from random_forest_using_hadoop_spark import iceberg_format as _icefmt

    # the DV-decode closure runs executor-side: ship BOTH codec modules
    # by value (the blob framing lives in iceberg_format, the roaring
    # deserializer it calls in delta_format) — grading-driver workers
    # don't have this repo on sys.path (r4 lesson)
    cloudpickle.register_pickle_by_value(_icefmt)
    cloudpickle.register_pickle_by_value(_dfmt)
    _decode_blob = _icefmt.iceberg_dv_decode
    _read_blob = _icefmt.puffin_read_blob

    from random_forest_using_hadoop_spark.iceberg_format import (
        iceberg_dv_blob,
        puffin_write,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_v3dv")
    _iceberg_stage(spark, o, root)
    meta_dir = os.path.join(root, "metadata")
    meta = _iceberg_table_meta(root)
    s3 = _iceberg_snapshot(meta)
    live, _ = _iceberg_files(s3)

    # --- s4 staging: deleted positions per live file in ONE job
    # (collect ∝ deleted rows — the commit payload), then one Puffin
    # file with one DV blob per affected data file
    from urllib.parse import unquote

    _S4, _T4 = _S3 + 1, _T3 + 60_000
    pval_by_path = {p: v for p, v, _, _ in live}
    hit_rows = (
        spark.read.parquet(*sorted(pval_by_path))
        .select(
            F.input_file_name().alias("fp"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .filter(F.col("o_orderkey") % 10 == 7)
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in hit_rows:
        path = unquote(r["fp"].removeprefix("file://").removeprefix("file:"))
        by_file.setdefault(path, []).append(r["pos"])
    puffin_path = os.path.join(meta_dir, "dvs-s4.puffin")
    ordered = sorted(by_file)
    blob_entries = puffin_write(
        puffin_path,
        [
            (
                iceberg_dv_blob(by_file[p]),
                {
                    "type": "deletion-vector-v1",
                    "fields": [2147483546],  # reserved _pos field id
                    "snapshot-id": _S4,
                    "sequence-number": 4,
                    "properties": {
                        "referenced-data-file": p,
                        "cardinality": str(len(by_file[p])),
                    },
                },
            )
            for p in ordered
        ],
    )
    schema_v3 = _entry_schema_v3dv()
    dv_entries = []
    for p, be in zip(ordered, blob_entries):
        ent = _entry(
            _ST_ADDED,
            _S4,
            4,
            puffin_path,
            pval_by_path[p],
            content=1,
            record_count=len(by_file[p]),
        )
        ent["data_file"].update(
            {
                "file_format": "PUFFIN",
                "referenced_data_file": p,
                "content_offset": be["offset"],
                "content_size_in_bytes": be["length"],
            }
        )
        dv_entries.append(ent)
    m4 = _write_manifest(
        meta_dir, "m4-dv-deletes.avro", dv_entries, schema=schema_v3
    )
    # manifest list: m3 (data, re-referenced) + m4 (DV deletes)
    m3 = s3["manifest-list"]
    _, m3_manifests, _ = ocf_read(m3)
    (m3_data,) = [m["manifest_path"] for m in m3_manifests]
    recs = []
    for mpath, content, added_by, mseq in (
        (m3_data, 0, _S3, 3),  # carried manifest keeps its COMMIT seq
        (m4, 1, _S4, 4),
    ):
        _, entries, _ = ocf_read(mpath)
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": content,
                "sequence_number": mseq,
                "min_sequence_number": 1,
                "added_snapshot_id": added_by,
                "added_files_count": sum(
                    1 for e in entries if e["status"] == _ST_ADDED
                ),
                "existing_files_count": sum(
                    1 for e in entries if e["status"] == _ST_EXISTING
                ),
                "deleted_files_count": sum(
                    1 for e in entries if e["status"] == _ST_DELETED
                ),
                "added_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_ADDED
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_EXISTING
                ),
                "deleted_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == _ST_DELETED
                ),
            }
        )
    l4 = os.path.join(meta_dir, f"snap-{_S4}-1-fixture.avro")
    ocf_write(l4, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "3"})
    with open(os.path.join(meta_dir, "v3.metadata.json")) as fh:
        tm = json.load(fh)
    tm["format-version"] = 3  # v3 commit; prior snapshots remain readable
    # v3 REQUIRES next-row-id (spec §Table Metadata): on upgrade it
    # initializes the row-lineage assignment counter — 0 here because
    # no pre-upgrade file carries a first_row_id (readers treat their
    # lineage as unavailable); the s4 delete assigns no new rows, so
    # its first-row-id equals the counter and the counter stays put
    tm["next-row-id"] = 0
    tm["snapshots"].append(
        {
            "snapshot-id": _S4,
            "sequence-number": 4,
            "timestamp-ms": _T4,
            "manifest-list": l4,
            "summary": {"operation": "delete"},
            "schema-id": 0,
            "first-row-id": 0,
        }
    )
    tm["snapshot-log"].append({"timestamp-ms": _T4, "snapshot-id": _S4})
    tm["current-snapshot-id"] = _S4
    tm["last-sequence-number"] = 4
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(tm, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")

    # --- reader: data scans with (file, pos) captured at scan level;
    # DV blobs decoded executor-side from manifest coordinates
    meta = _iceberg_table_meta(root)
    snap = _iceberg_snapshot(meta)
    data_files, delete_files = _iceberg_files_full(snap)
    if not data_files:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    by_val: dict[str, list[str]] = {}
    for d in data_files:
        by_val.setdefault(d["pval"], []).append(d["path"])
    scans = [
        spark.read.parquet(*sorted(paths)).select(
            "o_orderkey",
            "o_totalprice",
            F.lit(v).alias("o_orderpriority"),
            _norm_file_uri(F.input_file_name()).alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        for v, paths in sorted(by_val.items())
    ]
    df = scans[0]
    for s in scans[1:]:
        df = df.unionByName(s)
    dvs = [d for d in delete_files if d["format"] == "PUFFIN"]
    if dvs:
        desc = local_rows(spark, 
            [
                (
                    d["path"],
                    d["referenced_data_file"],
                    d["content_offset"],
                    d["content_size_in_bytes"],
                    d["n"],
                )
                for d in dvs
            ],
            "puffin string, data_file string, off long, size long, n long",
        )

        def _explode_dv(batches):
            import pandas as _pd

            for pdf in batches:
                for _, row in pdf.iterrows():
                    pos = _decode_blob(
                        _read_blob(
                            row["puffin"], int(row["off"]), int(row["size"])
                        )
                    )
                    if len(pos) != int(row["n"]):
                        raise ValueError(
                            f"DV cardinality mismatch for {row['data_file']}"
                        )
                    yield _pd.DataFrame(
                        {"file_path": row["data_file"], "pos": pos}
                    )

        # one task per DV: repartition the bounded descriptor frame so
        # blob decode parallelizes across executors
        dels = desc.repartition(max(1, min(len(dvs), 32))).mapInPandas(
            _explode_dv, schema="file_path string, pos long"
        )
        n_del = sum(d["n"] for d in dvs)
        df = df.join(
            _maybe_broadcast_deletes(dels, n_del),
            (df["_fp"] == dels["file_path"]) & (df["_pos"] == dels["pos"]),
            "left_anti",
        )
    return _cents_agg(df)


# --- Iceberg v3 row lineage (r13) -----------------------------------------------

_LINEAGE_ORACLE = """
WITH n_even AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders WHERE o_orderkey % 2 = 0
),
ranked AS (
    SELECT o_orderpriority,
           CASE WHEN o_orderkey % 2 = 0
                THEN ROW_NUMBER() OVER (
                       PARTITION BY o_orderkey % 2 ORDER BY o_orderkey) - 1
                ELSE (SELECT c FROM n_even)
                     + ROW_NUMBER() OVER (
                         PARTITION BY o_orderkey % 2 ORDER BY o_orderkey) - 1
           END AS row_id
    FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(row_id) AS BIGINT) AS row_id_sum,
       CAST(MAX(row_id) AS BIGINT) AS row_id_max
FROM ranked
GROUP BY o_orderpriority
"""


def _entry_schema_v3lineage() -> dict:
    """Manifest-entry schema + the v3 row-lineage coordinate
    (table spec v3 §Row Lineage): first_row_id (field id 142)."""
    import copy

    schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    df_fields = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]["fields"]
    df_fields.append(
        {"name": "first_row_id", "type": ["null", "long"], "field-id": 142}
    )
    return schema


@register("src_iceberg_v3_row_lineage", oracle=_LINEAGE_ORACLE)
def q_src_iceberg_v3_row_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg V3 ROW LINEAGE (table spec v3 §Row Lineage): every row
    gets a durable `_row_id` without storing one — the table metadata
    tracks `next-row-id`, each snapshot stamps a `first-row-id`, each
    data file's manifest entry records its `first_row_id` slice, and a
    reader DERIVES `_row_id = first_row_id + position` for rows whose
    lineage is not materialized in the file. Ids survive compaction
    (rewritten files keep materialized ids) and never repeat: each
    commit advances next-row-id by the rows it assigned.

    Staged: s1 appends even-orderkey rows as 4 range-clustered files
    sorted within (first_row_id 0.. cumulative), advancing next-row-id;
    s2 appends odd rows the same way starting at s1's next-row-id. The
    deterministic layout makes every derived id equal the parity-local
    orderkey rank (+ offset for s2), so DuckDB can reproduce the exact
    assignment.

    Graded: per-priority COUNT + SUM + MAX of the derived `_row_id` —
    a reader that ignores first_row_id (all files restart at 0)
    collides ids and fails on sum; one that mis-orders files within
    the commit fails on both sum and max; one that derives from the
    wrong coordinate (global instead of per-file position) shifts
    everything.

    Scale: id derivation is `first_row_id + _metadata.row_index`,
    computed INSIDE the distributed scan (pure column arithmetic, no
    shuffle, no join); the per-file first_row_id is planner metadata
    riding the same manifest walk every read already does.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_v3lin")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir)

    # two append commits: evens then odds, each 4 range-clustered files
    # sorted by o_orderkey so the derived ids are deterministic
    import pyarrow.parquet as pq

    schema_v3 = _entry_schema_v3lineage()
    next_row_id = 0
    manifests = []  # (manifest path, snapshot id, seq)
    snaps_meta = []  # (sid, seq, ts, first-row-id)
    for seq, (sid, ts, parity, sub) in enumerate(
        (
            (_S1, _T1, 0, "s1"),
            (_S2, _T2, 1, "s2"),
        ),
        start=1,
    ):
        o.filter(F.col("o_orderkey") % 2 == parity).repartitionByRange(
            4, "o_orderkey"
        ).sortWithinPartitions("o_orderkey").write.mode("overwrite").parquet(
            os.path.join(data_dir, sub)
        )
        base = os.path.join(data_dir, sub)
        files = sorted(
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        )
        # order files by their orderkey range (file name order is NOT
        # the range order) and assign first_row_id cumulatively — the
        # assignment a v3 writer performs at commit time
        stats = []
        for p in files:
            pf = pq.ParquetFile(p)
            lo = pf.metadata.row_group(0).column(0).statistics.min
            stats.append((lo, p, pf.metadata.num_rows))
        first_row_id = next_row_id
        entries = []
        for lo, p, n in sorted(stats):
            ent = _entry(_ST_ADDED, sid, seq, p, None)
            ent["data_file"]["partition"] = {"o_orderpriority": None}
            ent["data_file"]["first_row_id"] = next_row_id
            entries.append(ent)
            next_row_id += n
        m = _write_manifest(
            meta_dir, f"m-{sub}-lineage.avro", entries, schema=schema_v3
        )
        manifests.append((m, sid, seq))
        snaps_meta.append((sid, seq, ts, first_row_id))

    # manifest lists: s1 = [m1]; s2 = [m1, m2] (immutable, re-referenced)
    lists = {}
    for upto in (1, 2):
        recs = []
        for m, sid, seq in manifests[:upto]:
            _, entries, _ = ocf_read(m)
            recs.append(
                {
                    "manifest_path": m,
                    "manifest_length": os.path.getsize(m),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": sid,
                    "added_files_count": len(entries),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(
                        e["data_file"]["record_count"] for e in entries
                    ),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            )
        sid = manifests[upto - 1][1]
        lp = os.path.join(meta_dir, f"snap-{sid}-1-fixture.avro")
        ocf_write(
            lp, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "3"}
        )
        lists[upto] = lp

    meta = {
        "format-version": 3,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-v3li",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": _T2,
        "last-column-id": 3,
        "next-row-id": next_row_id,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                    {
                        "id": 3,
                        "name": "o_orderpriority",
                        "required": False,
                        "type": "string",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": _S2,
        "snapshots": [
            {
                "snapshot-id": sid,
                "sequence-number": seq,
                "timestamp-ms": ts,
                "manifest-list": lists[seq],
                "first-row-id": frid,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
            for sid, seq, ts, frid in snaps_meta
        ],
        "snapshot-log": [
            {"timestamp-ms": ts, "snapshot-id": sid}
            for sid, _, ts, _ in snaps_meta
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: derive _row_id inside the scan from manifest metadata
    meta = _iceberg_table_meta(root)
    data_files, _ = _iceberg_files_full(_iceberg_snapshot(meta))
    if not data_files:
        return local_rows(spark, 
            [],
            "o_orderpriority string, n_rows long, row_id_sum long, "
            "row_id_max long",
        )
    frid_map = local_rows(spark, 
        [(d["path"], d["first_row_id"]) for d in data_files],
        "file_path string, first_row_id long",
    )
    df = (
        spark.read.parquet(*sorted(d["path"] for d in data_files))
        .select(
            "o_orderpriority",
            _norm_file_uri(F.input_file_name()).alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
        )
        .join(F.broadcast(frid_map), F.col("_fp") == frid_map["file_path"])
        .withColumn("_row_id", F.col("first_row_id") + F.col("_pos"))
    )
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_row_id").cast("bigint").alias("row_id_sum"),
        F.max("_row_id").cast("bigint").alias("row_id_max"),
    )


# --- Iceberg v3 default-value columns (r13) -------------------------------------

_DEFVAL_ORACLE = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'none' ELSE o_orderstatus END
           AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
GROUP BY 1
"""


@register("src_iceberg_v3_default_values", oracle=_DEFVAL_ORACLE)
def q_src_iceberg_v3_default_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg V3 DEFAULT-VALUE COLUMNS (table spec v3 §Default
    values): a column added to the schema may declare an
    `initial-default` — rows in files written BEFORE the column existed
    read that value (NOT null, the v2 behavior) with zero data rewrite;
    `write-default` applies to new writers that omit the column. This
    is the v3 feature that makes backfilled dimensions metadata-only.

    Staged: s1 appends even-orderkey files under the 3-column schema;
    the schema then evolves to add field 4 `o_flag` (string) with
    `initial-default: "none"`; s2 appends odd rows whose files
    physically CARRY o_flag (= o_orderstatus). Field-id projection
    decides which: files lacking field 4 fill the initial-default,
    files with it read it.

    Graded: counts and cents grouped by the flag — a v2-style reader
    that null-fills the added column loses the 'none' group entirely
    (nulls group separately and hash-mismatch); one that applies the
    default to NEW files too overwrites real values; one that applies
    `write-default` instead of `initial-default` to old files is caught
    by the distinct literals in the fixture.

    Scale: resolution happens once per distinct physical file schema
    (driver-side, bounded by schema versions, not file count); each
    group is one distributed scan branch with the default as a
    constant-folded literal — no join, no shuffle beyond the final agg.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    )
    root = _tmp(sf_dir, "iceberg_v3def")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir)

    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(data_dir, "s1"))
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderstatus").alias("o_flag"),
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(data_dir, "s2"))

    def _files(sub: str) -> list[str]:
        base = os.path.join(data_dir, sub)
        return sorted(
            os.path.join(base, f)
            for f in os.listdir(base)
            if f.endswith(".parquet")
        )

    ms = []
    for sub, sid, seq in (("s1", _S1, 1), ("s2", _S2, 2)):
        entries = []
        for p in _files(sub):
            ent = _entry(_ST_ADDED, sid, seq, p, None)
            ent["data_file"]["partition"] = {"o_orderpriority": None}
            entries.append(ent)
        ms.append(
            (
                _write_manifest(meta_dir, f"m-{sub}-defval.avro", entries),
                sid,
                seq,
            )
        )
    recs = []
    for m, sid, seq in ms:
        _, entries, _ = ocf_read(m)
        recs.append(
            {
                "manifest_path": m,
                "manifest_length": os.path.getsize(m),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": sid,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in entries
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    # one manifest list PER SNAPSHOT: s1's list holds only the s1
    # manifest (a time-travel or ref read of s1 must not see s2's
    # rows — the r13 advice finding), s2's holds both
    l1 = os.path.join(meta_dir, f"snap-{_S1}-1-fixture.avro")
    ocf_write(
        l1, _MANIFEST_FILE_SCHEMA, recs[:1], metadata={"format-version": "3"}
    )
    l2 = os.path.join(meta_dir, f"snap-{_S2}-1-fixture.avro")
    ocf_write(l2, _MANIFEST_FILE_SCHEMA, recs, metadata={"format-version": "3"})
    rows_s1 = recs[0]["added_rows_count"]
    rows_s2 = recs[1]["added_rows_count"]
    meta = {
        "format-version": 3,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-v3de",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": _T2,
        "last-column-id": 4,
        # v3-required row-lineage counter: each append assigns ids for
        # the rows it added, so the counter is the cumulative row count
        "next-row-id": rows_s1 + rows_s2,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 1,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                    {
                        "id": 4,
                        "name": "o_flag",
                        "required": False,
                        "type": "string",
                        "initial-default": "none",
                        "write-default": "unset",
                    },
                ],
            }
        ],
        "current-schema-id": 1,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "current-snapshot-id": _S2,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
                "first-row-id": 0,
            },
            {
                "snapshot-id": _S2,
                "sequence-number": 2,
                "timestamp-ms": _T2,
                "manifest-list": l2,
                "summary": {"operation": "append"},
                "schema-id": 1,
                "first-row-id": rows_s1,
            },
        ],
        "snapshot-log": [
            {"timestamp-ms": _T1, "snapshot-id": _S1},
            {"timestamp-ms": _T2, "snapshot-id": _S2},
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: per-schema-generation projection with initial-default
    meta = _iceberg_table_meta(root)
    schema = next(
        s
        for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    flag_field = next(f for f in schema["fields"] if f["id"] == 4)
    initial_default = flag_field.get("initial-default")
    data_files, _ = _iceberg_files_full(_iceberg_snapshot(meta))
    if not data_files:
        return local_rows(spark, 
            [], "flag string, n_rows long, total_cents long"
        )
    # group files by whether their PHYSICAL schema carries field 4 —
    # one footer probe per distinct file generation (bounded by schema
    # versions in a real planner's scan-task grouping; probed per file
    # here only because the fixture lacks embedded field-id metadata)
    import pyarrow.parquet as pq

    with_col, without_col = [], []
    for d in data_files:
        names = set(pq.ParquetFile(d["path"]).schema_arrow.names)
        (with_col if flag_field["name"] in names else without_col).append(
            d["path"]
        )
    scans = []
    if without_col:
        scans.append(
            spark.read.parquet(*sorted(without_col)).select(
                "o_totalprice",
                F.lit(initial_default).alias("flag"),
            )
        )
    if with_col:
        scans.append(
            spark.read.parquet(*sorted(with_col)).select(
                "o_totalprice",
                F.col(flag_field["name"]).alias("flag"),
            )
        )
    df = scans[0]
    for s in scans[1:]:
        df = df.unionByName(s)
    return df.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- multi-field partition spec (r13) -------------------------------------------

_MULTISPEC_ORACLE = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
GROUP BY o_orderpriority, o_orderstatus
"""


@register("src_iceberg_multifield_spec", oracle=_MULTISPEC_ORACLE)
def q_src_iceberg_multifield_spec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg MULTI-FIELD partition spec (spec §Partition Specs): a
    spec may carry several transform fields — the partition tuple is a
    struct whose FIELDS, in spec order, key pruning jointly. The staged
    table partitions by (o_orderpriority, o_orderstatus) identity
    pair; a conjunctive point predicate on both fields prunes to
    exactly one partition's files from manifest metadata alone, and
    BOTH column values restore from the tuple (neither is stored in
    the data files).

    Graded: the one (priority, status) cell's count + cents — a reader
    that keys pruning on the FIRST tuple value only over-scans (caught
    by the inputFiles plan gate), one that mis-orders the tuple fields
    restores the wrong columns and fails the hash, one that drops
    non-first fields can't produce o_orderstatus at all.

    Scale: same planner math as single-field pruning — one metadata
    row per file; the conjunctive predicate makes a 100 TB two-level
    layout O(one cell) instead of O(one top-level partition).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    )
    root = _tmp(sf_dir, "iceberg_mspec")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir)

    o.coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderpriority", "o_orderstatus"
    ).parquet(os.path.join(data_dir, "s1"))
    entries = []
    base = os.path.join(data_dir, "s1")
    for d1 in sorted(os.listdir(base)):
        if not d1.startswith("o_orderpriority="):
            continue
        v1 = d1.split("=", 1)[1]
        for d2 in sorted(os.listdir(os.path.join(base, d1))):
            if not d2.startswith("o_orderstatus="):
                continue
            v2 = d2.split("=", 1)[1]
            for f in sorted(os.listdir(os.path.join(base, d1, d2))):
                if f.endswith(".parquet"):
                    entries.append(
                        _entry(
                            _ST_ADDED,
                            _S1,
                            1,
                            os.path.join(base, d1, d2, f),
                            None,
                            partition={
                                "o_orderpriority": v1,
                                "o_orderstatus": v2,
                            },
                        )
                    )
    m1 = _write_manifest(
        meta_dir,
        "m1-multispec.avro",
        entries,
        schema=_entry_schema_for(
            [("o_orderpriority", 1000), ("o_orderstatus", 1001)]
        ),
    )
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-mspc",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": _T1,
        "last-column-id": 4,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                    {
                        "id": 3,
                        "name": "o_orderpriority",
                        "required": False,
                        "type": "string",
                    },
                    {
                        "id": 4,
                        "name": "o_orderstatus",
                        "required": False,
                        "type": "string",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 3,
                        "field-id": 1000,
                        "name": "o_orderpriority",
                        "transform": "identity",
                    },
                    {
                        "source-id": 4,
                        "field-id": 1001,
                        "name": "o_orderstatus",
                        "transform": "identity",
                    },
                ],
            }
        ],
        "default-spec-id": 0,
        "current-snapshot-id": _S1,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T1, "snapshot-id": _S1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: conjunctive tuple pruning under the declared spec
    meta = _iceberg_table_meta(root)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    want = ("1-URGENT", "F")
    data, _ = _iceberg_files_full(
        _iceberg_snapshot(meta),
        partition_pred=lambda t: t == want,
        specs=specs,
        pred_spec_id=0,
    )
    if not data:
        return local_rows(spark, 
            [],
            "o_orderpriority string, o_orderstatus string, n_rows long, "
            "total_cents long",
        )
    df = spark.read.parquet(*sorted(d["path"] for d in data)).select(
        "o_totalprice",
        F.lit(want[0]).alias("o_orderpriority"),
        F.lit(want[1]).alias("o_orderstatus"),
    )
    return df.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- snapshot refs: branches and tags (r13) -------------------------------------

_REFS_ORACLE = """
SELECT r.ref,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS total_cents
FROM (VALUES ('audit-tag'), ('wap-branch'), ('main')) AS r(ref)
LEFT JOIN orders o
       ON ((r.ref = 'audit-tag' AND o.o_orderkey % 2 = 0)
        OR (r.ref = 'wap-branch')
        OR (r.ref = 'main' AND o.o_orderpriority <> '1-URGENT'))
GROUP BY r.ref
"""


@register("src_iceberg_refs", oracle=_REFS_ORACLE)
def q_src_iceberg_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg SNAPSHOT REFS (spec §Snapshot References): the metadata's
    `refs` map names branches and tags — `main` tracks the current
    snapshot, a TAG pins an audit point forever, and a side BRANCH is
    the write-audit-publish (WAP) pattern: data lands on the branch,
    auditors read it by name, publish fast-forwards main. Readers
    resolve a ref exactly like a snapshot id — no log replay, each
    snapshot self-contained.

    Staged: the shared three-snapshot table plus refs `audit-tag` → s1
    (evens only), `wap-branch` → s2 (everything, incl. the partition
    s3 later deletes), `main` → s3. Graded: per-ref counts + cents in
    ONE output — a reader that sends every ref to the current snapshot
    collapses the three rows to equal values; one that resolves tags
    through the snapshot-log instead of the refs map breaks on
    branches whose head is not on main's log.

    Scale: ref resolution is one dict lookup in planner metadata; each
    ref's read costs the same bounded manifest walk + one distributed
    scan as a current-snapshot read — the property that makes
    branch-based audit workflows free at 100 TB.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_refs")
    _iceberg_stage(spark, o, root)
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "v3.metadata.json")) as fh:
        tm = json.load(fh)
    tm["refs"] = {
        "main": {"snapshot-id": _S3, "type": "branch"},
        "audit-tag": {
            "snapshot-id": _S1,
            "type": "tag",
            "max-ref-age-ms": 9_000_000_000_000,
        },
        "wap-branch": {
            "snapshot-id": _S2,
            "type": "branch",
            "min-snapshots-to-keep": 1,
        },
    }
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(tm, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")

    meta = _iceberg_table_meta(root)
    spine = local_rows(spark, 
        [("audit-tag",), ("wap-branch",), ("main",)], "ref string"
    )
    parts = []
    for label in ("audit-tag", "wap-branch", "main"):
        snap = _iceberg_snapshot(meta, ref=label)
        df = _scan_with_partition(spark, _iceberg_live_files(snap))
        if df is not None:
            parts.append(df.withColumn("ref", F.lit(label)))
    if not parts:
        return spine.select(
            "ref",
            F.lit(0).cast("bigint").alias("n_rows"),
            F.lit(0).cast("bigint").alias("total_cents"),
        )
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    per = both.groupBy("ref").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )
    return spine.join(per, "ref", "left").select(
        "ref",
        F.coalesce("n_rows", F.lit(0).cast("bigint")).alias("n_rows"),
        F.coalesce("total_cents", F.lit(0).cast("bigint")).alias(
            "total_cents"
        ),
    )


# --- UniForm-style dual-format metadata (r13) -----------------------------------

_UNIFORM_ORACLE = """
SELECT fmt.format,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM (VALUES ('delta'), ('iceberg')) AS fmt(format)
CROSS JOIN orders o
WHERE o.o_orderpriority <> '1-URGENT'
GROUP BY fmt.format
"""


@register("src_lake_uniform", oracle=_UNIFORM_ORACLE)
def q_src_lake_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNIFORM-style dual-format table (the public delta-io UniForm
    design: ONE copy of the parquet data, with BOTH a Delta log and an
    Iceberg metadata tree describing it — Iceberg metadata is generated
    alongside each Delta commit so any reader picks its format). The
    staged table writes per-priority data files ONCE, then: Delta
    commit 0 adds all files / commit 1 removes the 1-URGENT file;
    Iceberg s1 adds the same files / s2 is a rewrite manifest with the
    urgent entry DELETED. Both metadata trees must converge on the
    SAME live set over the same bytes.

    Graded: the SAME aggregate read through each format's full reader
    chain, one row per format — any divergence between the two
    metadata interpretations (a missed remove, a status mis-read, a
    stale snapshot) breaks exactly one row's hash against the oracle.

    Scale: this is the 100 TB migration story — flipping query engines
    costs zero data movement because both planners read metadata over
    shared storage; each side here stays the same bounded
    metadata-walk + one distributed scan as its native keys.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "lake_uniform")
    data_dir = os.path.join(root, "data")
    log_dir = os.path.join(root, "_delta_log")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(log_dir)
    os.makedirs(meta_dir)

    # ONE copy of the data: one file per priority partition
    o.coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(data_dir)
    pfiles = _pfiles(root, "data")  # (abs path, priority)

    # --- Delta log over the shared files
    lines0 = [json.dumps({"commitInfo": {"operation": "WRITE"}})]
    for p, v in pfiles:
        rel = os.path.relpath(p, root)
        lines0.append(
            json.dumps(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {"o_orderpriority": v},
                        "dataChange": True,
                    }
                }
            )
        )
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(lines0) + "\n")
    lines1 = [json.dumps({"commitInfo": {"operation": "DELETE"}})]
    for p, v in pfiles:
        if v == "1-URGENT":
            rel = os.path.relpath(p, root)
            lines1.append(
                json.dumps({"remove": {"path": rel, "dataChange": True}})
            )
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write("\n".join(lines1) + "\n")

    # --- Iceberg metadata over the SAME files
    m1 = _write_manifest(
        meta_dir,
        "m1-uniform.avro",
        [_entry(_ST_ADDED, _S1, 1, p, v) for p, v in pfiles],
    )
    m2 = _write_manifest(
        meta_dir,
        "m2-uniform-rewrite.avro",
        [
            _entry(
                _ST_DELETED if v == "1-URGENT" else _ST_EXISTING,
                _S2,
                2,
                p,
                v,
            )
            for p, v in pfiles
        ],
    )
    l1 = _write_manifest_list(meta_dir, _S1, 1, [(m1, _S1)])
    l2 = _write_manifest_list(meta_dir, _S2, 2, [(m2, _S2)])
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-lake-unifrm",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": _T2,
        "last-column-id": 3,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                    {
                        "id": 3,
                        "name": "o_orderpriority",
                        "required": False,
                        "type": "string",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 3,
                        "field-id": 1000,
                        "name": "o_orderpriority",
                        "transform": "identity",
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "current-snapshot-id": _S2,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            },
            {
                "snapshot-id": _S2,
                "sequence-number": 2,
                "timestamp-ms": _T2,
                "manifest-list": l2,
                "summary": {"operation": "delete"},
                "schema-id": 0,
            },
        ],
        "snapshot-log": [
            {"timestamp-ms": _T1, "snapshot-id": _S1},
            {"timestamp-ms": _T2, "snapshot-id": _S2},
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- read through BOTH format chains
    from random_forest_using_hadoop_spark.operators.scans import (
        _delta_check_protocol,
    )

    _delta_check_protocol(log_dir)
    live: dict[str, str] = {}
    for f in sorted(os.listdir(log_dir)):
        if not (f.endswith(".json") and f.split(".", 1)[0].isdigit()):
            continue
        for line in open(os.path.join(log_dir, f)):
            line = line.strip()
            if not line:
                continue
            act = json.loads(line)
            if "add" in act:
                a = act["add"]
                live[a["path"]] = a["partitionValues"]["o_orderpriority"]
            elif "remove" in act:
                live.pop(act["remove"]["path"], None)
    delta_files = [
        (os.path.join(root, rel), v, 0) for rel, v in sorted(live.items())
    ]
    ice_files = _iceberg_live_files(
        _iceberg_snapshot(_iceberg_table_meta(root))
    )
    parts = []
    for label, files in (("delta", delta_files), ("iceberg", ice_files)):
        df = _scan_with_partition(spark, [(p, v, n) for p, v, n in files])
        if df is not None:
            parts.append(df.withColumn("format", F.lit(label)))
    if not parts:
        return local_rows(spark, 
            [], "format string, n_rows long, total_cents long"
        )
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    return both.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- manifest-level pruning via field summaries (r13) ---------------------------

_MANIFEST_PRUNE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderpriority = '5-LOW'
GROUP BY o_orderpriority
"""


def _manifest_file_schema_with_summaries() -> dict:
    """Manifest-list schema + the spec's `partitions` field summaries
    (field 507: per-partition-field contains_null(509) and
    lower/upper bounds(510/511) as single-value-serialized bytes)."""
    import copy

    schema = copy.deepcopy(_MANIFEST_FILE_SCHEMA)
    schema["fields"].append(
        {
            "name": "partitions",
            "field-id": 507,
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
        }
    )
    return schema


@register("src_iceberg_manifest_prune", oracle=_MANIFEST_PRUNE_ORACLE)
def q_src_iceberg_manifest_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg MANIFEST-LEVEL pruning (spec §Manifest Lists, the
    `partitions` field summaries): the manifest list records, per
    manifest, each partition field's [lower, upper] value bounds — so
    the planner can skip a WHOLE manifest without opening it. This is
    the second pruning tier that keeps PLANNING cost sane at 100 TB:
    entry-level pruning still reads every manifest (O(files) metadata
    rows); summary pruning reads only the manifests whose bound range
    can match (O(matching manifests)), which is why writers cluster
    manifests by partition range.

    Staged: the orders table split into TWO data manifests by priority
    range — m-low covering {1-URGENT, 2-HIGH}, m-high covering
    {3-MEDIUM, 4-NOT SPECIFIED, 5-LOW} — each manifest-list entry
    carrying true UTF-8 bound summaries. The '5-LOW' point query must
    skip m-low AT THE LIST LEVEL (gated via the ScanReport metric —
    the manifest is never opened) and then entry-prune inside m-high.

    Graded: 5-LOW counts + cents; a reader that ignores summaries still
    answers correctly but opens every manifest — exactly what the
    _LAST_SCAN_REPORT plan gate catches.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_mprune")
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(meta_dir)

    o.coalesce(1).write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(os.path.join(data_dir, "s1"))
    pfiles = _pfiles(data_dir, "s1")
    low = [(p, v) for p, v in pfiles if v in ("1-URGENT", "2-HIGH")]
    high = [(p, v) for p, v in pfiles if v not in ("1-URGENT", "2-HIGH")]

    recs = []
    manifests = []
    for name, group in (("m-low.avro", low), ("m-high.avro", high)):
        mpath = _write_manifest(
            meta_dir,
            name,
            [_entry(_ST_ADDED, _S1, 1, p, v) for p, v in group],
        )
        manifests.append(mpath)
        vals = sorted(v for _, v in group)
        _, entries, _ = ocf_read(mpath)
        recs.append(
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": _S1,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"] for e in entries
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": [
                    {
                        "contains_null": False,
                        "lower_bound": vals[0].encode("utf-8"),
                        "upper_bound": vals[-1].encode("utf-8"),
                    }
                ],
            }
        )
    l1 = os.path.join(meta_dir, f"snap-{_S1}-1-fixture.avro")
    ocf_write(
        l1,
        _manifest_file_schema_with_summaries(),
        recs,
        metadata={"format-version": "2"},
    )
    meta = {
        "format-version": 2,
        "table-uuid": "9f2a7b4e-1d15-4d29-8c3a-iceberg-mprn",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": _T1,
        "last-column-id": 3,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {
                        "id": 1,
                        "name": "o_orderkey",
                        "required": False,
                        "type": "long",
                    },
                    {
                        "id": 2,
                        "name": "o_totalprice",
                        "required": False,
                        "type": "double",
                    },
                    {
                        "id": 3,
                        "name": "o_orderpriority",
                        "required": False,
                        "type": "string",
                    },
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 3,
                        "field-id": 1000,
                        "name": "o_orderpriority",
                        "transform": "identity",
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "current-snapshot-id": _S1,
        "snapshots": [
            {
                "snapshot-id": _S1,
                "sequence-number": 1,
                "timestamp-ms": _T1,
                "manifest-list": l1,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"timestamp-ms": _T1, "snapshot-id": _S1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # --- reader: summary test at the LIST level, then entry pruning
    want = "5-LOW"

    def _summary_may_match(summaries: list[dict]) -> bool:
        s = summaries[0]
        lo = (s.get("lower_bound") or b"").decode("utf-8")
        hi = (s.get("upper_bound") or b"").decode("utf-8")
        return (not lo or lo <= want) and (not hi or want <= hi)

    meta = _iceberg_table_meta(root)
    data, _ = _iceberg_files_full(
        _iceberg_snapshot(meta),
        partition_pred=lambda v: v == want,
        manifest_pred=_summary_may_match,
    )
    if not data:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    df = spark.read.parquet(*sorted(d["path"] for d in data)).select(
        "o_totalprice", F.lit(want).alias("o_orderpriority")
    )
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
    )


# --- metadata tables (the $files inspection surface) (r13) ----------------------

_METAFILES_ORACLE = """
SELECT o_orderpriority AS partition_value,
       CAST(COUNT(DISTINCT o_orderkey % 2) AS BIGINT) AS file_count,
       CAST(COUNT(*) AS BIGINT) AS record_count
FROM orders
WHERE o_orderpriority <> '1-URGENT'
GROUP BY o_orderpriority
"""


@register("src_iceberg_meta_files", oracle=_METAFILES_ORACLE)
def q_src_iceberg_meta_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg METADATA TABLES (iceberg-core's `table$files` /
    `table$partitions` inspection surface): the planner's own file
    metadata exposed AS A QUERYABLE DATAFRAME — one row per live data
    file with its partition value, record count, and size, aggregated
    here to the `$partitions` view (file_count + record_count per
    partition). Operators use this for small-file detection, skew
    audits, and compaction planning WITHOUT touching data.

    Staged: the shared three-snapshot table (after the s3 urgent
    delete each surviving priority holds one file per parity
    GENERATION that actually has rows — file_count is a property of
    the committed manifests, reproduced by the oracle as the distinct
    parities present). Graded: per-partition file_count
    AND record_count — record counts must equal the true row counts
    (manifest stats are real, the spec requires them accurate), so a
    reader that opens parquet footers instead of trusting manifests
    gets the same numbers SLOWER, while one that miscounts entry
    status gets them wrong.

    Scale: the whole query is planner metadata — one row per file,
    zero data bytes read; this is why `$partitions` on a million-file
    table answers in seconds.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_metafiles")
    _iceberg_stage(spark, o, root)
    meta = _iceberg_table_meta(root)
    files = _iceberg_live_files(_iceberg_snapshot(meta))
    if not files:
        return local_rows(spark, 
            [],
            "partition_value string, file_count long, record_count long",
        )
    fdf = local_rows(spark, 
        [(v, n) for _, v, n in files],
        "partition_value string, record_count long",
    )
    return fdf.groupBy("partition_value").agg(
        F.count(F.lit(1)).cast("bigint").alias("file_count"),
        F.sum("record_count").cast("bigint").alias("record_count"),
    )


# --- rollback (metadata-only restore) (r13) -------------------------------------

_ROLLBACK_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderpriority
"""


@register("sink_iceberg_rollback", oracle=_ROLLBACK_ORACLE)
def q_sink_iceberg_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ROLLBACK (the `rollback_to_snapshot` maintenance
    procedure): restoring a table to an earlier state is METADATA-ONLY
    — a new metadata version points current-snapshot-id back at the
    old snapshot (self-contained, still present) and appends a
    snapshot-log entry; no data moves, no files rewrite, and the bad
    snapshots stay reachable for forensics until expiry. The recovery
    story that makes a fat-fingered 100 TB delete a one-second fix.

    Staged: the shared three-snapshot table, then rollback to s1
    (evens only) via v4.metadata.json. Graded: the post-rollback read
    must be EXACTLY s1's contents — a reader that follows
    snapshot-log order instead of current-snapshot-id, or replays
    later snapshots Delta-style, returns s2/s3 rows and fails the
    hash. The fixture asserts no data file was touched by comparing
    the file inventory before/after.

    Scale: one JSON write + one pointer flip — O(metadata), the whole
    point.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = _tmp(sf_dir, "iceberg_rollback")
    _iceberg_stage(spark, o, root)
    meta_dir = os.path.join(root, "metadata")

    def _inventory() -> dict[str, float]:
        out = {}
        for dirpath, _, files in os.walk(os.path.join(root, "data")):
            for f in files:
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
        return out

    before = _inventory()
    with open(os.path.join(meta_dir, "v3.metadata.json")) as fh:
        tm = json.load(fh)
    _T4 = _T3 + 60_000
    tm["current-snapshot-id"] = _S1  # the rollback: a pointer flip
    tm["snapshot-log"].append({"timestamp-ms": _T4, "snapshot-id": _S1})
    tm["last-updated-ms"] = _T4
    with open(os.path.join(meta_dir, "v4.metadata.json"), "w") as fh:
        json.dump(tm, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("4")
    if _inventory() != before:
        raise AssertionError("rollback must not touch data files")

    meta = _iceberg_table_meta(root)
    df = _scan_with_partition(
        spark, _iceberg_live_files(_iceberg_snapshot(meta))
    )
    if df is None:
        return local_rows(spark, 
            [], "o_orderpriority string, n_rows long, total_cents long"
        )
    return _cents_agg(df)
