"""Iceberg snapshot walk — the second table-format metadata layer
(apache/iceberg spec, public), composed from the repo's own Avro
machinery: Iceberg's manifest lists and manifests ARE Avro object
containers, so the schema-driven reader built for the Kafka ingest
path reads the lakehouse catalog path unchanged.

The metadata chain, implemented from the spec:

1. ``vN.metadata.json`` — table metadata: format-version, table
   uuid, the snapshot log, and ``current-snapshot-id`` selecting
   WHICH snapshot is live (the walk must follow it, not just take
   the last file: the fixture plants a DECOY older snapshot whose
   manifest list would give different totals);
2. the current snapshot's MANIFEST LIST (Avro): one record per
   manifest with its path, byte length and per-status file counts;
3. each MANIFEST (Avro): entries ``status`` (0 EXISTING / 1 ADDED /
   2 DELETED) + a nested ``data_file`` record (path, format,
   record_count, file_size_in_bytes).

Cross-checks at every hop: the manifest list's ``manifest_length``
must equal the referenced member's actual byte size, its per-status
counts must equal what the manifest actually contains, every
referenced file must exist in the blob, and DELETED entries are
excluded from live totals. Any Avro-layer violation (sync, CRC,
union bounds) degrades through the container reader itself.

Ships as one tar blob per table, like the Delta twin: the metadata
layer is the only thing a 100 TB planner reads. Arrow-batched
``mapInPandas``, zero shuffle.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gmall_flink_210726_spark.operators.avro import (
    make_avro_container,
    read_avro_container,
)
from gmall_flink_210726_spark.operators.tar import _BLOCK, _make_header
from gmall_flink_210726_spark.operators.wds import _iter_tar_members

MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

ICEBERG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_manifests", LongType()),
        StructField("n_added", LongType()),
        StructField("n_existing", LongType()),
        StructField("n_deleted", LongType()),
        StructField("live_files", LongType()),
        StructField("live_rows", LongType()),
        StructField("live_bytes", LongType()),
    ]
)


def read_iceberg_snapshot(data: bytes) -> dict | None:
    """Tar of metadata.json + Avro manifests -> current-snapshot
    live-file totals; None on any chain violation (module doc)."""
    members = _iter_tar_members(data)
    if members is None:
        return None
    files = dict(members)
    meta_name = next(
        (n for n in files if n.endswith(".metadata.json")), None
    )
    if meta_name is None:
        return None
    try:
        meta = json.loads(files[meta_name].decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        return None
    if not isinstance(meta, dict) or meta.get("format-version") != 2:
        return None
    cur = meta.get("current-snapshot-id")
    snaps = meta.get("snapshots")
    if not isinstance(cur, int) or not isinstance(snaps, list):
        return None
    snap = next(
        (
            s
            for s in snaps
            if isinstance(s, dict) and s.get("snapshot-id") == cur
        ),
        None,
    )
    if snap is None or not isinstance(snap.get("manifest-list"), str):
        return None
    mlist_blob = files.get(snap["manifest-list"])
    if mlist_blob is None:
        return None
    got = read_avro_container(mlist_blob)
    if got is None:
        return None
    mlist, _, _ = got
    out = {
        "n_manifests": len(mlist),
        "n_added": 0,
        "n_existing": 0,
        "n_deleted": 0,
        "live_files": 0,
        "live_rows": 0,
        "live_bytes": 0,
    }
    for mf in mlist:
        try:
            path = mf["manifest_path"]
            declared = mf["manifest_length"]
        except (TypeError, KeyError):
            return None
        blob = files.get(path)
        if blob is None or len(blob) != declared:
            return None  # the list must tell the truth about bytes
        g2 = read_avro_container(blob)
        if g2 is None:
            return None
        entries, _, _ = g2
        counts = {0: 0, 1: 0, 2: 0}
        for ent in entries:
            try:
                status = ent["status"]
                df = ent["data_file"]
                rows = df["record_count"]
                size = df["file_size_in_bytes"]
            except (TypeError, KeyError):
                return None
            if status not in counts:
                return None
            counts[status] += 1
            if status != 2:  # EXISTING + ADDED are live
                out["live_files"] += 1
                out["live_rows"] += rows
                out["live_bytes"] += size
        # the list's per-status counts must match the manifest
        if (
            counts[1] != mf.get("added_files_count")
            or counts[0] != mf.get("existing_files_count")
            or counts[2] != mf.get("deleted_files_count")
        ):
            return None
        out["n_added"] += counts[1]
        out["n_existing"] += counts[0]
        out["n_deleted"] += counts[2]
    return out


def _iceberg_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    zero = {
        f.name: 0 for f in ICEBERG_SCHEMA.fields if f.name != "format"
    }
    for mid, blob in zip(pdf["media_id"], pdf["content"]):
        row = dict(zero, media_id=int(mid), format="unknown")
        b = bytes(blob) if blob is not None else b""
        try:
            st = read_iceberg_snapshot(b)
        except Exception:
            st = None
        if st is not None:
            row.update(format="iceberg", **st)
        out.append(row)
    return pd.DataFrame(
        out, columns=[f.name for f in ICEBERG_SCHEMA.fields]
    )


def iceberg_snapshot_stats(df: DataFrame) -> DataFrame:
    """Iceberg metadata-chain walk over MEDIA_SCHEMA blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _iceberg_batch(pdf)

    return df.select("media_id", "content").mapInPandas(
        gen, ICEBERG_SCHEMA
    )


# --------------------------------------------------------------------------
# Fixture
# --------------------------------------------------------------------------


def _manifest_entries(i: int, m: int) -> list[dict]:
    out = []
    for e in range(2 + (i + m) % 3):
        s5 = (i + m + e) % 5
        status = 2 if s5 == 0 else (1 if s5 in (1, 2) else 0)
        out.append(
            {
                "status": status,
                "snapshot_id": None if e % 2 == 0 else 1000 + i,
                "data_file": {
                    "file_path": f"data/part-{m}-{e}.parquet",
                    "file_format": "PARQUET",
                    "record_count": 10 + (i + 7 * m + 3 * e) % 90,
                    "file_size_in_bytes": 500
                    + (11 * i + 13 * m + 17 * e) % 4000,
                },
            }
        )
    return out


def _make_iceberg_table(i: int, bad_stripe: int = 13) -> bytes:
    """``1 + i % 3`` manifests under the CURRENT snapshot, plus a
    DECOY older snapshot whose manifest list covers only manifest 0
    (picking the wrong snapshot shows up as wrong totals whenever
    M > 1). Avro codec rotates null/deflate by id. Every
    ``bad_stripe``-th id lies about manifest 0's byte length in the
    manifest list — the length cross-check must degrade."""
    nm = 1 + i % 3
    codec = ("null", "deflate")[i % 2]
    sync = bytes((i * 29 + 5 * k) % 256 for k in range(16))
    members: list[tuple[str, bytes]] = []
    mlist_cur = []
    for m in range(nm):
        entries = _manifest_entries(i, m)
        blob = make_avro_container(
            MANIFEST_SCHEMA, entries, codec=codec, sync=sync
        )
        name = f"manifest-{m}.avro"
        members.append((name, blob))
        counts = {0: 0, 1: 0, 2: 0}
        for ent in entries:
            counts[ent["status"]] += 1
        length = len(blob)
        if i % bad_stripe == 0 and m == 0:
            length += 1  # the lie the cross-check must catch
        mlist_cur.append(
            {
                "manifest_path": name,
                "manifest_length": length,
                "partition_spec_id": 0,
                "added_files_count": counts[1],
                "existing_files_count": counts[0],
                "deleted_files_count": counts[2],
            }
        )
    members.append(
        (
            "snap-current.avro",
            make_avro_container(
                MLIST_SCHEMA, mlist_cur, codec=codec, sync=sync
            ),
        )
    )
    # decoy: the older snapshot sees only manifest 0
    members.append(
        (
            "snap-old.avro",
            make_avro_container(
                MLIST_SCHEMA, mlist_cur[:1], codec=codec, sync=sync
            ),
        )
    )
    meta = {
        "format-version": 2,
        "table-uuid": f"0000-{i}",
        "current-snapshot-id": 2000 + i,
        "snapshots": [
            {"snapshot-id": 1000 + i, "manifest-list": "snap-old.avro"},
            {
                "snapshot-id": 2000 + i,
                "manifest-list": "snap-current.avro",
            },
        ],
    }
    members.append(
        (f"v{2 + i % 3}.metadata.json", json.dumps(meta).encode())
    )
    parts = []
    for name, payload in members:
        pad = (-len(payload)) % _BLOCK
        parts.append(
            _make_header(name, len(payload)) + payload + b"\x00" * pad
        )
    parts.append(b"\x00" * (2 * _BLOCK))
    return b"".join(parts)


def synthesize_iceberg_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of Iceberg metadata chains (tar blobs)."""
    from gmall_flink_210726_spark.operators.multimodal import MEDIA_SCHEMA
    from gmall_flink_210726_spark.session import (
        ensure_parallelism,
        ship_package,
    )

    ship_package(docs.sparkSession)
    docs = ensure_parallelism(docs.select("doc_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        _make_iceberg_table(int(i)) for i in ids
                    ],
                    "meta": [
                        {
                            "format": "iceberg",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
