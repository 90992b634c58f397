"""Hudi copy-on-write TIMELINE replay — the third major table format
next to the Delta log (operators/deltalog.py) and the Iceberg
snapshot chain (operators/iceberg.py), implemented from the public
Apache Hudi spec (hudi.apache.org 'Timeline' / 'Table & Query Types'):

- the ``.hoodie/`` timeline is a set of instant files named
  ``<instantTime>.<action>[.<state>]``; only COMPLETED commits (no
  ``.inflight`` / ``.requested`` suffix) are readable — a snapshot
  read at instant T sees, per FILE GROUP (fileId), the base file
  written by the LATEST completed commit <= T (copy-on-write: an
  update rewrites the whole base file under the same fileId with a
  new instant in its name);
- a commit file is JSON with ``partitionToWriteStats``:
  {partition: [{fileId, path, numWrites, fileSizeInBytes}]};
- instant times order lexicographically (Hudi's timestamps are
  fixed-width yyyyMMddHHmmss strings).

Trust chain: a fileId appearing twice in one commit refuses (a file
group has exactly one base file per commit), every SELECTED base
file's bytes must match the commit's fileSizeInBytes and its decoded
row count the commit's numWrites, and files written by INFLIGHT
commits are provably never read (the fixture plants one and the test
corrupts it — dirty reads are exactly what the timeline exists to
prevent). Superseded base files (rewritten groups' old versions) are
likewise never opened.

Ships as one tar per table; Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gmall_flink_210726_spark.operators.tar import _BLOCK, _make_header
from gmall_flink_210726_spark.operators.wds import _iter_tar_members

HUDI_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("n_completed", LongType()),
        StructField("n_inflight", LongType()),
        StructField("n_groups", LongType()),
        StructField("total_rows", LongType()),
        StructField("k_sum", LongType()),
    ]
)


def read_hudi_snapshot(data: bytes, asof: str | None = None) -> dict | None:
    """Tar table -> COW snapshot totals at the latest completed
    instant (or ``asof``); None on any timeline/trust violation
    (module doc)."""
    from gmall_flink_210726_spark.operators.parquetmeta import (
        read_parquet_column_k,
    )

    members = _iter_tar_members(data)
    if members is None:
        return None
    files = dict(members)
    completed: list[str] = []
    inflight = 0
    for name in files:
        if not name.startswith(".hoodie/"):
            continue
        base = name[len(".hoodie/") :]
        # Real Hudi names a commit-action inflight instant bare
        # "<ts>.inflight" (no action infix); accept both spellings.
        if base.endswith((".inflight", ".requested")):
            inflight += 1
        elif base.endswith(".commit"):
            ts = base[: -len(".commit")]
            if not ts.isdigit():
                return None
            completed.append(ts)
    if not completed:
        return None
    completed.sort()
    readable = [
        t for t in completed if asof is None or t <= asof
    ]
    if not readable:
        return None  # as-of predates the table
    # per file group: the base file of the LATEST readable commit
    latest: dict[str, tuple[str, dict]] = {}  # fileId -> (ts, stats)
    for ts in readable:
        try:
            commit = json.loads(
                files[f".hoodie/{ts}.commit"].decode("utf-8")
            )
        except (ValueError, UnicodeDecodeError):
            return None
        pws = commit.get("partitionToWriteStats")
        if not isinstance(pws, dict):
            return None
        seen_here: set[str] = set()
        for _part, stats in pws.items():
            if not isinstance(stats, list):
                return None
            for st in stats:
                if (
                    not isinstance(st, dict)
                    or not isinstance(st.get("fileId"), str)
                    or not isinstance(st.get("path"), str)
                ):
                    return None
                fid = st["fileId"]
                if fid in seen_here:
                    return None  # one base file per group per commit
                seen_here.add(fid)
                latest[fid] = (ts, st)
    total_rows = k_sum = 0
    for fid, (_ts, st) in latest.items():
        blob = files.get(st["path"])
        if blob is None or len(blob) != st.get("fileSizeInBytes"):
            return None
        col = read_parquet_column_k(blob)
        if col is None or col["n_values"] != st.get("numWrites"):
            return None
        total_rows += col["n_values"]
        k_sum += col["k_sum"]
    return {
        "n_completed": len(readable),
        "n_inflight": inflight,
        "n_groups": len(latest),
        "total_rows": total_rows,
        "k_sum": k_sum,
    }


def hudi_snapshot_stats(df: DataFrame) -> DataFrame:
    """Hudi COW snapshot replay over MEDIA_SCHEMA tar blobs."""
    from gmall_flink_210726_spark.session import ship_package

    ship_package(df.sparkSession)
    cols = [f.name for f in HUDI_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                row = {c: 0 for c in cols}
                row.update(media_id=int(mid), format="unknown")
                b = bytes(blob) if blob is not None else b""
                try:
                    st = read_hudi_snapshot(b)
                except Exception:
                    st = None
                if st is not None:
                    row.update(format="hudi", **st)
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", "content").mapInPandas(
        gen, HUDI_SCHEMA
    )


_T1, _T2, _T3 = "20240101000000", "20240102000000", "20240103000000"


def _hudi_rows(i: int, g: int, c: int) -> list[int]:
    n = 10 + (i + 7 * g + 13 * c) % 40
    return [(i * 5 + g * 11 + c * 17 + 3 * r) % 1000 for r in range(n)]


def _hudi_parquet(kv: list[int]) -> bytes:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"k": pa.array(kv, pa.int64())}),
        buf,
        write_statistics=False,
        use_dictionary=False,
    )
    return buf.getvalue()


def _make_hudi_table(i: int) -> bytes:
    """``2 + i % 3`` file groups. Commit T1 writes every group;
    commit T2 (present on even ids) REWRITES the even groups
    (copy-on-write: same fileId, new base file, old one superseded);
    an INFLIGHT commit at T3 is always present, and the base file it
    wrote for group 0 sits in the tar — a dirty read would see it,
    the timeline replay must not (pinned by corrupting it). Lies:
    every 13th id's latest-commit first write-stat overstates
    numWrites by one (caught by the actual decode); every 19th-miss
    id repeats a fileId inside one commit (refused)."""
    ng = 2 + i % 3
    members: list[tuple[str, bytes]] = []

    def commit_json(ts: str, groups: list[int], c: int, lie: bool):
        stats = []
        for g in groups:
            kv = _hudi_rows(i, g, c)
            path = f"part/f{g}_0-0_{ts}.parquet"
            blob = _hudi_parquet(kv)
            members.append((path, blob))
            n = len(kv)
            if lie and g == groups[0]:
                n += 1
            stats.append(
                {
                    "fileId": f"f{g}",
                    "path": path,
                    "numWrites": n,
                    "fileSizeInBytes": len(blob),
                }
            )
        if i % 19 == 0 and i % 13 != 0 and ts == _T1:
            stats.append(dict(stats[0]))  # duplicate fileId
        return json.dumps({"partitionToWriteStats": {"part": stats}})

    has_t2 = i % 2 == 0
    lie_ts = _T2 if has_t2 else _T1
    members.append(
        (
            f".hoodie/{_T1}.commit",
            commit_json(
                _T1, list(range(ng)), 1, i % 13 == 0 and lie_ts == _T1
            ).encode(),
        )
    )
    if has_t2:
        members.append(
            (
                f".hoodie/{_T2}.commit",
                commit_json(
                    _T2,
                    [g for g in range(ng) if g % 2 == 0],
                    2,
                    i % 13 == 0,
                ).encode(),
            )
        )
    # the inflight commit + its (must-never-be-read) base file
    members.append((f".hoodie/{_T3}.commit.inflight", b"{}"))
    members.append(
        (
            f"part/f0_0-0_{_T3}.parquet",
            _hudi_parquet(_hudi_rows(i, 0, 3)),
        )
    )
    parts = []
    for name, payload in members:
        pad = (-len(payload)) % _BLOCK
        parts.append(
            _make_header(name, len(payload)) + payload + b"\x00" * pad
        )
    return b"".join(parts) + b"\x00" * (2 * _BLOCK)


def synthesize_hudi_media(docs: DataFrame) -> DataFrame:
    """MEDIA_SCHEMA table of Hudi COW tables (timeline + base files)."""
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
                        _make_hudi_table(int(i)) for i in ids
                    ],
                    "meta": [
                        {
                            "format": "hudi",
                            "width": 0,
                            "height": 0,
                            "sample_rate": 0,
                        }
                        for _ in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)
