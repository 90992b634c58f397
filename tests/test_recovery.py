"""Fault-tolerance semantics (T9, SURVEY §2.9): checkpoint recovery of
keyed Python state, CDC snapshot+stream without double-counting, and
idempotent epoch appends under simulated batch retry."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from gmall_flink_210726_spark import sinks
from gmall_flink_210726_spark.sources.cdc import read_cdc_batch, snapshot_then_stream
from gmall_flink_210726_spark.streaming.stateful import streaming_fix_is_new


class TestStatefulCheckpointRecovery:
    def test_state_survives_restart(self, spark, tmp_path):
        """applyInPandasWithState state must be restored from the
        checkpoint: events in the second run (same mid, claimed new)
        must be rewritten because the FIRST run recorded the mid."""
        src, ckpt = tmp_path / "src", str(tmp_path / "ckpt")
        src.mkdir()
        out1 = str(tmp_path / "out1")
        (src / "b0.json").write_text(
            json.dumps({"mid": "m1", "ts": 1000, "flag": "1", "payload": "a"})
            + "\n"
            + json.dumps({"mid": "m2", "ts": 1500, "flag": "0", "payload": "b"})
        )

        def run(out):
            stream = spark.readStream.schema(
                "mid string, ts long, flag string, payload string"
            ).json(str(src))
            q = (
                streaming_fix_is_new(stream)
                .writeStream.foreachBatch(
                    lambda b, e: sinks.append_stats_table(b, out)
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run(out1)
        got1 = {(r.mid, r.flag) for r in spark.read.parquet(out1).collect()}
        assert got1 == {("m1", "1"), ("m2", "0")}  # first-ever m1 keeps '1'

        # second run, SAME checkpoint: m1 claims '1' again → state must
        # remember it and rewrite to '0'
        (src / "b1.json").write_text(
            json.dumps({"mid": "m1", "ts": 2000, "flag": "1", "payload": "c"})
        )
        out2 = str(tmp_path / "out2")
        run(out2)
        got2 = {(r.mid, r.flag, r.payload) for r in spark.read.parquet(out2).collect()}
        assert got2 == {("m1", "0", "c")}


class TestCdcSnapshotThenStream:
    def test_no_double_count(self, spark, tmp_path):
        """S2 StartupOptions.initial() semantics (SURVEY §7.4 risk 6):
        the snapshot is a batch read of current state, the stream holds
        only post-snapshot changes; replaying both into the dim store
        yields exactly the final state."""
        snap_dir, stream_dir = tmp_path / "snap", tmp_path / "stream"
        snap_dir.mkdir(), stream_dir.mkdir()
        # snapshot: rows 1, 2 exist
        (snap_dir / "s.json").write_text(
            "\n".join(
                json.dumps(
                    {"database": "g", "tableName": "sku", "before": {},
                     "after": {"id": str(i), "name": f"v{i}"}, "type": "insert"}
                )
                for i in (1, 2)
            )
        )
        # stream: row 2 updated, row 3 inserted
        (stream_dir / "c.json").write_text(
            "\n".join(
                [
                    json.dumps({"database": "g", "tableName": "sku", "before": {"id": "2", "name": "v2"},
                                "after": {"id": "2", "name": "v2b"}, "type": "update"}),
                    json.dumps({"database": "g", "tableName": "sku", "before": {},
                                "after": {"id": "3", "name": "v3"}, "type": "insert"}),
                ]
            )
        )
        snap = read_cdc_batch(spark, str(snap_dir))
        stream = read_cdc_batch(spark, str(stream_dir))  # batch-replay mode
        merged = snapshot_then_stream(snap, stream)
        rows = merged.select(
            F.col("after")["id"].alias("id"), F.col("after")["name"].alias("name"), "type"
        )
        dim = str(tmp_path / "dim")
        # apply in arrival order: bootstrap first, then changes
        sinks.upsert_dim_table(
            spark, dim, rows.filter(F.col("type") == "bootstrap-insert").drop("type"), pk="id"
        )
        sinks.upsert_dim_table(
            spark, dim, rows.filter(F.col("type") != "bootstrap-insert").drop("type"), pk="id"
        )
        got = {r.id: r.name for r in sinks.read_dim_table(spark, dim).collect()}
        assert got == {"1": "v1", "2": "v2b", "3": "v3"}


class TestEpochIdempotentAppend:
    def test_retried_epoch_overwrites(self, spark, tmp_path):
        out = str(tmp_path / "stats")
        batch = spark.createDataFrame([(1,), (2,)], ["x"])
        sinks.append_stats_exactly_once(batch, 7, out)
        # simulated retry of the SAME epoch (crash between write and
        # checkpoint commit): must replace, not duplicate
        sinks.append_stats_exactly_once(batch, 7, out)
        sinks.append_stats_exactly_once(spark.createDataFrame([(3,)], ["x"]), 8, out)
        vals = sorted(r.x for r in spark.read.parquet(out).collect())
        assert vals == [1, 2, 3]


class TestDimUpsertCommitProtocol:
    """K4 atomicity: the version-dir + atomic-pointer commit must leave a
    readable, consistent table across a crash at any point (reference
    behavior: Phoenix upsert is atomic per row, func/DimSinkFunction.java:28-72)."""

    def test_crash_before_pointer_commit_keeps_old_version(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "dim")
        v1 = spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "name"])
        sinks.upsert_dim_table(spark, path, v1, pk="id")
        before = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}

        # crash injection: die after the new version dir is fully
        # written but before the pointer replace (the commit point)
        real_replace = os.replace

        def exploding_replace(src, dst):
            if os.path.basename(dst) == "_CURRENT":
                raise OSError("injected crash before pointer commit")
            return real_replace(src, dst)

        monkeypatch.setattr(os, "replace", exploding_replace)
        v2 = spark.createDataFrame([("2", "B2"), ("3", "c")], ["id", "name"])
        try:
            sinks.upsert_dim_table(spark, path, v2, pk="id")
            raise AssertionError("crash injection did not fire")
        except OSError:
            pass
        monkeypatch.undo()

        # reader sees the LAST COMMITTED version, complete and unchanged
        after = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert after == before == {"1": "a", "2": "b"}

        # the interrupted upsert is retryable and converges
        sinks.upsert_dim_table(spark, path, v2, pk="id")
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "a", "2": "B2", "3": "c"}

    def test_concurrent_reader_snapshot_survives_commit(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        sinks.upsert_dim_table(
            spark, path, spark.createDataFrame([("1", "a")], ["id", "name"]), pk="id"
        )
        # reader resolves the pointer (simulating an in-flight scan) ...
        snapshot_df = sinks.read_dim_table(spark, path)
        # ... then a writer commits a new version underneath it
        sinks.upsert_dim_table(
            spark, path, spark.createDataFrame([("1", "A2")], ["id", "name"]), pk="id"
        )
        # old version dir is retained (keep_versions=2): the snapshot read
        # still completes against intact files
        assert {r.name for r in snapshot_df.collect()} == {"a"}
        assert {r.name for r in sinks.read_dim_table(spark, path).collect()} == {"A2"}

    def test_legacy_flat_table_migrates(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "name"]).write.parquet(
            path
        )  # legacy flat layout (pre-versioning)
        sinks.upsert_dim_table(
            spark, path, spark.createDataFrame([("2", "B2")], ["id", "name"]), pk="id"
        )
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "a", "2": "B2"}
        assert sinks._current_version(path) == "v1"

    def test_old_versions_gc(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        for i in range(4):
            sinks.upsert_dim_table(
                spark,
                path,
                spark.createDataFrame([("1", f"n{i}")], ["id", "name"]),
                pk="id",
            )
        versions = sorted(n for n in os.listdir(path) if n.startswith("v"))
        assert versions == ["v3", "v4"]  # current + one predecessor
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "n3"}


class TestDimUpsertConcurrentWriters:
    """Two concurrent upserts must serialize via the O_CREAT|O_EXCL
    writer lock: without it both compute v{n+1}, clobber each other's
    version dir, and race the pointer (one update silently lost)."""

    def test_two_writer_race_loses_no_update(self, spark, tmp_path):
        import threading

        path = str(tmp_path / "dim")
        sinks.upsert_dim_table(
            spark,
            path,
            spark.createDataFrame([("1", "a"), ("2", "b")], ["id", "name"]),
            pk="id",
        )
        barrier = threading.Barrier(2)
        errs = []

        def writer(rows):
            try:
                barrier.wait()
                sinks.upsert_dim_table(
                    spark,
                    path,
                    spark.createDataFrame(rows, ["id", "name"]),
                    pk="id",
                )
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)

        t1 = threading.Thread(target=writer, args=([("1", "A2")],))
        t2 = threading.Thread(target=writer, args=([("3", "c")],))
        t1.start(), t2.start()
        t1.join(120), t2.join(120)
        assert not errs
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        # BOTH updates survive regardless of commit order
        assert got == {"1": "A2", "2": "b", "3": "c"}
        assert not os.path.exists(os.path.join(path, "_LOCK"))

    def test_stale_lock_from_crashed_writer_is_broken(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        os.makedirs(path)
        lock = os.path.join(path, "_LOCK")
        with open(lock, "w") as f:
            f.write("dead-writer\n")
        os.utime(lock, (1, 1))  # crashed long ago
        sinks.upsert_dim_table(
            spark,
            path,
            spark.createDataFrame([("1", "a")], ["id", "name"]),
            pk="id",
            lock_stale_after=5.0,
        )
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "a"}
        assert not os.path.exists(lock)

    def test_live_lock_times_out(self, spark, tmp_path):
        import pytest

        path = str(tmp_path / "dim")
        os.makedirs(path)
        with open(os.path.join(path, "_LOCK"), "w") as f:
            f.write("live-writer\n")  # fresh mtime: looks held
        with pytest.raises(TimeoutError):
            sinks.upsert_dim_table(
                spark,
                path,
                spark.createDataFrame([("1", "a")], ["id", "name"]),
                pk="id",
                lock_timeout=0.3,
            )

    def test_gc_grace_spares_young_versions(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        for i in range(4):
            sinks.upsert_dim_table(
                spark,
                path,
                spark.createDataFrame([("1", f"n{i}")], ["id", "name"]),
                pk="id",
                gc_grace_seconds=3600.0,
            )
        versions = sorted(n for n in os.listdir(path) if n.startswith("v"))
        # all versions are young: none GC'd despite keep_versions=2
        assert versions == ["v1", "v2", "v3", "v4"]
        got = {r.id: r.name for r in sinks.read_dim_table(spark, path).collect()}
        assert got == {"1": "n3"}


class TestDimTimeTravel:
    def test_version_pinned_read(self, spark, tmp_path):
        path = str(tmp_path / "dim")
        for i in range(3):
            sinks.upsert_dim_table(
                spark,
                path,
                spark.createDataFrame([("1", f"n{i}")], ["id", "name"]),
                pk="id",
                keep_versions=3,
            )
        assert {r.name for r in sinks.read_dim_table(spark, path).collect()} == {"n2"}
        assert {
            r.name for r in sinks.read_dim_table(spark, path, version=2).collect()
        } == {"n1"}
        assert {
            r.name for r in sinks.read_dim_table(spark, path, version=1).collect()
        } == {"n0"}

    def test_gcd_version_raises_with_retained_list(self, spark, tmp_path):
        import pytest

        path = str(tmp_path / "dim")
        for i in range(4):  # keep_versions=2 → v1, v2 GC'd
            sinks.upsert_dim_table(
                spark,
                path,
                spark.createDataFrame([("1", f"n{i}")], ["id", "name"]),
                pk="id",
            )
        with pytest.raises(FileNotFoundError) as ei:
            sinks.read_dim_table(spark, path, version=1)
        assert "[3, 4]" in str(ei.value)


class TestStatsCompaction:
    def test_compaction_is_lossless_and_shrinks_files(self, spark, tmp_path):
        path = str(tmp_path / "stats")
        # simulate many tiny exactly-once epochs
        for epoch in range(8):
            df = spark.createDataFrame(
                [(epoch, i, float(i)) for i in range(5)], ["batch", "k", "v"]
            )
            sinks.append_stats_exactly_once(df, epoch, path)
        before = {(r.batch, r.k, r.v) for r in spark.read.parquet(path).collect()}
        n_files_before = sum(
            1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )
        n = sinks.compact_stats_table(spark, path, target_partitions=1)
        assert n == 40
        after_df = spark.read.parquet(path)
        after = {(r.batch, r.k, r.v) for r in after_df.collect()}
        assert after == before
        # epoch_id partition column survives as a data column
        assert "epoch_id" in after_df.columns
        n_files_after = sum(
            1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )
        assert n_files_after < n_files_before
        assert n_files_after == 1
        assert not os.path.exists(path.rstrip("/") + "_precompact")
        assert not os.path.exists(path.rstrip("/") + "_compact_tmp")


class TestWriterLockHeartbeat:
    """ADVICE r4: a LIVE holder whose merge outlasts lock_stale_after
    must NOT have its lock broken (heartbeat refreshes mtime), and
    stale-breaking must be atomic (rename + inode check, no remove()
    TOCTOU double-break)."""

    def test_heartbeat_keeps_long_merge_lock_fresh(self, tmp_path):
        path = str(tmp_path / "dim")
        lock = sinks._acquire_writer_lock(path, timeout=1.0, stale_after=0.4)
        try:
            time.sleep(1.2)  # 3× stale_after: un-heartbeated would be stale
            age = time.time() - os.path.getmtime(lock.path)
            assert age < 0.4, f"heartbeat failed to refresh mtime (age={age})"
            # a waiter therefore times out instead of breaking the lock
            with pytest.raises(TimeoutError):
                sinks._acquire_writer_lock(path, timeout=0.3, stale_after=0.4)
        finally:
            lock.release()
        assert not os.path.exists(lock.path)

    def test_heartbeat_restores_wrongly_broken_lock(self, tmp_path):
        path = str(tmp_path / "dim")
        lock = sinks._acquire_writer_lock(path, timeout=1.0, stale_after=0.4)
        try:
            os.remove(lock.path)  # simulate a misjudging breaker
            time.sleep(0.5)  # > one heartbeat interval (stale_after/4)
            assert os.path.exists(lock.path), "heartbeat did not self-heal"
        finally:
            lock.release()

    def test_stale_break_is_single_winner(self, tmp_path):
        """N threads race to break one genuinely stale lock: exactly one
        writer may hold at a time afterwards, and no thread errors (the
        losers' rename raises FileNotFoundError internally and re-waits)."""
        import threading

        path = str(tmp_path / "dim")
        os.makedirs(path)
        stale = os.path.join(path, "_LOCK")
        with open(stale, "w") as f:
            f.write("dead\n")
        os.utime(stale, (1, 1))
        barrier = threading.Barrier(4)
        holders, errs = [], []
        guard = threading.Lock()

        def contender():
            try:
                barrier.wait()
                lk = sinks._acquire_writer_lock(
                    path, timeout=30.0, stale_after=5.0
                )
                with guard:
                    holders.append(threading.get_ident())
                time.sleep(0.05)
                lk.release()
            except Exception as e:  # pragma: no cover - failure reporting
                errs.append(e)

        ts = [threading.Thread(target=contender) for _ in range(4)]
        [t.start() for t in ts]
        [t.join(60) for t in ts]
        assert not errs
        assert len(holders) == 4  # everyone eventually acquired
        assert not os.path.exists(stale)
        # no stray .broken.* artifacts left behind
        assert not [n for n in os.listdir(path) if ".broken." in n]


class TestCompactionGuards:
    def test_compaction_detects_racing_writer(self, spark, tmp_path):
        """Rows appended after the compactor's listing snapshot must turn
        into a hard error with the parked original preserved — never a
        silent drop (ADVICE r4)."""
        path = str(tmp_path / "stats")
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        df.write.mode("append").parquet(path)
        snap = spark.read.parquet(path)  # listing snapshot taken here
        n0 = snap.count()

        real_count = sinks.compact_stats_table.__globals__  # noqa: F841
        # inject the race: append AFTER the snapshot read inside
        # compact_stats_table by monkeypatching spark.read to append
        # first on the second read... simpler: emulate the sequence
        # manually with the same primitives the function uses, then
        # call the function on a directory that mutates mid-flight via
        # a wrapper around DataFrameReader is overkill — instead drive
        # the function and race it with a writer thread.
        import threading

        stop = threading.Event()

        def late_writer():
            # keep appending small batches while compaction runs
            while not stop.is_set():
                spark.range(5).withColumn(
                    "v", F.col("id") * 2
                ).write.mode("append").parquet(path)
                time.sleep(0.01)

        t = threading.Thread(target=late_writer, daemon=True)
        t.start()
        try:
            try:
                sinks.compact_stats_table(spark, path, target_partitions=1)
                raced = False
            except RuntimeError as e:
                raced = True
                assert "preserved" in str(e)
                assert os.path.exists(path.rstrip("/") + "_precompact")
        finally:
            stop.set()
            t.join(30)
        if raced:
            # nothing lost: parked original holds at least the snapshot
            old = path.rstrip("/") + "_precompact"
            assert spark.read.parquet(old).count() >= n0
        else:  # writer never landed inside the window — loss-free anyway
            assert spark.read.parquet(path).count() >= n0
