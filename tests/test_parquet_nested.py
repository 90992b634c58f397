"""Parquet nested (LIST) columns: schema-walk level derivation,
Dremel record assembly grammar, round-trip vs pyarrow's own reader,
and corrupt-level-stream degrades (operators/parquetmeta.py)."""

from __future__ import annotations

import io

import pyarrow.parquet as pq

from gmall_flink_210726_spark.operators.parquetmeta import (
    _assemble_list_records,
    _make_parquet_nested,
    _schema_leaf_levels,
    read_parquet_nested,
)


class TestSchemaLevels:
    def test_list_shape_levels(self):
        """optional LIST { repeated list { optional leaf } } ->
        (max_def 3, max_rep 1) derived, never hardcoded."""
        blob = _make_parquet_nested(1)
        # parse the real footer through the module's own walk
        import struct

        from gmall_flink_210726_spark.operators.parquetmeta import (
            _Reader,
            _read_struct,
        )

        (flen,) = struct.unpack_from("<I", blob, len(blob) - 8)
        meta = _read_struct(
            _Reader(blob, len(blob) - 8 - flen, len(blob) - 8)
        )
        leaves = _schema_leaf_levels(meta[2])
        arr = next(p for p in leaves if p[0] == b"arr")
        tags = next(p for p in leaves if p[0] == b"tags")
        assert leaves[arr] == (3, 1, 2)  # def, rep, INT64
        assert leaves[tags] == (3, 1, 6)  # def, rep, BYTE_ARRAY
        assert len(arr) == 3  # 3-level LIST path

    def test_flat_required_and_optional(self):
        """Hand-built flattened schema: required flat leaf (0,0),
        optional flat leaf (1,0)."""
        schema = [
            {5: 2},  # root, two children
            {1: 2, 3: 0, 4: b"a", 5: 0},  # required int64 a
            {1: 6, 3: 1, 4: b"b", 5: 0},  # optional byte_array b
        ]
        leaves = _schema_leaf_levels(schema)
        assert leaves == {(b"a",): (0, 0, 2), (b"b",): (1, 0, 6)}

    def test_truncated_tree_rejected(self):
        assert _schema_leaf_levels([{5: 2}, {3: 0, 4: b"a", 5: 0}]) is None


class TestDremelAssembly:
    MD = 3  # the LIST shape's max definition level

    def test_all_four_def_meanings(self):
        # null list / empty list / [None, 7] / [8]
        reps = [0, 0, 0, 1, 0]
        defs = [0, 1, 2, 3, 3]
        recs = _assemble_list_records(reps, defs, [7, 8], self.MD)
        assert recs == [None, [], [None, 7], [8]]

    def test_rep_without_open_list_rejected(self):
        assert _assemble_list_records([1], [3], [5], self.MD) is None
        # rep-1 continuation of a null-list record is also invalid
        assert (
            _assemble_list_records([0, 1], [0, 3], [5], self.MD) is None
        )

    def test_marker_def_cannot_continue_record(self):
        # def 1 (empty-list marker) arriving with rep 1 is a grammar hole
        assert (
            _assemble_list_records([0, 1], [3, 1], [5], self.MD) is None
        )

    def test_leftover_or_missing_values_rejected(self):
        assert _assemble_list_records([0], [3], [], self.MD) is None
        assert _assemble_list_records([0], [2], [9], self.MD) is None


class TestNestedRoundTrip:
    def test_agrees_with_pyarrow_reader(self):
        """The hand Dremel assembly must reproduce pyarrow's own
        materialization of the same file, id by id."""
        for i in (1, 2, 3, 5, 11, 29, 77):
            blob = _make_parquet_nested(i)
            got = read_parquet_nested(blob)
            t = pq.read_table(io.BytesIO(blob))
            arr = t.column("arr").to_pylist()
            tags = t.column("tags").to_pylist()
            assert got["n_records"] == len(arr)
            assert got["arr_null_lists"] == sum(
                1 for x in arr if x is None
            )
            assert got["arr_empty_lists"] == sum(
                1 for x in arr if x == []
            )
            flat = [v for x in arr if x for v in x]
            assert got["arr_elems"] == sum(
                1 for v in flat if v is not None
            )
            assert got["arr_null_elems"] == sum(
                1 for v in flat if v is None
            )
            assert got["arr_sum"] == sum(
                v for v in flat if v is not None
            )
            tflat = [
                s for x in tags if x for s in x if s is not None
            ]
            assert got["tag_count"] == len(tflat)
            assert got["tag_len_sum"] == sum(len(s) for s in tflat)
            assert got["tag_null_lists"] == sum(
                1 for x in tags if x is None
            )

    def test_multi_row_group_records_align(self):
        """g=3 ids split records across row groups; per-group record
        counts must still equal each group's num_rows."""
        blob = _make_parquet_nested(29)  # 29 % 3 + 1 = 3 row groups
        md = pq.ParquetFile(io.BytesIO(blob)).metadata
        assert md.num_row_groups == 3
        got = read_parquet_nested(blob)
        assert got is not None and got["n_records"] == md.num_rows

    def test_smashed_rep_length_degrades(self):
        assert read_parquet_nested(_make_parquet_nested(13)) is None
        assert read_parquet_nested(_make_parquet_nested(0)) is None

    def test_truncated_file_degrades(self):
        blob = _make_parquet_nested(7)
        assert read_parquet_nested(blob[: len(blob) // 2]) is None
        assert read_parquet_nested(b"") is None

    def test_tampered_level_bytes_degrade_or_rebalance(self):
        """Flipping bytes inside the first data page must never
        crash: either a cross-check trips (None) or — only if the
        flip lands in dead padding — the books still balance."""
        blob = bytearray(_make_parquet_nested(7))
        base = read_parquet_nested(bytes(blob))
        assert base is not None
        off = (
            pq.ParquetFile(io.BytesIO(bytes(blob)))
            .metadata.row_group(0)
            .column(0)
            .data_page_offset
        )
        for delta in range(0, 24, 4):
            b2 = bytearray(blob)
            b2[off + delta] ^= 0x5A
            got = read_parquet_nested(bytes(b2))
            assert got is None or isinstance(got, dict)


class TestMapRead:
    def test_agrees_with_pyarrow_reader(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_map,
            read_parquet_map,
        )

        for i in (1, 2, 3, 5, 29):
            blob = _make_parquet_map(i)
            got = read_parquet_map(blob)
            t = pq.read_table(io.BytesIO(blob))
            maps = t.column("m").to_pylist()
            assert got["n_records"] == len(maps)
            assert got["n_null_maps"] == sum(
                1 for x in maps if x is None
            )
            assert got["n_empty_maps"] == sum(
                1 for x in maps if x == []
            )
            entries = [kv for x in maps if x for kv in x]
            assert got["n_entries"] == len(entries)
            assert got["key_len_sum"] == sum(len(k) for k, _ in entries)
            assert got["n_null_vals"] == sum(
                1 for _, v in entries if v is None
            )
            assert got["val_sum"] == sum(
                v for _, v in entries if v is not None
            )

    def test_smashed_value_chunk_degrades(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_map,
            read_parquet_map,
        )

        assert read_parquet_map(_make_parquet_map(0)) is None
        assert read_parquet_map(_make_parquet_map(14)) is None

    def test_required_leaf_assembly_branch(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _assemble_list_records,
        )

        # required leaf, max_def=2: def 0 null / 1 empty / 2 value
        recs = _assemble_list_records(
            [0, 0, 0, 1], [0, 1, 2, 2], [b"a", b"b"], 2,
            leaf_optional=False,
        )
        assert recs == [None, [], [b"a", b"b"]]
        # a null-element def (max_def-1) on a required leaf is EMPTY,
        # so it cannot continue an open record
        assert (
            _assemble_list_records(
                [0, 1], [2, 1], [b"a"], 2, leaf_optional=False
            )
            is None
        )


class TestDataPageV2:
    def test_v1_v2_agree(self):
        """Same content through both page formats must produce
        identical stats (including codec rotation)."""
        for i in (1, 2, 3, 4, 5, 29, 77):
            a = read_parquet_nested(_make_parquet_nested(i))
            b = read_parquet_nested(
                _make_parquet_nested(i, page_version="2.0")
            )
            assert a is not None and a == b, i

    def test_v2_smashed_levels_degrade(self):
        assert (
            read_parquet_nested(
                _make_parquet_nested(13, page_version="2.0")
            )
            is None
        )

    def test_v2_num_rows_books(self):
        """v2 pages carry num_rows; the walk pins rep==0 count to it
        (flip the header's num_rows -> degrade is not directly
        reachable from outside, so pin via the pyarrow metadata)."""
        import io

        blob = _make_parquet_nested(4, page_version="2.0")
        md = pq.ParquetFile(io.BytesIO(blob)).metadata
        got = read_parquet_nested(blob)
        assert got is not None and got["n_records"] == md.num_rows


class TestGeneralDremel:
    CHAIN2 = [("opt", 1), ("rep", 2), ("opt", 3), ("rep", 4), ("opt", 5)]

    def test_depth2_observed_pyarrow_streams(self):
        """The exact level streams pyarrow writes for
        [None, [], [[1,2],None,[]], [[None,3]]]."""
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _assemble_records_deep,
        )

        got = _assemble_records_deep(
            [0, 0, 0, 2, 1, 1, 0, 2],
            [0, 1, 5, 5, 2, 3, 4, 5],
            [1, 2, 3],
            self.CHAIN2,
        )
        assert got == [None, [], [[1, 2], None, []], [[None, 3]]]

    def test_depth1_agreement_fuzz(self):
        """The general assembler must agree with the depth-1 special
        case on random valid streams (list and map chains)."""
        import random

        from gmall_flink_210726_spark.operators.parquetmeta import (
            _assemble_records_deep,
        )

        rng = random.Random(7)
        chain1 = [("opt", 1), ("rep", 2), ("opt", 3)]
        for _ in range(2000):
            reps, defs, vals = [], [], []
            for _ in range(rng.randint(1, 6)):
                kind = rng.randint(0, 3)
                if kind == 0:
                    reps.append(0)
                    defs.append(0)
                elif kind == 1:
                    reps.append(0)
                    defs.append(1)
                else:
                    for j in range(rng.randint(1, 4)):
                        reps.append(0 if j == 0 else 1)
                        if rng.random() < 0.3:
                            defs.append(2)
                        else:
                            defs.append(3)
                            vals.append(rng.randint(0, 99))
            a = _assemble_list_records(reps, defs, list(vals), 3)
            b = _assemble_records_deep(reps, defs, list(vals), chain1)
            assert a == b

    def test_grammar_violations(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _assemble_records_deep,
        )

        # rep 2 continues the leaf list a def-5 first entry opened
        assert _assemble_records_deep(
            [0, 2], [5, 5], [1, 2], self.CHAIN2
        ) == [[[1, 2]]]
        # rep 2 with no record at all
        assert (
            _assemble_records_deep([2], [5], [1], self.CHAIN2) is None
        )
        # continuation below its own definition level
        assert (
            _assemble_records_deep([0, 1], [5, 1], [1], self.CHAIN2)
            is None
        )
        # leftover values
        assert (
            _assemble_records_deep([0], [0], [1], self.CHAIN2) is None
        )

    def test_deep_reader_agrees_with_pyarrow(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_deep,
            read_parquet_deep,
        )

        for i in (1, 2, 3, 4, 5, 29):
            blob = _make_parquet_deep(i)
            got = read_parquet_deep(blob)
            t = pq.read_table(io.BytesIO(blob))
            rows = t.column("arr2").to_pylist()
            assert got["n_records"] == len(rows)
            assert got["outer_null"] == sum(1 for x in rows if x is None)
            inner = [y for x in rows if x for y in x]
            assert got["inner_null"] == sum(1 for y in inner if y is None)
            flat = [v for y in inner if y for v in y]
            assert got["elem_sum"] == sum(
                v for v in flat if v is not None
            )

    def test_deep_degrade_stripes(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_deep,
            read_parquet_deep,
        )

        assert read_parquet_deep(_make_parquet_deep(0)) is None
        assert read_parquet_deep(_make_parquet_deep(16)) is None


class TestStructRead:
    def test_agrees_with_pyarrow(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_struct,
            read_parquet_struct,
        )

        for i in (1, 2, 3, 4, 5, 29):
            blob = _make_parquet_struct(i)
            got = read_parquet_struct(blob)
            t = pq.read_table(io.BytesIO(blob))
            rows = t.column("s").to_pylist()
            assert got["n_records"] == len(rows)
            assert got["n_null_structs"] == sum(
                1 for x in rows if x is None
            )
            present = [x for x in rows if x is not None]
            assert got["a_sum"] == sum(
                x["a"] for x in present if x["a"] is not None
            )
            assert got["b_len_sum"] == sum(
                len(x["b"]) for x in present if x["b"] is not None
            )

    def test_smashed_field_degrades(self):
        from gmall_flink_210726_spark.operators.parquetmeta import (
            _make_parquet_struct,
            read_parquet_struct,
        )

        assert read_parquet_struct(_make_parquet_struct(0)) is None
        assert read_parquet_struct(_make_parquet_struct(15)) is None
