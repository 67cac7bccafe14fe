"""Merge-on-read delete files (X252): Iceberg v2 sequence semantics —
pos-delete <=, eq-delete strict <, re-insert survival, multi-file
aggregation, compaction identity, file round-trip."""

import pyspark.sql.functions as F


def _data(spark):
    # (image_id, data_seq, file_path, pos, price)
    rows = [
        ("a", 1, "f0", 0, 10.0),
        ("b", 1, "f0", 1, 11.0),
        ("c", 1, "f0", 2, 12.0),
        ("d", 2, "f1", 0, 13.0),
        ("b", 3, "f2", 0, 14.0),  # re-insert of b after the eq delete
        ("e", 3, "f2", 1, 15.0),
    ]
    return spark.createDataFrame(
        rows, "image_id string, data_seq long, file_path string, pos long, price double"
    )


def _pos(spark, rows):
    return spark.createDataFrame(rows, "file_path string, pos long, delete_seq long")


def _eq(spark, rows):
    return spark.createDataFrame(rows, "image_id string, delete_seq long")


def _live_ids(df):
    return sorted(
        (r.image_id, r.data_seq) for r in df.select("image_id", "data_seq").collect()
    )


def test_eq_delete_strict_and_reinsert_survives(spark):
    from corpusama_spark.operators.deletes import apply_mor_deletes

    data = _data(spark)
    # delete key b at seq 2: kills the seq-1 b, spares the seq-3 re-insert
    eq = _eq(spark, [("b", 2)])
    live = apply_mor_deletes(data, None, eq)
    assert _live_ids(live) == [
        ("a", 1), ("b", 3), ("c", 1), ("d", 2), ("e", 3),
    ]
    # eq delete at the SAME seq as the data row does NOT kill it (strict <)
    eq_same = _eq(spark, [("d", 2)])
    live2 = apply_mor_deletes(data, None, eq_same)
    assert ("d", 2) in _live_ids(live2)


def test_pos_delete_inclusive_seq(spark):
    from corpusama_spark.operators.deletes import apply_mor_deletes

    data = _data(spark)
    # pos delete at the SAME seq kills (<=): f1/0 was written at seq 2
    pos = _pos(spark, [("f1", 0, 2)])
    assert ("d", 2) not in _live_ids(apply_mor_deletes(data, pos, None))
    # pos delete with an OLDER seq than the data file is a no-op
    stale = _pos(spark, [("f2", 0, 2)])
    assert ("b", 3) in _live_ids(apply_mor_deletes(data, stale, None))


def test_multiple_delete_files_no_duplication(spark):
    from corpusama_spark.operators.deletes import apply_mor_deletes

    data = _data(spark)
    # same target in three delete files: max(seq) wins, rows never dup
    eq = _eq(spark, [("b", 1), ("b", 2), ("b", 4)])
    live = apply_mor_deletes(data, None, eq)
    assert live.count() == live.dropDuplicates(["image_id", "data_seq"]).count()
    # seq 4 kills both b rows
    assert [x for x in _live_ids(live) if x[0] == "b"] == []


def test_audit_counts_and_precedence(spark):
    from corpusama_spark.operators.deletes import mor_delete_audit

    data = _data(spark)
    pos = _pos(spark, [("f0", 1, 1)])   # hits b@seq1
    eq = _eq(spark, [("b", 2)])         # also hits b@seq1 -> counted as pos
    rep = {r.data_seq: r for r in mor_delete_audit(data, pos, eq).collect()}
    assert rep[1].n_input == 3
    assert rep[1].n_pos_del == 1 and rep[1].n_eq_del == 0
    assert rep[1].n_live == 2
    assert rep[3].n_live == 2 and rep[3].n_pos_del == 0


def test_compaction_identity_and_restamp(spark):
    from corpusama_spark.operators.deletes import (
        apply_mor_deletes,
        compact_mor,
    )

    data = _data(spark)
    pos = _pos(spark, [("f0", 2, 1)])
    eq = _eq(spark, [("b", 2)])
    mor_view = apply_mor_deletes(data, pos, eq)
    compacted = compact_mor(data, pos, eq, new_seq=4)
    # same payload rows (ignoring the restamped seq)
    a = sorted(r.image_id for r in mor_view.collect())
    b = sorted(r.image_id for r in compacted.collect())
    assert a == b
    assert compacted.select(F.min("data_seq"), F.max("data_seq")).first() == (4, 4)
    # applying the old deletes to the compacted table is a no-op: every
    # pos target file is gone logically (restamp) and eq seqs are <= 4
    again = apply_mor_deletes(
        compacted.withColumn("file_path", F.concat(F.lit("g"), "file_path")),
        pos,
        eq,
    )
    assert again.count() == compacted.count()


def test_file_round_trip(spark, tmp_path):
    from corpusama_spark.operators.deletes import (
        apply_mor_deletes,
        read_mor,
        write_delete_file,
        write_mor_data,
    )

    table = str(tmp_path / "tbl")
    data = _data(spark)
    pos = _pos(spark, [("f0", 0, 3)])
    eq = _eq(spark, [("c", 3)])
    write_mor_data(data, table)
    write_delete_file(pos, table, "pos")
    write_delete_file(eq, table, "eq")
    got = _live_ids(read_mor(spark, table))
    want = _live_ids(apply_mor_deletes(data, pos, eq))
    assert got == want == [("b", 1), ("b", 3), ("d", 2), ("e", 3)]
    # a second identical delete file (replay) changes nothing
    write_delete_file(eq, table, "eq")
    assert _live_ids(read_mor(spark, table)) == want
