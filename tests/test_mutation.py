"""Unit tests for the mutation operators (operators/mutation.py) on
hand-built frames — the edge cases the relational oracle can't isolate:
NULL source values must WIN a merge (not be coalesced away), unchanged
keys must vanish from a diff, and SCD2 must collapse re-asserted values."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from candyspark.operators.mutation import merge_upsert, scd2_history, snapshot_diff

COLS = "k v w".split()


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v, w=w) for k, v, w in rows], COLS)


def test_merge_source_null_wins(spark):
    """A matched source row with v=NULL must null the target value — the
    per-column coalesce rewrite would silently keep the stale target."""
    target = _df(spark, [(1, "old", 10), (2, "keep", 20)])
    source = _df(spark, [(1, None, 11), (3, "new", 30)])
    got = {r["k"]: (r["v"], r["w"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: (None, 11), 2: ("keep", 20), 3: ("new", 30)}


def test_merge_rejects_schema_mismatch(spark):
    target = _df(spark, [(1, "a", 1)])
    import pytest

    with pytest.raises(ValueError):
        merge_upsert(target, target.drop("w"), ["k"])


def test_snapshot_diff_classifies_and_filters(spark):
    old = _df(spark, [(1, "same", 1), (2, "was", 2), (3, "gone", 3)])
    new = _df(spark, [(1, "same", 1), (2, "now", 2), (4, "born", 4)])
    rows = snapshot_diff(old, new, ["k"], ["v", "w"]).collect()
    got = {r["k"]: (r["change_type"], r["v"]) for r in rows}
    assert got == {2: ("update", "now"), 3: ("delete", "gone"), 4: ("insert", "born")}
    assert 1 not in got  # unchanged keys are dropped


def test_snapshot_diff_null_transitions_are_updates(spark):
    """NULL→value and value→NULL are real updates (eqNullSafe compare)."""
    old = _df(spark, [(1, None, 1), (2, "x", 2)])
    new = _df(spark, [(1, "set", 1), (2, None, 2)])
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "update", 2: "update"}


def _log(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=dt.datetime(2024, 1, d), v=v) for k, d, v in rows],
        "k int, ts timestamp, v string",
    )


def test_scd2_collapses_reasserted_values(spark):
    log = _log(spark, [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 5, "a")])
    rows = scd2_history(log, ["k"], "ts", ["v"]).orderBy("valid_from").collect()
    assert [(r["v"], r["valid_from"].day, r["valid_to"].day if r["valid_to"] else None)
            for r in rows] == [("a", 1, 3), ("b", 3, 5), ("a", 5, None)]


def test_scd2_intervals_chain_per_key(spark):
    log = _log(spark, [(1, 1, "a"), (2, 2, "x"), (1, 4, "b")])
    rows = scd2_history(log, ["k"], "ts", ["v"]).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 2 and len(by_key[2]) == 1
    assert by_key[2][0]["valid_to"] is None  # open interval for the single entry


def test_foreach_batch_incremental_upsert(spark, tmp_path):
    """The production maintenance loop: a stream of change batches applied
    to a stored table via merge_upsert inside foreachBatch (stage-then-swap
    so the target is never read and overwritten in one job). Later batches
    must win on key collision; the final table equals a batch merge of all
    updates in order."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    schema = "k int, v string, w int"
    target_dir = str(tmp_path / "target")
    spark.createDataFrame(
        [(1, "base1", 10), (2, "base2", 20)], schema
    ).write.parquet(target_dir)

    batch1 = [(1, "b1", 11), (3, "new3", 30)]
    batch2 = [(1, "b2", 12), (4, "new4", 40)]  # re-updates key 1: must win
    src = tmp_path / "updates"
    src.mkdir()
    for i, rows in enumerate([batch1, batch2]):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        (part,) = _glob.glob(_os.path.join(stage, "part-*.parquet"))
        dest = str(src / f"b{i}.parquet")
        _os.rename(part, dest)
        _os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    def upsert_batch(batch_df, batch_id):
        tgt = batch_df.sparkSession.read.parquet(target_dir)
        merged = merge_upsert(tgt, batch_df, ["k"])
        staged = str(tmp_path / f"swap_{batch_id}")
        merged.write.mode("overwrite").parquet(staged)
        _shutil.rmtree(target_dir)
        _shutil.move(staged, target_dir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {r["k"]: (r["v"], r["w"]) for r in spark.read.parquet(target_dir).collect()}
    assert got == {
        1: ("b2", 12),   # batch2 overwrote batch1's update
        2: ("base2", 20),
        3: ("new3", 30),
        4: ("new4", 40),
    }
