"""The corpus-preparation CLI lands a coherent artifact set: partitioned
survivor parquet whose split assignment is the content-hash rule, a packing
manifest whose token totals reconcile with the survivors, and a JSON
receipt on stdout."""

from __future__ import annotations

import json


def test_corpus_cli_end_to_end(spark, tmp_path, capsys):
    from candyspark import corpus_cli

    out = tmp_path / "corpus_out"
    rc = corpus_cli.main(
        ["--sf-dir", "/root/testdata/sf0.001", "--output-dir", str(out)],
        stop_session=False,
    )
    assert rc == 0
    receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert receipt["metric"] == "corpus_prepared"

    docs = spark.read.parquet(str(out / "documents"))
    manifest = spark.read.parquet(str(out / "pack_manifest"))

    # split partitions exist and receipt counts reconcile with the files
    by_split = {r["split"]: r["n"] for r in docs.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split == {s: v["docs"] for s, v in receipt["splits"].items()}

    # manifest token totals == survivor token totals per (split, lang)
    from pyspark.sql import functions as F

    doc_tot = {
        (r["split"], r["lang"]): r["t"]
        for r in docs.groupBy("split", "lang")
        .agg(F.sum("n_tokens").cast("long").alias("t"))
        .collect()
    }
    man_tot = {
        (r["split"], r["lang"]): r["t"]
        for r in manifest.groupBy("split", "lang")
        .agg(F.sum("bin_tokens").cast("long").alias("t"))
        .collect()
    }
    assert doc_tot == man_tot

    # no bin exceeds the target by more than one document's worth (offset
    # packing: a doc may straddle its bin boundary, never two whole bins)
    for r in manifest.collect():
        assert r["n_docs"] >= 1


def test_corpus_cli_near_dedup_collapses_clusters(spark, tmp_path, capsys):
    """--near-dedup must drop exactly the non-canonical members of the
    MinHash-LSH duplicate clusters among the survivors, and the receipt
    must account for them."""
    import json

    from candyspark import corpus_cli

    out_plain = tmp_path / "plain"
    corpus_cli.main(
        ["--sf-dir", "/root/testdata/sf0.001", "--output-dir", str(out_plain)],
        stop_session=False,
    )
    plain = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out_near = tmp_path / "near"
    corpus_cli.main(
        [
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            str(out_near),
            "--near-dedup",
        ],
        stop_session=False,
    )
    near = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    n_plain = sum(v["docs"] for v in plain["splits"].values())
    n_near = sum(v["docs"] for v in near["splits"].values())
    assert plain["near_dup_dropped"] == 0
    assert near["near_dup_dropped"] >= 0
    assert n_plain - n_near == near["near_dup_dropped"]
    docs = spark.read.parquet(str(out_near / "documents"))
    assert docs.count() == n_near


def test_corpus_cli_gopher_rules_gate(spark, tmp_path, capsys):
    """--gopher-rules drops rule-failing docs before the clean/dedup stages
    and reports the drop count; the gated run's survivors are a subset of
    the ungated run's."""
    from candyspark import corpus_cli

    base_out, gated_out = tmp_path / "base", tmp_path / "gated"
    corpus_cli.main(
        ["--sf-dir", "/root/testdata/sf0.001", "--output-dir", str(base_out)],
        stop_session=False,
    )
    base_receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    corpus_cli.main(
        [
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            str(gated_out),
            "--gopher-rules",
        ],
        stop_session=False,
    )
    receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert receipt["gopher_dropped"] >= 0
    assert base_receipt["gopher_dropped"] == 0
    base_ids = {
        r["doc_id"] for r in spark.read.parquet(str(base_out / "documents")).collect()
    }
    gated_ids = {
        r["doc_id"] for r in spark.read.parquet(str(gated_out / "documents")).collect()
    }
    assert gated_ids <= base_ids
    assert len(base_ids) - len(gated_ids) <= receipt["gopher_dropped"]


def test_corpus_cli_source_cap_and_balance(spark, tmp_path, capsys):
    """--source-cap caps every source at N survivors; --balance-langs
    equalizes language counts at the minority size; the receipt's drop
    counts reconcile with the landed files."""
    import pyspark.sql.functions as F

    from candyspark import corpus_cli

    out = tmp_path / "capped"
    corpus_cli.main(
        [
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            str(out),
            "--source-cap",
            "3",
            "--balance-langs",
        ],
        stop_session=False,
    )
    receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs = spark.read.parquet(str(out / "documents"))
    per_source = docs.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per_source)
    per_lang = [r["count"] for r in docs.groupBy("lang").count().collect()]
    assert len(set(per_lang)) == 1  # balanced: every language at the min
    total = docs.count()
    landed_plus_drops = (
        total + receipt["source_capped"] + receipt["balance_dropped"]
    )
    assert receipt["source_capped"] >= 0
    assert receipt["balance_dropped"] >= 0
    # drops happened after dedup: survivors before caps = landed + drops
    base_out = tmp_path / "base"
    corpus_cli.main(
        ["--sf-dir", "/root/testdata/sf0.001", "--output-dir", str(base_out)],
        stop_session=False,
    )
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n_base = spark.read.parquet(str(base_out / "documents")).count()
    assert landed_plus_drops == n_base


def test_corpus_cli_strip_boilerplate(spark, tmp_path, capsys):
    """--strip-boilerplate removes exactly the audit-flagged (source,
    segment) pairs: none of the input-flagged segments survives in the
    output text, the receipt accounts for stripped segments, and token
    counts are recomputed from the rewritten text."""
    from pyspark.sql import functions as F

    from candyspark import corpus_cli

    out = tmp_path / "corpus_out_bp"
    rc = corpus_cli.main(
        [
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            str(out),
            "--strip-boilerplate",
        ],
        stop_session=False,
    )
    assert rc == 0
    receipt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "boiler_segments_stripped" in receipt
    docs = spark.read.parquet(str(out / "documents"))

    def segs_of(df):
        words = df.select(
            "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        return (
            words.withColumn("seg_idx", (F.col("pos") / 10).cast("long"))
            .groupBy("doc_id", "source", "seg_idx")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda x: x["word"],
                    ),
                    " ",
                ).alias("seg")
            )
        )

    # recompute the INPUT-side boilerplate set over the same survivor pool
    # the CLI saw (quality+exact-dedup only run) and assert absence
    out2 = tmp_path / "corpus_out_plain"
    corpus_cli.main(
        ["--sf-dir", "/root/testdata/sf0.001", "--output-dir", str(out2)],
        stop_session=False,
    )
    capsys.readouterr()
    base = spark.read.parquet(str(out2 / "documents"))
    base_segs = segs_of(base)
    src_docs = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs_src"))
    flagged = (
        base_segs.groupBy("source", "seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .join(src_docs, "source")
        .filter((F.col("df") * 5 >= F.col("n_docs_src")) & (F.col("df") >= 3))
        .select("source", "seg")
    )
    if flagged.count() > 0:
        leftover = segs_of(docs).join(flagged, ["source", "seg"], "inner")
        assert leftover.count() == 0
    # token counts are consistent with the rewritten text
    from candyspark.operators import text as X

    mism = docs.filter(
        F.col("n_tokens") != X.token_count("text").cast("bigint")
    ).count()
    assert mism == 0
