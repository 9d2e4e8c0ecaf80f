"""The `python -m ape_dts_spark task_config.ini` entrypoint (reference:
`ape-dts task_config.ini`, dt-main dispatch): ini-driven snapshot seed +
CDC tail against the generated workdir, reusing the test SparkSession."""

import json

from ape_dts_spark.__main__ import main
from ape_dts_spark.lake.table import LakeTable
from ape_dts_spark.sources.generator import gen_changes, gen_pages_seed


def test_main_snapshot_and_cdc(spark, tmp_path, capsys):
    seed_path = str(tmp_path / "seed")
    changes_path = str(tmp_path / "changes")
    pages_path = str(tmp_path / "pages")
    gen_pages_seed(spark, 300, seed=42).write.parquet(seed_path)
    gen_changes(spark, 500, 300, seed=42).write.parquet(changes_path)

    ini = tmp_path / "task_config.ini"
    ini.write_text(
        f"""
[extractor]
extract_type=snapshot_and_cdc
snapshot_path={seed_path}
snapshot_chunks=4
changes_path={changes_path}
batch_lsn_width=200

[sinker]
pages_path={pages_path}
bucket_count=4

[pipeline]
job_id=cli_e2e
"""
    )
    rc = main([str(ini)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["task"] == "snapshot_and_cdc"
    assert out["snapshot"]["chunks_total"] == 4
    assert out["cdc"]["events"] == 500
    assert out["cdc"]["hwm"] == 500

    # rerun: snapshot skipped (complete), cdc replays nothing new
    rc = main([str(ini)])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["snapshot"] == {"skipped": "already complete"}
    assert out2["cdc"]["events"] == 0

    # final state sanity: table holds seed + net inserts - deletes
    t = LakeTable.load(pages_path)
    assert t.read(spark).count() > 0


def test_main_struct_check_revise_review_flow(spark, tmp_path, capsys):
    """The reference's task-type matrix beyond replication: struct migration
    creates the target with the source's schema, check flags drift, revise
    re-applies flagged keys from the source, review confirms the fix."""
    from pyspark.sql import functions as F

    src_path = str(tmp_path / "src")
    pages_path = str(tmp_path / "pages")
    gen_pages_seed(spark, 200, seed=9).write.parquet(src_path)

    ini = tmp_path / "task.ini"
    ini.write_text(
        f"""
[extractor]
extract_type=struct
snapshot_path={src_path}
compare_cols=warc_ts,html,lang

[sinker]
pages_path={pages_path}
bucket_count=4

[pipeline]
job_id=cli_matrix
"""
    )

    def run(task):
        assert main([str(ini), "--task", task]) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("struct")
    assert out["struct"]["created"] and "CREATE TABLE" in out["struct"]["ddl"]
    t = LakeTable.load(pages_path)
    assert set(t.schema.names()) == {"url", "warc_ts", "html", "text", "lang", "last_lsn"}

    # seed the target with a deterministic DRIFT: ids 0-9 missing, 10-19 modified
    src = spark.read.parquet(src_path)
    drifted = src.filter(~F.col("url").rlike("p000000000[0-9]$")).withColumn(
        "lang",
        F.when(F.col("url").rlike("p000000001[0-9]$"), F.lit("xx")).otherwise(F.col("lang")),
    )
    t.append(drifted)

    out = run("check")
    counts = out["check"]["counts"]
    assert counts.get("miss", 0) == 10 and counts.get("diff", 0) == 10
    # the written log records problems only (match rows stay out of it)
    log = spark.read.parquet(out["check"]["log_path"])
    assert log.filter(F.col("check_result") == "match").count() == 0
    assert log.count() == 20

    out = run("revise")
    assert out["revise"]["revised_keys"] == counts["miss"] + counts["diff"]

    out = run("review")
    rc = out["review"]["counts"]
    assert set(rc) == {"match"} and rc["match"] == counts["miss"] + counts["diff"]
