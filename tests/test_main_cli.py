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
