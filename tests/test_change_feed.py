"""Change-feed sink (KafkaSinker analog) + to_sql renderer tests."""

import json

from pyspark.sql import functions as F

from ape_dts_spark.operators.change_feed import (
    change_feed_records,
    render_sql,
    write_change_feed,
)
from ape_dts_spark.sources.generator import gen_changes


def test_change_feed_records_shape_and_key(spark):
    ch = gen_changes(spark, 200, 50, seed=3).select("lsn", "url", "op", "lang")
    rec = change_feed_records(ch, key_col="url", payload_cols=["url", "lang"])
    rows = rec.orderBy("lsn").collect()
    assert len(rows) == 200
    r0 = rows[0]
    assert r0["topic"] == "web.pages"
    v = json.loads(r0["value"])
    assert v["schema"] == "web" and v["tb"] == "pages"
    assert v["operation"] in ("insert", "update", "delete")
    assert v["position"] == r0["lsn"]
    # delete events carry no after-image; upserts do (kafka_sinker.rs schema)
    for r in rows:
        v = json.loads(r["value"])
        if v["operation"] == "delete":
            assert "after" not in v or v["after"] is None
        else:
            after = json.loads(v["after"])
            assert after["url"] == r["key"]


def test_write_change_feed_roundtrip(spark, tmp_path):
    ch = gen_changes(spark, 100, 30, seed=4).select("lsn", "url", "op", "lang")
    rec = change_feed_records(ch, key_col="url", payload_cols=["url", "lang"])
    write_change_feed(rec, str(tmp_path / "feed"))
    back = spark.read.parquet(str(tmp_path / "feed"))
    assert back.count() == 100
    assert set(back.select("topic").distinct().toPandas()["topic"]) == {"web.pages"}
    # at-least-once replay: appending again then deduping on (key,lsn) converges
    write_change_feed(rec, str(tmp_path / "feed"))
    again = spark.read.parquet(str(tmp_path / "feed"))
    assert again.count() == 200
    assert again.dropDuplicates(["key", "lsn"]).count() == 100


def test_render_sql_replace_delete_and_quoting(spark):
    ch = spark.createDataFrame(
        [
            (1, "u'1", "insert", "x"),
            (2, "u2", "delete", "y"),
            (3, "u3", "update", "it's"),
        ],
        "lsn long, url string, op string, lang string",
    )
    out = {r["lsn"]: r["sql"] for r in render_sql(ch, payload_cols=["url", "lang"]).collect()}
    assert out[1] == "REPLACE INTO `pages` (`url`, `lang`) VALUES ('u''1', 'x');"
    assert out[2] == "DELETE FROM `pages` WHERE `url` = 'u2' LIMIT 1;"
    assert out[3] == "REPLACE INTO `pages` (`url`, `lang`) VALUES ('u3', 'it''s');"
