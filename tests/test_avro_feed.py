"""Avro change-feed envelope tests.

The reference Avro-encodes every Kafka record against a pinned schema
(dt-common/src/meta/avro/avro_converter_schema.rs:5-121, bare binary
datums per message, avro_converter.rs:182).  These tests prove:

* the pure-python codec round-trips every value type of the map union;
* the bytes are REAL Avro — decoded and re-encoded by the Apache Avro
  Java library that ships in Spark's jars (avro-1.12.x), both directions,
  against the reference's exact schema JSON;
* the opt-in ``feed_format=avro`` directory feed parses to change rows
  identical to the default JSON feed (format independence).
"""

import json

from ape_dts_spark.functions.avro_codec import decode_record, encode_record
from ape_dts_spark.operators.change_feed import (
    avro_encode_records,
    change_feed_records,
    read_change_feed,
    write_change_feed,
)
from ape_dts_spark.sources.generator import gen_changes

# the reference's pinned schema, verbatim shape
# (avro_converter_schema.rs:5-121) — used to drive the JAVA decoder
REFERENCE_SCHEMA_JSON = json.dumps(
    {
        "type": "record",
        "name": "AvroData",
        "fields": [
            {"name": "schema", "type": "string", "default": ""},
            {"name": "tb", "type": "string", "default": ""},
            {"name": "operation", "type": "string", "default": ""},
            {
                "name": "fields",
                "default": None,
                "type": [
                    "null",
                    {
                        "type": "array",
                        "items": {
                            "name": "AvroFieldDef",
                            "type": "record",
                            "fields": [
                                {"name": "name", "type": "string"},
                                {
                                    "name": "column_type",
                                    "type": "string",
                                    "default": "string",
                                },
                                {
                                    "name": "avro_type",
                                    "type": "string",
                                    "default": "String",
                                },
                            ],
                        },
                    },
                ],
            },
            {
                "name": "before",
                "default": None,
                "type": [
                    "null",
                    {
                        "type": "map",
                        "values": [
                            "null",
                            "string",
                            "long",
                            "double",
                            "bytes",
                            "boolean",
                        ],
                    },
                ],
            },
            {
                "name": "after",
                "default": None,
                "type": [
                    "null",
                    {
                        "type": "map",
                        "values": [
                            "null",
                            "string",
                            "long",
                            "double",
                            "bytes",
                            "boolean",
                        ],
                    },
                ],
            },
            {
                "name": "extra",
                "default": None,
                "type": [
                    "null",
                    {
                        "type": "map",
                        "values": [
                            "null",
                            "string",
                            "long",
                            "double",
                            "bytes",
                            "boolean",
                        ],
                    },
                ],
            },
        ],
    }
)


def test_codec_roundtrip_all_value_types():
    rec = dict(
        schema="web",
        tb="pages",
        operation="update",
        before={"url": "u1", "n": 7, "score": 1.5, "ok": True, "gone": None,
                "blob": b"\x00\xffhi"},
        after={"url": "u1", "n": -12345678901234, "score": -0.25, "ok": False},
        extra={"position": 42, "origin": "node_a"},
        fields=[("url", "varchar(255)", "String"), ("n", "bigint", "Long")],
    )
    buf = encode_record(**rec)
    back = decode_record(buf)
    assert back == rec


def test_codec_nulls_and_empty():
    buf = encode_record("", "", "delete", before=None, after=None, extra=None)
    back = decode_record(buf)
    assert back["before"] is None and back["after"] is None
    assert back["extra"] is None and back["fields"] is None
    # empty (non-null) map survives distinctly from null
    buf2 = encode_record("s", "t", "insert", after={})
    assert decode_record(buf2)["after"] == {}


def _java_decode(spark, buf: bytes):
    """Decode a bare Avro datum with the Apache Avro JAVA library that
    ships in Spark's jars, against the reference's schema."""
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(REFERENCE_SCHEMA_JSON)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    dec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(buf, None)
    return reader.read(None, dec), schema


def _jmap_to_py(jmap):
    out = {}
    for k in jmap.keySet().toArray():
        v = jmap.get(k)
        # py4j auto-converts java primitives; only Utf8/ByteBuffer arrive
        # as JavaObjects
        if v is not None and not isinstance(v, (str, int, float, bool, bytes)):
            if v.getClass().getName() == "org.apache.avro.util.Utf8":
                v = str(v)
            elif "ByteBuffer" in v.getClass().getName():
                b = bytearray(v.remaining())
                v.get(b)
                v = bytes(b)
        out[str(k)] = v
    return out


def test_bytes_are_real_avro_java_bidirectional(spark):
    """Encode with the python codec -> decode with Java Avro; re-encode the
    Java record with Java Avro -> decode with the python codec.  Both
    directions preserve every field, proving a consumer built on the real
    Avro library (as the reference's consumers are) reads this feed."""
    original = dict(
        schema="web",
        tb="pages",
        operation="update",
        before=None,
        after={"lang": "en", "n": 7, "ok": True, "score": 0.5, "url": "u1"},
        extra={"origin": "node_a", "position": 99},
        fields=[("url", "varchar(255)", "String")],
    )
    buf = encode_record(**original)

    jrec, schema = _java_decode(spark, buf)
    assert str(jrec.get("schema")) == "web"
    assert str(jrec.get("tb")) == "pages"
    assert str(jrec.get("operation")) == "update"
    assert jrec.get("before") is None
    after = _jmap_to_py(jrec.get("after"))
    assert after == original["after"]
    extra = _jmap_to_py(jrec.get("extra"))
    assert extra == original["extra"]
    fdefs = jrec.get("fields")
    assert fdefs.size() == 1
    f0 = fdefs.get(0)
    assert str(f0.get("name")) == "url"
    assert str(f0.get("column_type")) == "varchar(255)"
    assert str(f0.get("avro_type")) == "String"

    # java re-encode -> python decode
    jvm = spark._jvm
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    bos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, None)
    writer.write(jrec, enc)
    enc.flush()
    java_bytes = bytes(bos.toByteArray())
    back = decode_record(java_bytes)
    assert back["schema"] == "web" and back["tb"] == "pages"
    assert back["operation"] == "update" and back["before"] is None
    assert back["after"] == original["after"]
    assert back["extra"] == original["extra"]
    assert back["fields"] == original["fields"]


def test_avro_feed_matches_json_feed_end_to_end(spark, tmp_path):
    """The opt-in Avro directory feed parses to EXACTLY the change rows the
    JSON feed parses to — the wire format is swappable, the envelope
    contract is one."""
    ch = gen_changes(spark, 200, 50, seed=11).select("lsn", "url", "op", "lang")
    rec = change_feed_records(
        ch, key_col="url", payload_cols=["url", "lang"], origin="node_a"
    )
    json_feed = str(tmp_path / "feed_json")
    avro_feed = str(tmp_path / "feed_avro")
    write_change_feed(rec, json_feed)
    write_change_feed(avro_encode_records(rec), avro_feed)

    # avro feed's value column is binary parquet, not text
    raw = spark.read.parquet(avro_feed)
    assert dict(raw.dtypes)["value"] == "binary"

    a = read_change_feed(spark, json_feed, "url string, lang string")
    b = read_change_feed(
        spark, avro_feed, "url string, lang string", feed_format="avro"
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 200
    # and a JAVA Avro consumer reads a frame of the same feed
    frame = raw.limit(1).collect()[0]
    jrec, _ = _java_decode(spark, bytes(frame["value"]))
    assert str(jrec.get("tb")) == "pages"
    assert _jmap_to_py(jrec.get("extra"))["origin"] == "node_a"


def test_engine_emits_avro_feed_via_ini(spark, tmp_path):
    """feed_format=avro in task_config.ini makes the ENGINE's outbound feed
    the reference's Avro envelope; the feed replays into change rows and a
    Java Avro consumer decodes the raw frames."""
    from ape_dts_spark.config import load_task_config
    from ape_dts_spark.lake.table import LakeTable
    from ape_dts_spark.sources.generator import PAGES_COLS, gen_pages_seed
    from ape_dts_spark.streaming.driver import CdcEngine

    ch = str(tmp_path / "changes")
    gen_changes(spark, 120, 40, seed=7).write.parquet(ch)
    pp = str(tmp_path / "pages")
    t = LakeTable.create(pp, PAGES_COLS, bucket_key="url", bucket_count=4)
    t.append(gen_pages_seed(spark, 40, seed=7))
    feed = str(tmp_path / "feed")
    cfg = load_task_config(
        f"""
[extractor]
changes_path={ch}
[sinker]
pages_path={pp}
feed_path={feed}
feed_format=avro
node_id=node_a
[pipeline]
job_id=avro_ini
""",
        is_text=True,
    )
    assert cfg.feed_format == "avro" and cfg.feed_path == feed
    assert cfg.node_id == "node_a" and not cfg.feed_before_images
    cfg.extract_text = False
    CdcEngine(spark, cfg).run()

    raw = spark.read.parquet(feed)
    assert dict(raw.dtypes)["value"] == "binary"
    # the engine feeds the APPLIED batch (post-LWW-dedup), one frame per
    # applied change; every frame parses back into a change row
    back = read_change_feed(
        spark, feed, "url string, lang string", feed_format="avro"
    )
    assert back.count() == raw.count() > 0
    jrec, _ = _java_decode(spark, bytes(raw.limit(1).collect()[0]["value"]))
    assert str(jrec.get("operation")) in ("insert", "update", "delete")
    # generator rows carry origin=node1; the feed preserves relayed
    # provenance rather than restamping (loop-prevention contract)
    assert _jmap_to_py(jrec.get("extra"))["origin"] == "node1"


def test_codec_guards_fail_loudly():
    """Producer-side guards: out-of-int64 longs and nested payload values
    raise instead of silently corrupting the wire; corrupt union branches
    raise instead of parsing garbage."""
    import pytest

    from ape_dts_spark.functions.avro_codec import (
        decode_record,
        encode_long,
        encode_record,
    )

    with pytest.raises(ValueError, match="int64 range"):
        encode_long(1 << 63, bytearray())
    with pytest.raises(ValueError, match="nested"):
        encode_record("db", "tb", "insert", after={"tags": ["a", "b"]})
    with pytest.raises(ValueError, match="nested"):
        encode_record("db", "tb", "insert", after={"meta": {"k": 1}})
    # corrupt frame: a fields-union branch byte outside {0,1}
    good = encode_record("db", "tb", "insert", after={"x": 1})
    # schema/tb/operation are 3 length-prefixed strings; the next byte is
    # the fields union branch — corrupt it to 2 (zig-zag encoded = 4)
    pos = 0
    for _ in range(3):
        ln = good[pos] >> 1  # short strings: 1-byte zig-zag length
        pos += 1 + ln
    bad = bytearray(good)
    bad[pos] = 4
    with pytest.raises(ValueError, match="branch"):
        decode_record(bytes(bad))
