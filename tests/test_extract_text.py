"""Byte-identity contract of the vectorized HTML->text extractor."""

import pandas as pd

from ape_dts_spark.functions.extract_text import extract_text, extract_text_series

HTML = (
    b"<html><!-- id:123 --><head><title>alpha beta</title>"
    b"<style>body{color:#333}</style></head>"
    b'<body><script type="text/javascript">var q="x";</script>'
    b"<h1>spark &amp; data</h1>"
    b"<p>one  two\tthree &nbsp;four</p>"
    b"<div><p>five <b>six</b> seven</p></div>"
    b"</body></html>"
)


def test_extraction_semantics():
    assert extract_text(HTML) == "alpha beta\nspark & data\none two three four\nfive six seven"


def test_entities_and_edge_cases():
    assert extract_text(b"<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;</p>") == 'a <b> "c" \'d\''
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text("plain text no tags") == "plain text no tags"
    # nested/awkward markup
    assert extract_text(b"<P CLASS='x'>A</P><BR/>B") == "A\nB"


def test_byte_identity_and_vectorization():
    s = pd.Series([HTML, None, b"<p>x</p>", HTML.decode()])
    out1 = extract_text_series(s)
    out2 = extract_text_series(s)
    assert list(out1) == list(out2)
    assert out1[0].encode() == out2[0].encode()
    assert out1[1] == ""
    # batch result equals scalar result element-wise (vectorization is pure)
    for v, o in zip(s, out1):
        assert extract_text(v) == o


def test_udf_matches_oracle(spark):
    from pyspark.sql import functions as F

    from ape_dts_spark.functions.extract_text import extract_text_udf

    df = spark.createDataFrame([(1, HTML), (2, None), (3, b"<p>x &amp; y</p>")], "id long, html binary")
    got = {r["id"]: r["t"] for r in df.select("id", extract_text_udf(F.col("html")).alias("t")).collect()}
    assert got[1] == extract_text(HTML)
    assert got[2] == ""
    assert got[3] == "x & y"
