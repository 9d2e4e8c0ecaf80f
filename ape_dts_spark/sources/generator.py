"""Deterministic synthetic web-page snapshot + LSN-ordered change stream.

The engine's test/bench input per the target spec: Common-Crawl-style pages
`(url, warc_ts, html, text, lang)` and a binlog/WAL-style change stream
`(lsn, op, url, before_url, payload..., tx_id, origin)` mirroring the
reference's RowData model (reference dt-common/src/meta/row_data.rs:19-26,
row_type.rs:5-12) and its test fixtures' key-topology stressors
(dt-tests/tests/mysql_to_mysql/cdc/basic_test, uk_changed_test).

Everything is generated **JVM-side** from `spark.range` + hash arithmetic —
no Python in the loop, no driver-side materialization — so generation is
O(parallelism)-scalable and bit-deterministic for a given seed regardless of
partitioning (every value is a pure function of (id, seed)).

Workload shape (per FIXTURES.md):
* ~40% insert / ~40% update / ~20% delete;
* Zipf-ish hot-domain skew (power-law domain ids) so merge-side skew is real;
* per-url event bursts (a small hot-url set absorbs ~5% of events);
* occasional key-changing updates (before_url != url) — the reference's
  uk_changed hazard, handled as delete+insert;
* an always-present `fetch_status` column that only becomes meaningful once
  the add_column DDL fires (pre-DDL events must not apply it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = 1_700_000_000  # fixed base so timestamps are deterministic

# Key-change moved-to url_id namespace: KC_ID_BASE + lsn.  Disjoint from the
# seed range and from insert mints (n_seed_urls + lsn) for every tail of a
# multi-segment run, as long as n_seed_urls + max(lsn) < 2^40 (~1.1e12
# events — far past any fixture or bench here).
KC_ID_BASE = 1 << 40
N_DOMAINS = 1000
LANGS = ["en", "de", "fr", "zh", "es", "pt", "ja", "ru"]
VOCAB = (
    "data spark stream merge window batch shuffle join filter scan lake delta "
    "page crawl index token vector query engine commit snapshot schema binlog "
    "replica offset bucket salt skew hash column row"
).split()

PAGES_COLS = [
    ("url", "string", False),
    ("warc_ts", "timestamp", True),
    ("html", "binary", True),
    ("text", "string", True),
    ("lang", "string", True),
    ("last_lsn", "long", True),
]

CHANGES_COLS = [
    "lsn",
    "op",
    "url",
    "before_url",
    "warc_ts",
    "html",
    "lang",
    "fetch_status",
    "tx_id",
    "origin",
]


def _h(col, seed: int, salt: int):
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def _uniform(col, seed: int, salt: int):
    return (F.pmod(_h(col, seed, salt), F.lit(1_000_000)) + 0.5) / 1_000_000.0


def _word(hcol, k: int):
    idx = (F.pmod(F.floor(hcol / F.lit(k)), F.lit(len(VOCAB))) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(w) for w in VOCAB]), idx)


def _domain_id(url_id, seed: int):
    # power-law: u^3 concentrates mass near domain 0 => hot-domain skew
    u = _uniform(url_id, seed, 101)
    return F.floor(F.lit(N_DOMAINS) * F.pow(u, F.lit(3.0))).cast("long")


def _url(url_id, seed: int):
    return F.format_string("https://d%04d.example.com/p%010d", _domain_id(url_id, seed), url_id)


def _lang(url_id, seed: int):
    idx = (F.pmod(_h(_domain_id(url_id, seed), seed, 103), F.lit(len(LANGS))) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(x) for x in LANGS]), idx)


def _html(hcol):
    """Deterministic template HTML with comment/script/style/entity traps so
    text extraction is non-trivial.  Sized per FIXTURES.md (≈0.5–16 KB): a
    40-word seed sentence is rotated into 3–12 paragraphs (a ~5% long tail
    gets 4x paragraphs), all pure JVM expressions."""
    w = [_word(hcol, 7**i) for i in range(8)]
    sent = F.concat_ws(" ", *[_word(hcol, 5**(i % 13) + 11 * i) for i in range(40)])
    sent_len = F.length(sent)
    n_paras = (
        F.lit(3)
        + F.pmod(hcol, F.lit(10))
        + F.when(F.pmod(hcol, F.lit(19)) == 0, F.lit(30)).otherwise(F.lit(0))
    ).cast("int")
    paras = F.transform(
        F.sequence(F.lit(1), n_paras),
        lambda i: F.concat(
            F.lit("<p>"),
            sent.substr((F.pmod(i * 37, sent_len) + 1).cast("int"), sent_len),
            F.lit(" "),
            sent.substr(F.lit(1), (F.pmod(i * 37, sent_len) + 1).cast("int")),
            F.lit("</p>"),
        ),
    )
    return F.encode(
        F.format_string(
            "<html><!-- id:%s --><head><title>%s %s</title>"
            "<style>body{color:#333}</style></head>"
            '<body><script type="text/javascript">var q="%s";</script>'
            "<h1>%s &amp; %s</h1>"
            "<p>%s %s %s &nbsp;%s</p>"
            "%s"
            "<div><p>%s %s <b>%s</b> %s</p></div>"
            "</body></html>",
            F.abs(hcol).cast("string"),
            w[0], w[1], w[2], w[0], w[3], w[4], w[5], w[6], w[7],
            F.array_join(paras, ""),
            w[1], w[2], w[3], w[4],
        ),
        "UTF-8",
    )


def gen_pages_seed(spark: SparkSession, n_urls: int, seed: int = 42) -> DataFrame:
    """Snapshot seed: url_ids [0, n_urls), last_lsn=0, text extracted lazily by caller."""
    df = spark.range(n_urls).withColumnRenamed("id", "url_id")
    h = _h(F.col("url_id"), seed, 1)
    return df.select(
        _url(F.col("url_id"), seed).alias("url"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("url_id")).alias("warc_ts"),
        _html(h).alias("html"),
        F.lit(None).cast("string").alias("text"),
        _lang(F.col("url_id"), seed).alias("lang"),
        F.lit(0).cast("long").alias("last_lsn"),
    )


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_seed_urls: int,
    seed: int = 42,
    start_lsn: int = 1,
    tx_size: int = 50,
    full_before_images: bool = False,
) -> DataFrame:
    """LSN-ordered change stream over the url keyspace.

    lsn is strictly increasing and unique (= start_lsn + id).  Inserts mint
    fresh url_ids above the seed range; update/delete target the existing
    range (an update of a never-inserted url upserts, matching the
    reference's REPLACE semantics).

    full_before_images=True additionally carries the reference RowData's
    full before image per event (row_data.rs:19-26: the binlog hands the
    extractor the prior row values): `before_exists` (the row was present
    before this event) plus `before_warc_ts/html/lang/fetch_status` — the
    EXACT prior payload, from the seed row or the latest earlier event on
    the same key (the key-change read chain included).  Computed with one
    window over the key effect chain — generator-side cost only.
    """
    df = spark.range(n_events).select((F.col("id") + F.lit(start_lsn)).alias("lsn"))
    h = _h(F.col("lsn"), seed, 11)
    r = F.pmod(h, F.lit(10))
    op = (
        F.when(r < 4, F.lit("insert")).when(r < 8, F.lit("update")).otherwise(F.lit("delete"))
    )
    # target id: inserts mint new ids; update/delete hit the live range.
    live_span = F.lit(n_seed_urls) + F.floor(F.col("lsn") * F.lit(0.4))
    existing_id = F.pmod(_h(F.col("lsn"), seed, 13), live_span)
    minted_id = F.lit(n_seed_urls) + F.col("lsn")
    burst = F.pmod(_h(F.col("lsn"), seed, 17), F.lit(100)) < 5  # ~5% burst traffic
    url_id = (
        F.when(burst, F.pmod(_h(F.col("lsn"), seed, 19), F.lit(8)))  # tiny hot-url set
        .when(op == F.lit("insert"), minted_id)
        .otherwise(existing_id)
    ).cast("long")
    # key-changing update (reference uk_changed_test): before.url != after.url.
    # The moved-to key is freshly minted (disjoint from insert mints and the
    # live range) — a real unique-key change cannot land ON an existing row
    # (the DB would reject it), and an artificial collision is unrecoverable
    # by ANY reverse stream (the event carries the read row's before image,
    # not the clobbered target's).  before_url = the existing row being moved.
    # The moved-to id lives in its OWN namespace (KC_ID_BASE + lsn): lsn is
    # globally unique across start_lsn continuation tails, and insert mints
    # (n_seed_urls + lsn) stay below 2^40 for any realistic run — an offset
    # of n_seed+n_events would only be disjoint WITHIN one gen_changes call
    # (a later tail's inserts mint ids exactly over an earlier tail's kc
    # targets, recreating the collision this scheme exists to prevent).
    key_change = (op == F.lit("update")) & (F.pmod(_h(F.col("lsn"), seed, 23), F.lit(211)) == 0)
    kc_target_id = (F.lit(KC_ID_BASE) + F.col("lsn")).cast("long")
    before_url = F.when(key_change, _url(url_id, seed)).otherwise(F.lit(None).cast("string"))
    url_id = F.when(key_change, kc_target_id).otherwise(url_id)

    hp = _h(F.col("lsn"), seed, 29)
    out = df.select(
        F.col("lsn"),
        op.alias("op"),
        _url(url_id, seed).alias("url"),
        before_url.alias("before_url"),
        F.timestamp_seconds(F.lit(EPOCH) + F.lit(100_000) + F.col("lsn")).alias("warc_ts"),
        F.when(op == "delete", F.lit(None).cast("binary")).otherwise(_html(hp)).alias("html"),
        F.when(op == "delete", F.lit(None).cast("string"))
        .otherwise(_lang(url_id, seed))
        .alias("lang"),
        F.when(op == "delete", F.lit(None).cast("int"))
        .otherwise(F.pmod(hp, F.lit(600)).cast("int"))
        .alias("fetch_status"),
        F.floor(F.col("lsn") / F.lit(tx_size)).alias("tx_id"),
        F.lit("node1").alias("origin"),
    )
    if not full_before_images:
        return out
    return _attach_full_before_images(spark, out, n_seed_urls, seed)


_BEFORE_PAYLOAD = ["warc_ts", "html", "lang", "fetch_status"]
_BEFORE_STRUCT = "struct<warc_ts:timestamp,html:binary,lang:string,fetch_status:int>"


def _attach_full_before_images(
    spark: SparkSession, changes: DataFrame, n_seed_urls: int, seed: int
) -> DataFrame:
    """Exact before images by replaying the key effect chain with a window.

    Every event produces effects on keys: its url is SET to the after image
    (NULL for deletes), and — for key-changing updates — its before_url is
    CLEARED.  Union the seed rows (lsn 0) with those effects, lag() the
    state per key in lsn order, and join each event back to the effect row
    of its READ key (before_url if set, else url): the lagged state IS the
    event's before image; a NULL struct means the row did not exist
    (before_exists = false — the REPLACE-upsert-on-missing case)."""
    from pyspark.sql import Window

    st = F.when(F.col("op") == "delete", F.lit(None).cast(_BEFORE_STRUCT)).otherwise(
        F.struct(*[F.col(c) for c in _BEFORE_PAYLOAD])
    )
    set_eff = changes.select(F.col("url").alias("_k"), F.col("lsn"), st.alias("_st"))
    clear_eff = changes.filter(F.col("before_url").isNotNull()).select(
        F.col("before_url").alias("_k"),
        F.col("lsn"),
        F.lit(None).cast(_BEFORE_STRUCT).alias("_st"),
    )
    seed_eff = gen_pages_seed(spark, n_seed_urls, seed=seed).select(
        F.col("url").alias("_k"),
        F.lit(0).cast("long").alias("lsn"),
        F.struct(
            F.col("warc_ts"),
            F.col("html"),
            F.col("lang"),
            F.lit(None).cast("int").alias("fetch_status"),
        ).alias("_st"),
    )
    w = Window.partitionBy("_k").orderBy("lsn")
    eff = (
        set_eff.unionByName(clear_eff)
        .unionByName(seed_eff)
        .withColumn("_prev", F.lag("_st").over(w))
        .select(F.col("_k"), F.col("lsn").alias("_elsn"), F.col("_prev"))
    )
    read_key = F.coalesce(F.col("before_url"), F.col("url"))
    joined = changes.join(
        eff, (read_key == eff["_k"]) & (changes["lsn"] == eff["_elsn"]), "left"
    )
    return joined.select(
        *[F.col(c) for c in changes.columns],
        F.col("_prev").isNotNull().alias("before_exists"),
        *[F.col("_prev")[c].alias(f"before_{c}") for c in _BEFORE_PAYLOAD],
    )


def gen_ddl_events(
    spark: SparkSession,
    n_events: int,
    start_lsn: int = 1,
    kinds: str = "basic",
    table_name: str = "pages",
) -> DataFrame:
    """Schema-evolution events mid-stream (FIXTURES.md §3).

    kinds="basic": add, rename, widen (the round-1 fixture).
    kinds="full":  the reference's common replayable set (ddl_type.rs:7-36 /
    ddl_test/src_test.sql): add_column, rename_column, truncate_table,
    widen_column, drop_column — interleaved so each fires in a different
    micro-batch with live traffic on both sides.
    kinds="lifecycle": table-level replay set (ddl_type.rs CreateTable/
    RenameTable/DropTable, ddl_test/src_test.sql:1-60): create an aux
    table, rename the bound table (`table_name` -> `table_name`_v2) with
    live traffic continuing under the new root, then drop the aux table —
    each in its own micro-batch.  Requires EngineConfig.catalog_root.
    """
    if kinds == "basic":
        rows = [
            (start_lsn + int(n_events * 0.4), "add_column", '{"col":"fetch_status","type":"int"}'),
            (start_lsn + int(n_events * 0.6), "rename_column", '{"from":"lang","to":"language"}'),
            (
                start_lsn + int(n_events * 0.8),
                "widen_column",
                '{"col":"fetch_status","to_type":"long"}',
            ),
        ]
    elif kinds == "full":
        rows = [
            (start_lsn + int(n_events * 0.3), "add_column", '{"col":"fetch_status","type":"int"}'),
            (start_lsn + int(n_events * 0.45), "rename_column", '{"from":"lang","to":"language"}'),
            (start_lsn + int(n_events * 0.55), "truncate_table", "{}"),
            (
                start_lsn + int(n_events * 0.7),
                "widen_column",
                '{"col":"fetch_status","to_type":"long"}',
            ),
            (start_lsn + int(n_events * 0.85), "drop_column", '{"col":"warc_ts"}'),
        ]
    elif kinds == "lifecycle":
        aux_cols = '[["url","string",false],["note","string",true],["last_lsn","long",true]]'
        rows = [
            (
                start_lsn + int(n_events * 0.3),
                "create_table",
                '{"table":"%s_aux","cols":%s,"bucket_key":"url","bucket_count":4}'
                % (table_name, aux_cols),
            ),
            (
                start_lsn + int(n_events * 0.5),
                "rename_table",
                '{"from":"%s","to":"%s_v2"}' % (table_name, table_name),
            ),
            (
                start_lsn + int(n_events * 0.7),
                "drop_table",
                '{"table":"%s_aux"}' % table_name,
            ),
        ]
    else:
        raise ValueError(f"unknown kinds {kinds!r}")
    return spark.createDataFrame(rows, "lsn long, ddl_type string, payload string")
