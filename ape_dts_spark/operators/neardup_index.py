"""Incremental NEAR-duplicate detection at ingest — a MinHash sidecar index.

``ContentIndex`` (incremental_dedup.py) answers "has this EXACT content
been ingested before" (md5 equality).  Web corpora also re-crawl *almost*
identical pages — trailing timestamps, rotated ads, template tweaks — that
defeat byte equality.  ``NearDupIndex`` extends the arrival-time question
to Jaccard similarity: "is an arriving page >= t similar to ANY page
already ingested", without rescanning the corpus and without storing its
text.

Design (the same LSH machinery as the batch path, made persistent):

* **signature**: K minhashes per doc via the fused zero-shuffle path
  (``text_dedup.minhash_signatures_fused`` — identical hash family and
  literals as the batch/board operator, so index and batch agree
  bit-for-bit across runs and engines).
* **index rows**: ``(band, sig, doc_id, mhs array<long>)`` — one row per
  band per doc, parquet, bucketed by ``xxhash64(band, sig) mod n_buckets``
  so every row of one band-signature lives in ONE bucket.  Storing the
  full K-long signature on each band row costs x``bands`` duplication
  (~``bands * K * 8`` bytes/doc) and buys verification without a second
  lookup; at extreme scale split sig storage into its own doc-bucketed
  table and pay one extra join.
* **match**: arriving docs compute their band signatures, PRUNE the index
  read to just the buckets those signatures hash into (driver-side
  metadata decision off the manifest's per-bucket file lists — a
  mostly-novel batch touches a sliver of the index), equi-join on
  ``(band, sig)``, then verify each candidate by the unbiased MinHash
  estimate ``est_jaccard = |matching components| / K`` (pure
  ``zip_with``/``filter`` array codegen — the index never re-reads text).
* **hot-band guard**: a boilerplate band-signature shared by 10^6 indexed
  docs would pair with every arriving doc that carries it.  The read
  slice drops (band, sig) groups over ``max_bucket`` via the
  groupBy+anti-join form (``text_dedup._drop_hot_keys`` — no window, the
  megakey never co-locates; counts are EXACT because bucketing guarantees
  the slice holds every row of each group it holds at all).  Docs whose
  overlap rides only on boilerplate bands fall out — the same documented
  trade as the batch LSH cap, and exact re-crawls are caught by
  ``ContentIndex`` anyway.
* **commit**: versioned-manifest atomic publish (``os.link``
  single-winner, same crash contract as ContentIndex/LakeTable: a torn
  append leaves unreferenced files, never a torn index).

Scale story at 10^10 indexed pages: appends shuffle O(batch) band rows
once; matches read O(batch-distinct band signatures) buckets of the
index, never the whole table; every per-row computation is codegen or a
bounded equi-join.  Recall is the LSH recall of the (K, bands) choice —
same r/b trade as the batch operator.

Docs with no non-empty shingle produce no signature (matching the batch
path) — they are never indexed and never match.

Oracle: signatures and banding reuse the board-oracled minhash literals,
so DuckDB mirrors ``match_batch`` end-to-end with plain SQL
(``tests/test_neardup_index.py``).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ape_dts_spark.operators.incremental_dedup import CommitConflict
from ape_dts_spark.operators.text_dedup import _drop_hot_keys, minhash_signatures_fused


def _band_rows(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k_shingle: int,
    num_hashes: int,
    bands: int,
    n_buckets: int,
) -> DataFrame:
    """(doc_id, band, sig, mhs, b): one row per band per doc with the full
    signature alongside, bucketed by hash(band, sig)."""
    sigs = minhash_signatures_fused(
        docs, id_col=id_col, text_col=text_col, k=k_shingle, num_hashes=num_hashes
    )
    rows_per_band = num_hashes // bands
    mh_cols = [F.col(f"mh{i}") for i in range(num_hashes)]
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("sig"))
        )
    return sigs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.array(*mh_cols).alias("mhs"),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.sig").alias("sig"),
        "mhs",
        F.pmod(F.xxhash64(F.col("bb.band"), F.col("bb.sig")), F.lit(n_buckets))
        .cast("int")
        .alias("b"),
    )


class NearDupIndex:
    """Append-only MinHash band-signature index for ingest-time near-dup."""

    def __init__(self, path: str, manifest: dict):
        self.path = path
        self.manifest = manifest

    # -- lifecycle ---------------------------------------------------------
    @staticmethod
    def create(
        path: str,
        n_buckets: int = 64,
        num_hashes: int = 16,
        bands: int = 4,
        k_shingle: int = 3,
    ) -> "NearDupIndex":
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must divide evenly into bands")
        if NearDupIndex.exists(path):
            raise FileExistsError(f"near-dup index already exists at {path}")
        os.makedirs(os.path.join(path, "_meta"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        idx = NearDupIndex(
            path,
            {
                "version": 0,
                "n_buckets": n_buckets,
                "num_hashes": num_hashes,
                "bands": bands,
                "k_shingle": k_shingle,
                "total_docs": 0,
                "files": {},  # bucket -> [parquet paths]
            },
        )
        idx._publish(idx.manifest)
        return idx

    @staticmethod
    def exists(path: str) -> bool:
        meta = os.path.join(path, "_meta")
        return os.path.isdir(meta) and any(
            f.startswith("manifest_v") for f in os.listdir(meta)
        )

    @staticmethod
    def load(path: str) -> "NearDupIndex":
        meta = os.path.join(path, "_meta")
        versions = sorted(
            int(f[len("manifest_v") : -len(".json")])
            for f in os.listdir(meta)
            if f.startswith("manifest_v")
        )
        if not versions:
            raise FileNotFoundError(f"no near-dup index at {path}")
        with open(os.path.join(meta, f"manifest_v{versions[-1]}.json")) as fh:
            return NearDupIndex(path, json.load(fh))

    def _publish(self, m: dict) -> None:
        meta = os.path.join(self.path, "_meta")
        tmp = os.path.join(meta, f".tmp_manifest_{os.getpid()}_{m['version']}")
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        final = os.path.join(meta, f"manifest_v{m['version']}.json")
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflict(f"manifest v{m['version']} already committed")
        finally:
            os.unlink(tmp)
        self.manifest = m

    # -- signatures --------------------------------------------------------
    def band_rows(
        self, batch: DataFrame, text_col: str = "text", id_col: str = "url"
    ) -> DataFrame:
        """The batch's band-signature frame (doc_id, band, sig, mhs, b)
        under this index's pinned parameters.

        The signature projection is the expensive part of both ``append``
        and ``match_batch`` — a caller doing match-then-append on the same
        batch (the CDC engine's shape) should compute this ONCE, eagerly
        materialize it (``localCheckpoint`` — it is narrow: ~200 bytes x
        bands per doc), and pass it to both via their ``rows=`` parameter,
        halving the per-batch signature cost."""
        m = self.manifest
        return _band_rows(
            batch, text_col, id_col, m["k_shingle"], m["num_hashes"], m["bands"],
            m["n_buckets"],
        )

    # -- write path --------------------------------------------------------
    def append(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "url",
        rows: DataFrame | None = None,
    ) -> int:
        """Index a batch; returns new total_docs (docs with >=1 shingle).

        One batch-sized shuffle (groupBy bucket), one parquet file per
        touched bucket per append.  Re-appending an id overwrites nothing —
        both generations match future batches identically (same content =>
        same sig); stale generations cost index bytes AND inflate
        ``total_docs`` and the exact per-(band, sig) counts that
        ``match_batch``'s ``max_bucket`` hot cap sees (compact() only
        collapses IDENTICAL (doc_id, band, sig) rows, so a doc re-appended
        with changed content keeps its old band rows forever): enough churn
        on one signature can spuriously trip the cap and silently lose
        recall on legitimately shared signatures.  Rebuild into a fresh
        index when generation churn matters (r5 ADVICE).

        Batches are expected id-unique (the CDC engine's are LWW-deduped);
        a repeated (doc_id, band, sig) row is collapsed inside its bucket
        writer — deliberately NOT a Spark-side dropDuplicates: that
        exchange gets AQE-coalesced to ONE partition on batch-sized inputs,
        and the expensive signature projection above it then runs serially
        (measured 16x: 16s -> 252s on a 10k-doc batch).  Identical rows
        hash to the same bucket, so the pandas-side dedup is exact with
        zero extra shuffle and the signatures keep the caller's (parallel)
        partitioning."""
        m0 = self.manifest
        v = m0["version"] + 1
        if rows is None:
            rows = self.band_rows(batch, text_col, id_col)
        path = self.path

        def _emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            pdf = pdf.drop_duplicates(subset=["doc_id", "band", "sig"])
            part = os.path.join(path, "data", f"v{v}_b{b}_{os.getpid()}.parquet")
            pdf[["band", "sig", "doc_id", "mhs"]].to_parquet(part, index=False)
            # n_docs: band rows / bands is exact only globally; count band-0
            # rows instead (every sig'd doc emits exactly one band-0 row)
            return pd.DataFrame(
                {"b": [b], "n0": [int((pdf["band"] == 0).sum())], "part": [part]}
            )

        written = (
            rows.groupBy("b")
            .applyInPandas(_emit, schema="b int, n0 long, part string")
            .collect()
        )
        m = json.loads(json.dumps(m0))
        m["version"] = v
        for r in written:
            m["files"].setdefault(str(r["b"]), []).append(r["part"])
            m["total_docs"] += int(r["n0"])
        self._publish(m)
        return m["total_docs"]

    # -- read path ---------------------------------------------------------
    def match_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "url",
        threshold: float = 0.7,
        max_bucket: int | None = 64,
        rows: DataFrame | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """(fresh, dups): batch rows with no / at least one indexed
        near-duplicate at ``est_jaccard >= threshold``.

        ``dups`` carries the batch columns plus the BEST match's
        ``matched_id`` and ``est_jaccard`` (max estimate, ties to the
        LEXICOGRAPHICALLY smallest matched_id — ids are carried as strings,
        the key domain being urls; numeric ids tie-break as their string
        forms).  A batch doc whose id is already indexed matches itself at
        1.0 — filter ``dups`` on ``matched_id != id`` when re-crawls of the
        SAME key should pass.  NB: the engine's ``_near_dup_filter`` applies
        NO such exemption — a same-key re-INSERT with near-identical text
        (e.g. insert-after-delete; deletes never purge the sidecar)
        self-matches and is dropped, the same content-ingested-once
        contract the ContentIndex documents (EngineConfig
        ``content_index_path`` notes).  Docs with no shingles are always
        fresh."""
        m = self.manifest
        if not m["files"]:
            return batch, batch.limit(0)
        if rows is None:
            rows = self.band_rows(batch, text_col, id_col)
        rows = rows.select("doc_id", "band", "sig", "mhs", "b")

        # prune the index read to the buckets the batch's band sigs hash
        # into — driver-side metadata decision, O(batch distinct sigs)
        need = sorted(r["b"] for r in rows.select("b").distinct().collect())
        files = [p for b in need for p in m["files"].get(str(b), [])]
        if not files:
            return batch, batch.limit(0)
        idx = spark.read.parquet(*files).select(
            "band", "sig", F.col("doc_id").alias("matched_id"), F.col("mhs").alias("_imhs")
        )
        if max_bucket is not None:
            # counts over the slice are exact per (band, sig): bucketing
            # puts every row of a band-signature in one bucket, and the
            # slice holds whole buckets
            idx = _drop_hot_keys(idx, ["band", "sig"], max_bucket)

        K = m["num_hashes"]
        est = (
            F.size(F.filter(F.zip_with("mhs", "_imhs", lambda x, y: x == y), lambda v: v))
            / F.lit(float(K))
        ).alias("est_jaccard")
        # score per band-collision row, THEN collapse the pair: the same
        # pair via several bands yields the identical estimate, so the
        # narrow (doc_id, matched_id, double) agg replaces a distinct over
        # rows carrying both K-long signature arrays — the estimate costs
        # K comparisons, the wide shuffle costs 2*K*8 bytes per row
        scored = (
            rows.join(idx, ["band", "sig"])
            .select("doc_id", "matched_id", est)
            .filter(F.col("est_jaccard") >= threshold)
            .groupBy("doc_id", "matched_id")
            .agg(F.max("est_jaccard").alias("est_jaccard"))
        )
        # best match per arriving doc: max estimate, ties resolved to the
        # smallest matched_id — two map-side-combinable aggs, no window
        top = scored.groupBy("doc_id").agg(F.max("est_jaccard").alias("est_jaccard"))
        pick = (
            scored.join(top, ["doc_id", "est_jaccard"])
            .groupBy("doc_id", "est_jaccard")
            .agg(F.min("matched_id").alias("matched_id"))
        )
        keyed = batch.withColumn("_did", F.col(id_col).cast("string"))
        dups = keyed.join(
            pick.withColumnRenamed("doc_id", "_did"), "_did"
        ).drop("_did")
        fresh = keyed.join(pick.select(F.col("doc_id").alias("_did")), "_did", "left_anti").drop(
            "_did"
        )
        return fresh, dups

    # -- maintenance -------------------------------------------------------
    def compact(self, spark: SparkSession) -> int:
        """Fold each bucket's N per-append files into ONE file; returns the
        new manifest version.

        Every append adds a file per touched bucket, so a per-batch CDC
        engine accumulates files linearly with batch count (10k batches x
        64 buckets = 640k small files) — the per-match read then pays file
        listing/footer overhead instead of data.  Compaction is one
        distributed pass (a task per bucket re-reads that bucket's files,
        collapsing repeated (doc_id, band, sig) generations) and one atomic
        manifest publish; superseded files become unreferenced, never a
        torn index (``vacuum()`` deletes them once no reader can hold the
        old manifest).  Run when stats()['max_files_per_bucket'] makes
        match latency file-bound — tens are fine, thousands are not."""
        m0 = self.manifest
        v = m0["version"] + 1
        files = [p for paths in m0["files"].values() for p in paths]
        if not files:
            return m0["version"]
        rows = spark.read.parquet(*files).withColumn(
            "b",
            F.pmod(F.xxhash64(F.col("band"), F.col("sig")), F.lit(m0["n_buckets"]))
            .cast("int"),
        )
        path = self.path

        def _emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            pdf = pdf.drop_duplicates(subset=["doc_id", "band", "sig"])
            part = os.path.join(path, "data", f"v{v}_b{b}_{os.getpid()}.parquet")
            pdf[["band", "sig", "doc_id", "mhs"]].to_parquet(part, index=False)
            return pd.DataFrame(
                {"b": [b], "n0": [int((pdf["band"] == 0).sum())], "part": [part]}
            )

        written = (
            rows.groupBy("b")
            .applyInPandas(_emit, schema="b int, n0 long, part string")
            .collect()
        )
        m = json.loads(json.dumps(m0))
        m["version"] = v
        m["files"] = {str(r["b"]): [r["part"]] for r in written}
        m["total_docs"] = sum(int(r["n0"]) for r in written)
        self._publish(m)
        return v

    def vacuum(self, keep_last: int = 2) -> int:
        """Delete files superseded by compaction: keep the newest
        ``keep_last`` manifest generations, unlink everything only they no
        longer reference (shared helper — see
        incremental_dedup._vacuum_index).  The engine calls this after
        auto-compact when snapshot retention is enabled."""
        from ape_dts_spark.operators.incremental_dedup import _vacuum_index

        return _vacuum_index(self.path, keep_last, ("files",))

    def stats(self) -> dict:
        files = [len(v) for v in self.manifest["files"].values()]
        return {
            "total_docs": self.manifest["total_docs"],
            "version": self.manifest["version"],
            "buckets_touched": len(files),
            "max_files_per_bucket": max(files, default=0),
            "params": {
                k: self.manifest[k]
                for k in ("num_hashes", "bands", "k_shingle", "n_buckets")
            },
        }
