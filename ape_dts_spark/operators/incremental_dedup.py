"""Incremental content dedup at ingest time — a bloom-sidecar hash index.

The batch dedup family (``operators/text_dedup.py``) answers "which docs in
THIS corpus duplicate each other".  A CDC-fed corpus needs the incremental
question: "which of the pages that just ARRIVED already exist somewhere in
the 100-TB historical table" — without rescanning the table per batch.
(Reference analog: ape-dts solves arrival-idempotence per KEY via MERGE;
this operator extends it to CONTENT identity across keys, the dedup a
training-data pipeline runs at ingest.)

``ContentIndex`` is a narrow append-only sidecar of content hashes:

* **data**: parquet rows ``(h: 32-hex md5 of the text bytes, b: bucket,
  url)``, bucketed by ``b = h mod n_buckets``, committed through a
  versioned-manifest atomic publish (same ``os.link`` single-winner trick
  as ``lake/table.py``) — a crashed append leaves unreferenced files,
  never a torn index.
* **bloom sidecar**: per append, per bucket, a right-sized bloom segment
  (``BITS_PER_KEY`` bits/key, double hashing from two independent 60-bit
  halves of the md5).  Membership = positive in ANY segment.  Segments
  stay small because they are sized to their own batch; ``stats()``
  reports per-bucket segment counts so callers know when to
  ``rebuild_blooms()`` (one right-sized segment per bucket).

``dedup_batch`` is a two-phase filter, exact by construction:

1. **bloom phase** (cheap, distributed): the batch is grouped by bucket
   and each group is checked against ITS bucket's bloom segments inside an
   Arrow ``applyInPandas`` — pure numpy modular arithmetic, no per-row
   Python.  Misses are definitively fresh (blooms have no false
   negatives); survivors are *candidates*.
2. **verify phase** (exact): candidates are joined against the index
   parquet — but only the data files of the candidate BUCKETS are read
   (the manifest keeps per-bucket file lists), and with a low-FPR bloom
   the candidate set is a whisker above the true-dup set, so a
   mostly-fresh batch touches almost none of the index.

Scale story at 10^10 indexed pages: the index is ~50 bytes/key of parquet
and ~2 bytes/key of bloom.  A batch never reads more of it than the
buckets its own candidates hash into, the bloom check streams one bucket's
segments per task (segments are per-batch-sized, not index-sized), and the
only shuffles are the batch-side hash repartitions — O(batch), never
O(index).  The output contract is exact md5 equality, so the DuckDB oracle
is a plain anti-join (``tests/test_incremental_dedup.py``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bloom sizing: 16 bits/key + 7 probes => ~0.2% false-positive rate.
BITS_PER_KEY = 16
N_PROBES = 7


class CommitConflict(RuntimeError):
    pass


def content_hash(text_col):
    """32-hex md5 of the column's bytes — the exact-dedup content identity.

    Engine-portable (DuckDB: ``md5(text)``), deterministic across runs and
    parallelism, and wide enough (128 bits) that hash equality IS content
    equality at any realistic corpus size."""
    return F.md5(F.col(text_col).cast("binary"))


def _with_hash_cols(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    """h + bucket + the two independent 60-bit halves double hashing needs.

    All JVM-side (conv/substring codegen) so the pandas bloom check below
    receives ready-made int64s and never parses hex in Python."""
    h = content_hash(text_col)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
    return df.withColumns(
        {
            "h": h,
            "b": F.pmod(h1, F.lit(n_buckets)).cast("int"),
            "h1": h1,
            # odd h2 keeps the double-hash probe sequence full-period even
            # when the (byte-rounded) segment size is a multiple of 2.
            "h2": h2 * F.lit(2) + F.lit(1),
        }
    )


def _segment_bits(n_keys: int) -> int:
    # numpy packbits works in bytes; round up to a whole byte, floor 1 KiB
    # so tiny batches don't make degenerate blooms.
    return max(8 * 1024, ((n_keys * BITS_PER_KEY + 7) // 8) * 8)


def _positions(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """(len, N_PROBES) probe positions via double hashing, vectorized.

    Reduce mod m BEFORE the multiply: h1,h2 carry up to 61 bits, so
    h1 + 6*h2 would overflow int64 (wrapping is consistent but warns and
    leans on C semantics); (h2 % m) * 6 stays far inside int64 for any
    realistic segment size."""
    i = np.arange(N_PROBES, dtype=np.int64)
    return ((h1 % m)[:, None] + i[None, :] * (h2 % m)[:, None]) % m


def _build_segment(h1: np.ndarray, h2: np.ndarray) -> bytes:
    m = _segment_bits(len(h1))
    bits = np.zeros(m, dtype=np.uint8)
    bits[_positions(h1, h2, m).ravel()] = 1
    return np.packbits(bits).tobytes()


def _check_segment(blob: bytes, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    pos = _positions(h1, h2, len(bits))
    return bits[pos].all(axis=1)


def _vacuum_index(path: str, keep_last: int, file_keys: tuple[str, ...]) -> int:
    """Sidecar-index GC shared by ContentIndex and NearDupIndex: delete
    every data/bloom file referenced ONLY by manifests older than the
    newest ``keep_last`` ones, then those manifests themselves.  Returns
    the number of data files deleted.

    Safe by construction: a file is deleted only if some OLD manifest
    references it and NO kept manifest does — in-flight files an appender
    has written but not yet published are referenced by no manifest and
    are never touched.  Without this, every auto-compact leaves its
    superseded generation on disk and a long-running engine's sidecar
    grows O(index size x compaction count) (r5 ADVICE)."""
    meta = os.path.join(path, "_meta")
    versions = sorted(
        int(f[len("manifest_v") : -len(".json")])
        for f in os.listdir(meta)
        if f.startswith("manifest_v")
    )
    keep_last = max(1, keep_last)
    old, kept = versions[:-keep_last], versions[-keep_last:]
    if not old:
        return 0

    def _refs(v: int) -> set:
        with open(os.path.join(meta, f"manifest_v{v}.json")) as fh:
            m = json.load(fh)
        out: set = set()
        for k in file_keys:
            for paths in m.get(k, {}).values():
                out.update(paths)
        return out

    live: set = set()
    for v in kept:
        live |= _refs(v)
    removed = 0
    for v in old:
        for p in _refs(v) - live:
            try:
                os.unlink(p)
                removed += 1
            except FileNotFoundError:
                pass  # already gone (idempotent re-run)
        os.unlink(os.path.join(meta, f"manifest_v{v}.json"))
    return removed


class ContentIndex:
    """Append-only content-hash index with per-bucket bloom segments."""

    def __init__(self, path: str, manifest: dict):
        self.path = path
        self.manifest = manifest

    # -- lifecycle ---------------------------------------------------------
    @staticmethod
    def create(path: str, n_buckets: int = 64) -> "ContentIndex":
        if ContentIndex.exists(path):
            raise FileExistsError(f"content index already exists at {path}")
        os.makedirs(os.path.join(path, "_meta"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        os.makedirs(os.path.join(path, "bloom"), exist_ok=True)
        idx = ContentIndex(
            path,
            {
                "version": 0,
                "n_buckets": n_buckets,
                "total_keys": 0,
                # bucket -> [parquet paths];  bucket -> [bloom segment paths]
                "files": {},
                "blooms": {},
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
    def load(path: str) -> "ContentIndex":
        meta = os.path.join(path, "_meta")
        versions = sorted(
            int(f[len("manifest_v") : -len(".json")])
            for f in os.listdir(meta)
            if f.startswith("manifest_v")
        )
        if not versions:
            raise FileNotFoundError(f"no content index at {path}")
        with open(os.path.join(meta, f"manifest_v{versions[-1]}.json")) as fh:
            return ContentIndex(path, json.load(fh))

    def _publish(self, m: dict) -> None:
        """Single-winner atomic commit (same pattern as LakeTable._publish:
        write-temp + os.link; EEXIST means a concurrent appender won)."""
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

    # -- write path ---------------------------------------------------------
    def append(self, batch: DataFrame, text_col: str = "text", id_col: str = "url") -> int:
        """Index a batch's content hashes; returns new total_keys.

        One batch-sized shuffle (repartition by bucket), one parquet write
        per touched bucket, one bloom segment per touched bucket built
        map-side and collected (segments are 2 bytes/key of THIS batch —
        driver traffic is O(batch), never O(index))."""
        nb = self.manifest["n_buckets"]
        v = self.manifest["version"] + 1
        hashed = (
            _with_hash_cols(batch, text_col, nb)
            .select("h", "b", "h1", "h2", F.col(id_col).cast("string").alias("url"))
            .dropDuplicates(["h"])
        )

        def _emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            # pid in the name: a concurrent appender racing on the same
            # version must not overwrite this writer's files before the
            # manifest os.link decides the single winner.
            part = os.path.join(
                self.path, "data", f"v{v}_b{b}_{os.getpid()}.parquet"
            )
            pdf[["h", "b", "url"]].to_parquet(part, index=False)
            blob = _build_segment(
                pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64)
            )
            bpath = os.path.join(
                self.path, "bloom", f"v{v}_b{b}_{os.getpid()}.bloom"
            )
            with open(bpath, "wb") as fh:
                fh.write(blob)
            return pd.DataFrame({"b": [b], "n": [len(pdf)], "part": [part], "bloom": [bpath]})

        written = (
            hashed.groupBy("b")
            .applyInPandas(_emit, schema="b int, n long, part string, bloom string")
            .collect()
        )
        m = json.loads(json.dumps(self.manifest))
        m["version"] = v
        for r in written:
            m["files"].setdefault(str(r["b"]), []).append(r["part"])
            m["blooms"].setdefault(str(r["b"]), []).append(r["bloom"])
            m["total_keys"] += r["n"]
        self._publish(m)
        return m["total_keys"]

    # -- read path ----------------------------------------------------------
    def dedup_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "url",
    ) -> tuple[DataFrame, DataFrame]:
        """(fresh, dups): batch rows whose content is absent / present in
        the index.  Exact (md5-equality) output; the bloom only prunes.

        ``dups`` carries the batch columns plus ``h`` so callers can audit
        or route duplicates (e.g. count-only lineage) without recompute.
        Intra-batch duplicates are NOT collapsed here — compose with
        ``text_dedup.exact_dedup`` when the batch itself may self-dup."""
        nb = self.manifest["n_buckets"]
        blooms = {int(b): list(paths) for b, paths in self.manifest["blooms"].items()}
        hashed = _with_hash_cols(batch, text_col, nb)
        keep = [c for c in hashed.schema.fieldNames() if c not in ("b", "h1", "h2")]
        if not blooms:
            fresh = hashed.select(*keep)
            return fresh, fresh.limit(0)

        def _bloom_check(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            segs = blooms.get(int(key[0]), [])
            out = pdf[["h", "b"]]
            if not segs:
                return out.iloc[0:0]
            h1 = pdf["h1"].to_numpy(np.int64)
            h2 = pdf["h2"].to_numpy(np.int64)
            hit = np.zeros(len(pdf), dtype=bool)
            for p in segs:
                todo = ~hit
                if not todo.any():
                    break
                with open(p, "rb") as fh:
                    blob = fh.read()
                hit[todo] |= _check_segment(blob, h1[todo], h2[todo])
            return out[hit]

        # bloom phase ships ONLY (h,b,h1,h2) through Arrow — never the
        # page payload.  The candidate frame is deliberately recomputed
        # (bucket-list collect + verify join) rather than persisted: the
        # stage is batch-sized codegen md5 + numpy, and an unpinned cache
        # can't leak across pipeline invocations (ADVICE r4 pattern).
        candidates = (
            hashed.select("h", "b", "h1", "h2")
            .groupBy("b")
            .applyInPandas(_bloom_check, schema="h string, b int")
        )

        # exact verify: read ONLY the candidate buckets' index files — a
        # driver-side metadata decision off the manifest's per-bucket
        # lists.  With a ~0.2% FPR bloom a mostly-fresh batch confirms
        # against a sliver of the index; the join is hash-on-h both
        # sides, AQE-skew-splittable.
        cand_buckets = sorted(
            r["b"] for r in candidates.select("b").distinct().collect()
        )
        files = [
            p for b in cand_buckets for p in self.manifest["files"].get(str(b), [])
        ]
        if not files:
            fresh = hashed.select(*keep)
            return fresh, fresh.limit(0)
        index_df = spark.read.parquet(*files).select("h")
        confirmed = (
            candidates.join(index_df, "h", "left_semi").select("h").distinct()
        )

        dups = hashed.join(confirmed, "h", "left_semi").select(*keep)
        fresh = hashed.join(confirmed, "h", "left_anti").select(*keep)
        return fresh, dups

    # -- maintenance ----------------------------------------------------------
    def stats(self) -> dict:
        segs = [len(v) for v in self.manifest["blooms"].values()]
        return {
            "total_keys": self.manifest["total_keys"],
            "version": self.manifest["version"],
            "buckets_touched": len(segs),
            "max_segments_per_bucket": max(segs, default=0),
        }

    def compact(self, spark: SparkSession) -> int:
        """Fold each bucket's N per-append data files into ONE file and its
        bloom segments into one right-sized segment; returns the new
        manifest version.

        Appends add a data file + bloom segment per touched bucket, so a
        per-batch CDC engine accumulates files linearly with batch count —
        verify-joins then pay file listing/footer overhead and the bloom
        check loops over per-batch segments.  One distributed pass (a task
        per bucket re-reads that bucket's files, dropping duplicate hashes)
        + one atomic manifest publish; superseded files become
        unreferenced, never a torn index."""
        m0 = self.manifest
        v = m0["version"] + 1
        files = [p for paths in m0["files"].values() for p in paths]
        if not files:
            return m0["version"]
        rows = spark.read.parquet(*files).select(
            "h",
            "b",
            F.conv(F.substring("h", 1, 15), 16, 10).cast("long").alias("h1"),
            (F.conv(F.substring("h", 17, 15), 16, 10).cast("long") * 2 + 1).alias("h2"),
            "url",
        )
        path = self.path

        def _emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            pdf = pdf.drop_duplicates(subset=["h"])
            part = os.path.join(path, "data", f"v{v}_b{b}_{os.getpid()}.parquet")
            pdf[["h", "b", "url"]].to_parquet(part, index=False)
            blob = _build_segment(
                pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64)
            )
            bpath = os.path.join(path, "bloom", f"v{v}_b{b}_{os.getpid()}.bloom")
            with open(bpath, "wb") as fh:
                fh.write(blob)
            return pd.DataFrame(
                {"b": [b], "n": [len(pdf)], "part": [part], "bloom": [bpath]}
            )

        written = (
            rows.groupBy("b")
            .applyInPandas(_emit, schema="b int, n long, part string, bloom string")
            .collect()
        )
        m = json.loads(json.dumps(m0))
        m["version"] = v
        m["files"] = {str(r["b"]): [r["part"]] for r in written}
        m["blooms"] = {str(r["b"]): [r["bloom"]] for r in written}
        m["total_keys"] = sum(int(r["n"]) for r in written)
        self._publish(m)
        return v

    def vacuum(self, keep_last: int = 2) -> int:
        """Delete files superseded by compaction (see _vacuum_index): keep
        the newest ``keep_last`` manifest generations, unlink everything
        only they no longer reference.  The engine calls this after
        auto-compact when snapshot retention is enabled."""
        return _vacuum_index(self.path, keep_last, ("files", "blooms"))

    def rebuild_blooms(self, spark: SparkSession) -> int:
        """Fold each bucket's N segments into one right-sized segment.

        Distributed (one task per bucket re-reads that bucket's data files)
        — run when max_segments_per_bucket makes the per-batch check's
        segment loop long (each segment is one small file read per task,
        so tens are fine, thousands are not)."""
        nb = self.manifest["n_buckets"]
        v = self.manifest["version"] + 1
        files = [p for paths in self.manifest["files"].values() for p in paths]
        if not files:
            return self.manifest["version"]
        rows = (
            spark.read.parquet(*files)
            .select(
                "h",
                "b",
                F.conv(F.substring("h", 1, 15), 16, 10).cast("long").alias("h1"),
                (F.conv(F.substring("h", 17, 15), 16, 10).cast("long") * 2 + 1).alias("h2"),
            )
        )

        def _emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            b = int(key[0])
            blob = _build_segment(
                pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64)
            )
            bpath = os.path.join(
                self.path, "bloom", f"v{v}_b{b}_{os.getpid()}.bloom"
            )
            with open(bpath, "wb") as fh:
                fh.write(blob)
            return pd.DataFrame({"b": [b], "bloom": [bpath]})

        built = (
            rows.groupBy("b")
            .applyInPandas(_emit, schema="b int, bloom string")
            .collect()
        )
        m = json.loads(json.dumps(self.manifest))
        m["version"] = v
        m["blooms"] = {str(r["b"]): [r["bloom"]] for r in built}
        self._publish(m)
        return v
