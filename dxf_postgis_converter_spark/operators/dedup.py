"""Deduplication family for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design:
- exact dedup is a hash-groupBy — one shuffle on a 32-char key, map-side
  combine free via aggregation.
- MinHash/LSH: signatures are computed in ONE Arrow-batched pandas stage
  (numpy matrix of k hash functions over shingle sets); banding turns
  near-dup search into an equi-join on (band_id, band_hash) — the classic
  shuffle-friendly formulation. Candidate pairs are verified with exact
  Jaccard; pair generation uses a self-join per bucket, with oversized
  buckets capped (logged) to bound the quadratic corner.
- SimHash: 64-bit signature, hamming ≤ d via 4-block pigeonhole join.
- embedding near-dup: random-hyperplane LSH buckets + exact cosine verify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint, normalize_text

# deterministic 64-bit hash mixers (splitmix64 constants)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * _M1) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * _M2) & _MASK
    return x ^ (x >> np.uint64(31))


def _shingles(text: str, n: int) -> np.ndarray:
    """Character n-gram shingle hashes of normalized text."""
    t = " ".join(text.lower().split())
    if len(t) < n:
        t = t.ljust(n, "_")
    raw = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
    if len(raw) < n:
        raw = np.pad(raw, (0, n - len(raw)))
    win = np.lib.stride_tricks.sliding_window_view(raw, n).astype(np.uint64)
    weights = np.uint64(1099511628211) ** np.arange(n, dtype=np.uint64)
    return np.unique(_splitmix((win * weights).sum(axis=1) & _MASK))


# --- exact dedup ------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs: (fp, n_dups, keep_id,
    dup_ids). SQL-expressible → strong DuckDB oracle."""
    withfp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return (
        withfp.groupBy("fp")
        .agg(F.count("*").alias("n_dups"),
             F.min(id_col).alias("keep_id"),
             F.sort_array(F.collect_list(id_col)).alias("dup_ids"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per normalized-text fingerprint (min id wins)."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


# --- MinHash + LSH ----------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, shingle_n: int = 5,
) -> DataFrame:
    """(id, sig: array<bigint>) — k minhashes over char-n-gram shingles,
    one Arrow batch at a time, numpy-vectorized across the hash family."""
    seeds = _splitmix(np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].tolist()
            sigs = []
            for t in pdf[text_col].tolist():
                sh = _shingles(t or "", shingle_n)
                # k permutations: min over (shingle ^ seed) mixed
                m = _splitmix(sh[None, :] ^ seeds[:, None]).min(axis=1)
                sigs.append((m & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    schema = T.StructType([docs.schema[id_col], T.StructField("sig", T.ArrayType(T.LongType()))])
    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def minhash_lsh_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = 64, bands: int = 16, shingle_n: int = 5,
    jaccard_threshold: float = 0.7, max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    banding: sig → `bands` buckets of rows r=num_hashes/bands; bucket key
    = hash(band contents); candidates = self-join within bucket; verify =
    signature-level Jaccard estimate (fraction of equal minhashes).
    Buckets larger than max_bucket are dropped (boilerplate-cluster guard —
    at web scale a 10^6-doc bucket is boilerplate, not near-dup signal).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    sig = sig.withColumn("_band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
    sig = sig.withColumn("_bhash", F.xxhash64(F.slice(F.col("sig"), F.col("_band") * r + 1, r)))
    buckets = sig.select(id_col, "sig", "_band", "_bhash")

    # cap pathological buckets: the HOT set (count > cap) is tiny by
    # definition (the skewed tail) → broadcast anti-join; broadcasting the
    # complement (all ok buckets ≈ bands × docs rows) would not scale
    sizes = buckets.groupBy("_band", "_bhash").count()
    hot = sizes.filter(F.col("count") > max_bucket).drop("count")
    buckets = buckets.join(F.broadcast(hot), ["_band", "_bhash"], "left_anti")

    a = buckets.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "_band", "_bhash")
    b = buckets.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "_band", "_bhash")
    cand = (
        a.join(b, ["_band", "_bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)) / F.size("sig_a")
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


# --- n-gram Jaccard (exact, small-candidate path) ---------------------------

def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    shingle_n: int = 5, threshold: float = 0.5, max_bucket: int = 2000,
) -> DataFrame:
    """Exact Jaccard over shingle sets; candidates via shared rare shingle
    (prefix filtering: join on the min shingle hash of each doc)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                sh = _shingles(t or "", shingle_n)
                rows.append((i, (sh & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist()))
            yield pd.DataFrame({id_col: [r[0] for r in rows], "sh": [r[1] for r in rows]})

    schema = T.StructType([docs.schema[id_col], T.StructField("sh", T.ArrayType(T.LongType()))])
    s = docs.select(id_col, text_col).mapInPandas(gen, schema=schema)
    # candidate key: each doc's K smallest shingles (recall-complete for
    # threshold ≥ 0.5 when K=3 on near-identical docs; documented approximation)
    s = s.withColumn("key", F.explode(F.slice(F.sort_array("sh"), 1, 3)))
    a = s.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), "key")
    b = s.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), "key")
    cand = a.join(b, "key").filter(F.col("id_a") < F.col("id_b")).dropDuplicates(["id_a", "id_b"])
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash ----------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       shingle_n: int = 4) -> DataFrame:
    """(id, simhash: bigint) 64-bit simhash over shingle hashes."""
    def gen(batches):
        bitw = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for t in pdf[text_col].tolist():
                sh = _shingles(t or "", shingle_n)
                bits = ((sh[:, None] & bitw[None, :]) != 0).sum(axis=0)
                v = np.where(bits * 2 > len(sh), bitw, np.uint64(0)).sum(dtype=np.uint64)
                out.append(int(v & np.uint64(0x7FFFFFFFFFFFFFFF)))
            yield pd.DataFrame({id_col: pdf[id_col].tolist(), "simhash": out})

    schema = T.StructType([docs.schema[id_col], T.StructField("simhash", T.LongType())])
    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3, shingle_n: int = 4) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via 4-block pigeonhole:
    any pair within distance 3 shares at least one exact 16-bit block."""
    s = simhash_signatures(docs, id_col, text_col, shingle_n)
    block_vals = F.array(*[
        F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
    blocks = s.select(id_col, "simhash", F.posexplode(block_vals).alias("_blk", "_bval"))
    a = blocks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "_blk", "_bval")
    b = blocks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "_blk", "_bval")
    cand = a.join(b, ["_blk", "_bval"]).filter(F.col("id_a") < F.col("id_b")) \
        .dropDuplicates(["id_a", "id_b"])
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming) \
        .select("id_a", "id_b", "hamming")


# --- embedding cosine near-dup ----------------------------------------------

def embedding_neardup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_planes: int = 12, brute_force: bool = False,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. brute_force=True: exact O(N²)
    self-join (small N / oracle path). Else: random-hyperplane LSH bucket
    join + exact cosine verify (scale path; recall < 1 by construction,
    bounded by bucket collision probability)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
    e = emb.select(F.col(id_col), F.col(vec_col), norm.alias("_n"))
    if brute_force:
        a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), F.col("_n").alias("n_a"))
        b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), F.col("_n").alias("n_b"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        dim_row = emb.select(F.size(vec_col).alias("d")).first()
        rng = np.random.default_rng(1234)
        planes = rng.standard_normal((n_planes, dim_row.d))
        sig = F.concat(*[
            F.when(F.aggregate(
                F.zip_with(vec_col, F.array(*[F.lit(float(w)) for w in planes[i]]), lambda x, y: x * y),
                F.lit(0.0), lambda a, x: a + x) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_planes)])
        es = e.withColumn("_sig", sig)
        a = es.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                      F.col("_n").alias("n_a"), "_sig")
        b = es.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                      F.col("_n").alias("n_b"), "_sig")
        cand = a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    cos = dot / (F.col("n_a") * F.col("n_b"))
    return cand.withColumn("cosine", F.round(cos, 6)) \
        .filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")
