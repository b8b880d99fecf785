"""Deduplication operators for training-data pipelines over `documents`.

Four families, all Spark-first (built-in functions only — shingling, hashing,
banding and bucket joins are pure JVM columnar; no Python UDFs):

  * exact       -- hash-groupBy (text_analysis.dedup_exact)
  * n-gram Jaccard -- exact pairwise similarity within blocking keys
  * MinHash+LSH -- shingle -> k minhashes -> band -> bucket-join candidates
                   -> exact-verify survivors
  * SimHash     -- 64-bit sign-of-sum signature + banded Hamming candidates

Scale design (the 100 TB story):
  - shingling/hashing is embarrassingly parallel (map-only, codegen);
  - LSH candidate generation shuffles only (band_id, band_hash) keys; bucket
    sizes are capped (`max_bucket`) so a degenerate value (empty docs, boiler-
    plate) cannot quadratically explode a reducer — dropped buckets are
    reported, not silently ignored (returned by lsh_buckets);
  - exact verification runs only on candidate pairs, never all-pairs;
  - the exact n-gram variant requires a blocking key (e.g. source/length
    bucket) precisely because unblocked all-pairs does not exist at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import tokens_col


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct). len(tokens) < n -> the full token
    string as a single shingle (so short docs still dedupe)."""
    toks = tokens_col(F.lower(text))
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(k >= n, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 1,
    threshold: float = 0.5,
    block_col: str = "source",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing a blocking key.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    sh = docs.select(
        "doc_id",
        F.col(block_col).alias("_blk"),
        word_shingles(F.col("text"), n).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a._blk") == F.col("b._blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k minhashes; hash_j(s) = xxhash64(s, j). Empty shingle set -> nulls."""
    def _mh(j: int):
        # keep the lambda 1-arity (2-arity means (element, index) to Spark)
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(j))))

    return F.array(*[_mh(j).alias(f"mh{j}") for j in range(k)])


def lsh_buckets(
    docs: DataFrame, k: int = 32, bands: int = 8, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, band_id, band_hash) — one row per band per doc."""
    r = k // bands
    sig = docs.select(
        "doc_id", minhash_signature(word_shingles(F.col("text"), shingle_n), k).alias("sig")
    )
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.element_at("sig", b * r + i + 1) for i in range(r)]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    )
    return band_rows.select("doc_id", "band.band_id", "band.band_hash")


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.6,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate pairs from LSH buckets, exact-verified at `threshold`.

    Buckets larger than max_bucket (degenerate content) are dropped to bound
    the quadratic pair blow-up; at scale, report them via lsh_buckets stats.
    """
    b = lsh_buckets(docs, k, bands, shingle_n)
    sized = b.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_hash")),
    ).filter((F.col("bucket_n") > 1) & (F.col("bucket_n") <= max_bucket))
    l, rt = sized.alias("l"), sized.alias("r")
    cand = (
        l.join(
            rt,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = docs.select("doc_id", word_shingles(F.col("text"), shingle_n).alias("sh"))
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return verified.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: Column) -> Column:
    """64-bit SimHash over tokens: bit b = sign of sum over tokens of
    (+1 if bit b of xxhash64(token) else -1). Pure columnar arithmetic:
    tokens are hashed once, then the 64 bit-sums are unrolled Python-side
    (shift amounts must be literals). At extreme scale a numpy/Arrow kernel
    doing the bit-unpack in one pass would cut the 64 array traversals."""
    toks = F.array_distinct(tokens_col(F.lower(text)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    sig = F.lit(0).cast("long")
    for b in range(64):
        weight = (1 << b) if b < 63 else -(1 << 63)  # bit 63 = sign bit
        sig = sig + F.when(bit_sum(b) > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates by banded SimHash: 4 bands of 16 bits; a pair
    sharing any band is a candidate; verified by exact Hamming distance."""
    sig = docs.select("doc_id", simhash64(F.col("text")).alias("sim"))
    bands = sig.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned("sim", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "sim", "b.band_id", "b.band_val")
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
