"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All the text-hash variants are built from deterministic, engine-portable
primitives (character shingles + md5) so results are bit-comparable with a
DuckDB oracle. Everything is expressed with built-in Column functions —
no Python UDFs in any hot path.

Scale design:
* near-dup candidate generation is an **inverted-index / LSH-bucket join**
  (shuffle keyed on shingle/bucket), never a cross join;
* `max_df` drops ultra-frequent shingles — the skew guard: a shingle
  appearing in k docs creates k^2 join pairs;
* exact dedup is a groupBy (map-side combinable), not a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from henbun_spark.operators._parallel import ensure_parallelism


def char_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 5) -> DataFrame:
    """Distinct character n-grams per document: (id, shingle) long table.

    substring semantics are shared by Spark and DuckDB (1-based, truncating
    at the string end), keeping oracles exact.

    The explode multiplies each doc into ~|text| rows, so the input is
    widened to cluster parallelism first (no-op on already-wide scans).
    """
    df = ensure_parallelism(df.select(id_col, text_col))
    seq = F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (n - 1), F.lit(1)))
    grams = F.transform(seq, lambda i: F.col(text_col).substr(i, F.lit(n)))
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per duplicate group.

    groupBy + min is a partial-aggregatable shuffle (beats a window over
    the text column at scale: no sort, map-side combine)."""
    keep = df.groupBy(*cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*cols, id_col], how="left_semi")


def exact_dup_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Duplicate-group summary: one row per distinct content with its
    cardinality and representative id."""
    return df.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, bands: int = 8
) -> DataFrame:
    """One-hash-per-band MinHash: band b takes the min over shingles of an
    8-hex-char slice of md5(group || '|' || shingle), where group = b // 4
    — one md5 call feeds 4 bands (32 hex chars / 8), a 4x cut in hashing
    cost vs one md5 per band, with 32 bits of entropy per band. Each band
    is still an independent min-wise sample. Equivalent to banding a
    k=bands signature with rows-per-band=1.

    Output: (id, band, mh) — 'bands' rows per doc after the unpivot.
    """
    sh = char_shingles(df, text_col, id_col, n)

    def mh(b):
        g = F.md5(F.concat(F.lit(str(b // 4)), F.lit("|"), F.col("shingle")))
        return F.min(F.substring(g, (b % 4) * 8 + 1, 8)).alias(f"mh{b}")

    sig = sh.groupBy(id_col).agg(*[mh(b) for b in range(bands)])
    pairs = ", ".join(f"{b}, mh{b}" for b in range(bands))
    return sig.selectExpr(id_col, f"stack({bands}, {pairs}) as (band, mh)")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    bands: int = 8,
    min_bands: int = 1,
    max_bucket: int | None = None,
    cache: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing the min-hash in at
    least `min_bands` bands. The join is keyed on (band, mh) — an LSH
    bucket join whose fan-out is bounded by bucket sizes, not n^2.

    `max_bucket` is the skew guard for 100 TB runs: a duplicate GROUP of
    k docs puts all k in the same bucket in every band, yielding k^2
    pairs per band. Capping drops buckets larger than `max_bucket` before
    the self-join (exact duplicates should be removed by `exact_dedup`
    first — the cheap groupBy — so near-dup banding never re-discovers
    them; near-dup buckets stay small). None = exact (oracle) mode.

    `cache` persists the signature table (MEMORY_AND_DISK) so the
    shingle+md5+min pipeline runs once instead of once per self-join
    side. Default OFF: measured on the documents bench it only wins when
    the cache fits comfortably (isolated runs); under storage-memory
    pressure from other cached tables it thrashes and loses badly. Turn
    on for interactive reuse; caller owns eviction
    (`spark.catalog.clearCache()`).
    """
    sig = minhash_signatures(df, text_col, id_col, n, bands)
    if cache:
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    if max_bucket is not None:
        small = (
            sig.groupBy("band", "mh")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") <= max_bucket)
            .select("band", "mh")
        )
        sig = sig.join(small, on=["band", "mh"], how="left_semi")
    a = sig.alias("a")
    b = sig.alias("b")
    matched = (
        a.join(b, on=["band", "mh"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("band"),
        )
    )
    return (
        matched.groupBy("id_a", "id_b")
        .agg(F.countDistinct("band").alias("n_bands"))
        .where(F.col("n_bands") >= min_bands)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
    cache: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Inverted-index self-join: |A ∩ B| counted by joining on shingle,
    |A ∪ B| = |A| + |B| - |A ∩ B|. `max_df` (document frequency cap)
    is the skew guard for 100 TB runs; leave None for oracle-exact runs.

    `cache` persists the (filtered) shingle table, which this plan
    otherwise recomputes three times (both self-join sides + the size
    table). Default OFF — wins only when the exploded shingle table fits
    in storage memory (isolated interactive runs); at corpus scale or
    alongside other cached tables, recomputing the scan-side explode is
    cheaper than spilling a multiple-of-corpus-size cache. Caller owns
    eviction."""
    sh = char_shingles(df, text_col, id_col, n)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_cnt"))
            .where(F.col("df_cnt") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    if cache:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        a.join(b, on="shingle")
        .where(F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}"))
        .groupBy(
            F.col(f"sa.{id_col}").alias("id_a"),
            F.col(f"sb.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _md5_bit(col, j):
    """Bit j (0 = MSB of first hex nibble) of md5(col), via portable
    hex-nibble arithmetic (conv in Spark, instr-based in the oracle)."""
    nibble = F.conv(F.substring(F.md5(col), j // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, 3 - (j % 4)).bitwiseAND(F.lit(1))


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """SimHash fingerprint over distinct whitespace tokens.

    For each bit j: sign of sum over tokens of (2*bit_j(md5(token)) - 1);
    fingerprint = sum of set bits << j. Pure Column arithmetic -> the
    whole computation is one explode + one groupBy (map-side combinable).
    """
    df = ensure_parallelism(df.select(id_col, text_col))
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            )
        ).alias("tok"),
    )
    contribs = [
        F.sum(_md5_bit(F.col("tok"), j) * 2 - 1).alias(f"s{j}") for j in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*contribs)
    fp = None
    for j in range(bits):
        bit = (F.col(f"s{j}") > 0).cast("long") * F.lit(2**j).cast("long")
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-generated by
    banding the fingerprint into (max_hamming+1) blocks (pigeonhole: any
    pair within distance k agrees on >= 1 of k+1 blocks).

    The blocks are unpivoted to (block_idx, block_val) rows and matched in
    ONE join keyed on both — one shuffle of (k+1)*n rows instead of k+1
    separate self-joins (same volume, 1/(k+1) the stage barriers)."""
    fps = simhash(df, text_col, id_col, bits)
    nblocks = max_hamming + 1
    block_bits = bits // nblocks
    blocks = [
        F.shiftright(F.col("simhash"), i * block_bits)
        .bitwiseAND(F.lit((1 << block_bits) - 1))
        .alias(f"blk{i}")
        for i in range(nblocks)
    ]
    pairs = ", ".join(f"{i}, blk{i}" for i in range(nblocks))
    stacked = fps.select(id_col, "simhash", *blocks).selectExpr(
        id_col, "simhash", f"stack({nblocks}, {pairs}) as (bi, blk)"
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    cands = (
        a.join(b, on=["bi", "blk"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
    )
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def cosine(a, b):
    """Cosine similarity of two array<double> Columns — sequential fold,
    same accumulation order as the DuckDB oracle."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def embedding_near_dup_lsh(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 4,
    bands: int = 3,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-random-
    projection LSH — the 100 TB path.

    Candidate generation: `bands` independent plane-sets; each vector gets
    one bucket id per band (pure Column math, plane coefficients folded
    into the plan as literals). Docs sharing a bucket in ANY band become a
    candidate pair — a single equi-join keyed on (band, bucket) over the
    stacked (id, band, bucket) rows, never an n^2 cross join. Exact-cosine
    refine joins the two vectors back BY ID (so the wide embedding arrays
    never travel through the bucket shuffle) and keeps pairs >= threshold.

    Recall is probabilistic (P[miss] = prod over bands of
    (1 - (1 - theta/pi)^n_planes)); raise `bands` or lower `n_planes` to
    trade cost for recall. The deterministic seeded planes make the whole
    computation reproducible and oracle-checkable engine-to-engine.
    """
    import numpy as np

    from henbun_spark.operators.similarity import lsh_bucket

    e = ensure_parallelism(
        df.select(F.col(id_col), F.col(emb_col).cast("array<double>").alias("vec"))
    )
    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    planes = np.random.default_rng(seed).standard_normal((bands, n_planes, dim))
    with_buckets = e
    for bi in range(bands):
        with_buckets = lsh_bucket(with_buckets, "vec", planes[bi], out=f"b{bi}")
    pairs_expr = ", ".join(f"{bi}, b{bi}" for bi in range(bands))
    stacked = with_buckets.selectExpr(
        id_col, f"stack({bands}, {pairs_expr}) as (band, bucket)"
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    cands = (
        a.join(b, on=["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ea = e.select(F.col(id_col).alias("id_a"), F.col("vec").alias("vec_a"))
    eb = e.select(F.col(id_col).alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        cands.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cosine(F.col("vec_a"), F.col("vec_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame, emb_col: str, id_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force O(n^2) — correct
    baseline; see `embedding_near_dup_lsh` for the LSH-bucketed
    scale path)."""
    e = ensure_parallelism(
        df.select(F.col(id_col), F.col(emb_col).cast("array<double>").alias("vec"))
    )
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
