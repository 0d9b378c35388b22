"""Similarity search over embedding columns (`array<float>`).

* `cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set, one scan over the corpus, per-query window rank. The correct
  baseline and the oracle-checkable path.
* `ann_topk` — sign-random-projection LSH: deterministic hyperplanes
  (seeded), bucket join, rank within bucket. The 100 TB path: candidate
  set per query is one bucket (+ optional multi-probe), never the corpus.
* `ivf_topk` — inverted-file index: k-means coarse quantizer (trained on
  a driver-side sample — centroids are small), corpus partitioned by
  nearest centroid, queries probe the `nprobe` nearest cells. Candidate
  volume ~ nprobe/k of the corpus regardless of dimensionality — the
  standard alternative when LSH buckets split true neighbors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from henbun_spark.operators._parallel import ensure_parallelism
from henbun_spark.operators.dedup import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Plan shape: broadcast(queries) crossJoin corpus -> Column-only cosine
    -> window rank. One shuffle (by query_id for the rank), corpus scanned
    once regardless of |queries|.
    """
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("cvec"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qvec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def normalize_and_quantize(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Embedding hygiene for storage/serving: L2 norm, unit-normalized
    vector, symmetric int8 quantization (scale = max|x| / 127), and the
    L2 reconstruction error. Pure per-row Column arithmetic — zero
    shuffle, codegen-friendly, linear in corpus size at any scale.

    Output: id, l2_norm, unit (array<double>), scale, q (array<int>,
    values in [-127, 127]), recon_err.
    """
    df = ensure_parallelism(df)
    vec = F.col(emb_col).cast("array<double>")
    l2 = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(vec, lambda x: x / F.greatest(l2, F.lit(1e-12)))
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)
    q = F.transform(vec, lambda x: F.round(x / scale, 0).cast("int"))
    err = F.sqrt(
        F.aggregate(
            F.zip_with(vec, q, lambda x, qi: (x - qi * scale) * (x - qi * scale)),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    return df.select(
        F.col(id_col),
        l2.alias("l2_norm"),
        unit.alias("unit"),
        scale.alias("scale"),
        q.alias("q"),
        err.alias("recon_err"),
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, emb_col: str, planes: np.ndarray, out: str = "bucket"):
    """Sign-random-projection bucket id as pure Column arithmetic: for each
    plane p, bit = (sum_i v[i]*p[i] > 0); bucket = Σ bit<<j. The plane
    coefficients are literals folded into the plan (no UDF, no broadcast
    needed for <=32 planes x few hundred dims)."""
    vec = F.col(emb_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
        )
        bucket = bucket + (dot > 0).cast("long") * F.lit(1 << j).cast("long")
    return df.withColumn(out, bucket)


def lsh_density_scores(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 5,
    bands: int = 3,
    seed: int = 7,
    out: str = "density",
) -> DataFrame:
    """LSH-bucket DENSITY score per vector — the density-based outlier
    signal (semantic-space junk, mislabeled embeddings, encoder
    failures) at 100-TB cost: for each of ``bands`` independent
    sign-random-projection banks, count how many corpus vectors share
    the point's bucket; score = the exact integer SUM of its own
    bucket's size across banks. A point that lands in sparse buckets
    under EVERY projection has no dense neighborhood under any of them
    — the k-distance/LOF intuition without any kNN pair join: two
    scans + a <= bands * 2^n_planes-row broadcast, map-side-combinable
    counts, integer arithmetic (hash-checkable). Complements
    `selection.emb_label_outliers` (centroid DISTANCE, needs labels);
    this one is label-free and catches multi-cluster sparsity that a
    single-centroid distance misses.

    Plane convention matches the repo's LSH oracles: coefficients from
    ``default_rng(seed).standard_normal((bands, n_planes, dim))``
    folded into the plan as literals, sequential-fold dot products.
    """
    dim = len(df.select(emb_col).first()[0])
    planes = np.random.default_rng(seed).standard_normal(
        (bands, n_planes, dim)
    )
    with_buckets = df.select(F.col(id_col), F.col(emb_col))
    for bi in range(bands):
        with_buckets = lsh_bucket(
            with_buckets, emb_col, planes[bi], out=f"__b{bi}"
        )
    st = with_buckets.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.col(f"__b{bi}").alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("e"),
    ).select(id_col, F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket"))
    sizes = st.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("sz"))
    return (
        st.join(F.broadcast(sizes), on=["band", "bucket"])
        .groupBy(id_col)
        .agg(F.sum("sz").cast("long").alias(out))
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket (+ multi-probe).

    `probe_hamming` is the recall knob: each query additionally probes
    every bucket within that Hamming distance of its own (bit-flip masks
    are plan-time literals; the query side explodes into
    sum_{h<=probe_hamming} C(n_planes, h) probe rows). A neighbor lives in
    exactly one bucket, so probes never duplicate a (query, neighbor)
    pair. probe_hamming=1 recovers most neighbors lost to a single
    marginal hyperplane at ~(n_planes+1)x the (small) query-side join
    fan-out — the corpus is never rescanned.
    """
    from itertools import combinations

    if dim is None:
        dim = len(corpus.select(emb_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    masks = [0]
    for h in range(1, probe_hamming + 1):
        for flip in combinations(range(n_planes), h):
            masks.append(sum(1 << j for j in flip))
    c = lsh_bucket(
        ensure_parallelism(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(emb_col).cast("array<double>").alias("cvec"),
            )
        ),
        "cvec",
        planes,
    )
    q = lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).cast("array<double>").alias("qvec"),
        ),
        "qvec",
        planes,
    )
    if len(masks) > 1:
        q = q.withColumn(
            "bucket",
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
                )
            ),
        )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Tiny numpy k-means (cosine-normalized spherical variant) for the
    IVF coarse quantizer. Runs on a driver-side SAMPLE — centroids are
    k x dim, small regardless of corpus size."""
    rng = np.random.default_rng(seed)
    unit = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    centroids = unit[rng.choice(len(unit), size=k, replace=False)]
    for _ in range(iters):
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = unit[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def train_coarse_quantizer(
    corpus: DataFrame,
    emb_col: str,
    id_col: str,
    n_cells: int,
    train_sample: int,
    seed: int,
) -> np.ndarray:
    """Deterministic IVF quantizer training shared by the batch and
    streaming index paths. Training rows drawn by hash-of-id order, NOT
    .limit(): limit takes rows from the first partition(s), so on
    sorted/clustered data the centroids would be unrepresentative.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-k, driver merge) — bounded and deterministic regardless of
    layout."""
    sample_rows = (
        corpus.select(
            F.col(emb_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
        )
        .orderBy("__h")
        .limit(train_sample)
        .toPandas()["v"]
    )
    return _kmeans_fit(
        np.stack(sample_rows.to_numpy()),
        k=min(n_cells, len(sample_rows)),
        seed=seed,
    )


def _nearest_centroid_col(vec_col, centroids: np.ndarray, top: int = 1):
    """Column expr: index (or array of indices) of the nearest centroid(s)
    by dot product on the L2-normalized vector. Centroid coefficients are
    plan-time literals (same pattern as lsh_bucket)."""
    vec = vec_col
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda a, v: a + v * v)
    )
    dots = []
    for c in centroids:
        arr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v
        )
        dots.append(d / F.greatest(norm, F.lit(1e-12)))
    scored = F.array(*[
        F.struct(d.alias("dot"), F.lit(i).alias("idx")) for i, d in enumerate(dots)
    ])
    ranked = F.reverse(F.array_sort(scored))
    if top == 1:
        return ranked[0]["idx"]
    return F.slice(F.transform(ranked, lambda s: s["idx"]), 1, top)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    train_sample: int = 2000,
    seed: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus rows keyed by nearest-centroid cell,
    queries exploded over their `nprobe` nearest cells, equi-join on cell,
    exact cosine + window rank within candidates.

    Scale shape: the quantizer trains on a bounded driver sample (k-means
    over <= train_sample rows); assignment is pure Column math with
    centroid literals; the join is hash-keyed on cell id — candidates per
    query are ~nprobe/n_cells of the corpus, never all of it.
    """
    centroids = train_coarse_quantizer(
        corpus, emb_col, id_col, n_cells, train_sample, seed
    )
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("cvec"),
        )
    )
    c = c.withColumn("cell", _nearest_centroid_col(F.col("cvec"), centroids))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qvec"),
    )
    q = q.withColumn(
        "cell",
        F.explode(_nearest_centroid_col(F.col("qvec"), centroids, top=nprobe)),
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _pq_train(sample: np.ndarray, m_sub: int, n_codes: int, seed: int = 0):
    """Train per-subspace codebooks on an L2-normalized driver sample:
    split dim into ``m_sub`` contiguous blocks, plain Euclidean k-means
    (`n_codes` centroids) in each block. Returns (m_sub, n_codes, d_sub)."""
    unit = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    d = unit.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    d_sub = d // m_sub
    rng = np.random.default_rng(seed)
    books = []
    for m in range(m_sub):
        block = unit[:, m * d_sub : (m + 1) * d_sub]
        cents = block[rng.choice(len(block), size=n_codes, replace=False)]
        for _ in range(10):
            d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = block[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return np.stack(books)  # (m_sub, n_codes, d_sub)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    m_sub: int = 8,
    n_codes: int = 16,
    refine: int = 32,
    train_sample: int = 2000,
    seed: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): corpus vectors
    compress to ``m_sub`` one-byte codes (here 64 float dims -> 8 codes,
    a 32x memory cut — the knob that lets a 100 TB embedding corpus fit
    a cluster's RAM); queries score candidates by asymmetric distance
    (ADC): per-query lookup tables of subspace dot products, so a
    candidate costs ``m_sub`` table reads instead of a d-dim dot.

    Plan shape: codebooks train on a bounded driver sample (hash-ordered
    TakeOrderedAndProject, same as `ivf_topk`); encoding is ONE
    Arrow-batched pandas UDF pass (numpy argmin per subspace, no
    shuffle); ADC scoring is a second map-only pass emitting one score
    array per row (luts are a broadcast closure); the only shuffle is
    the per-query top-`refine` rank, after which the survivors join back
    to their raw vectors for an exact cosine re-rank to ``k`` (the
    recall-recovery step — ADC orders candidates, exact math orders the
    answer).
    """
    from pyspark.sql.pandas.functions import pandas_udf

    sample_rows = (
        corpus.select(
            F.col(emb_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
        )
        .orderBy("__h")
        .limit(train_sample)
        .toPandas()["v"]
    )
    books = _pq_train(
        np.stack(sample_rows.to_numpy()), m_sub=m_sub, n_codes=n_codes, seed=seed
    )
    d_sub = books.shape[2]

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        x = np.stack(vs.to_numpy()).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m_sub), dtype=np.int32)
        for m in range(m_sub):
            block = x[:, m * d_sub : (m + 1) * d_sub]
            d2 = ((block[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    q_pdf = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qvec"),
    ).toPandas()
    qmat = np.stack(q_pdf["qvec"].to_numpy()).astype(np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # luts[q, m, c] = dot(q_block_m, centroid[m][c]); ADC score = sum_m lut
    luts = np.einsum(
        "qmd,mcd->qmc", qmat.reshape(len(qmat), m_sub, d_sub), books
    )
    qids = [int(x) for x in q_pdf["query_id"]]

    @pandas_udf("array<double>")
    def adc(codes: pd.Series) -> pd.Series:
        cm = np.stack(codes.to_numpy())  # (n, m_sub)
        idx = np.arange(m_sub)
        scores = np.stack(
            [luts[q][idx, cm].sum(axis=1) for q in range(len(luts))], axis=1
        )
        return pd.Series(list(scores))

    enc = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(emb_col).cast("array<double>").alias("cvec"),
        )
    ).withColumn("codes", encode(F.col("cvec")))
    scored = (
        enc.withColumn("s", adc(F.col("codes")))
        .select(
            "neighbor_id",
            "cvec",
            F.posexplode("s").alias("qidx", "adc_score"),
        )
        .withColumn(
            "query_id",
            F.element_at(F.array(*[F.lit(q) for q in qids]), F.col("qidx") + 1),
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    cands = scored.withColumn("crank", F.row_number().over(w)).where(
        F.col("crank") <= refine
    )
    qlit = F.element_at(
        F.array(
            *[
                F.array(*[F.lit(float(v)) for v in qmat[i]])
                for i in range(len(qmat))
            ]
        ),
        F.col("qidx") + 1,
    )
    rer = cands.select(
        "query_id",
        "neighbor_id",
        cosine(qlit, F.col("cvec")).alias("cos"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_index_write_stream(
    stream: DataFrame,
    centroids: np.ndarray,
    index_dir: str,
    checkpoint_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Incremental IVF index maintenance on a stream: each arriving
    vector is assigned its coarse cell (pure Column math — centroid
    coefficients are plan-time literals, no Python in the hot path) and
    APPENDED to a cell-partitioned parquet index. No rewrite, no state:
    the index grows by partition-local appends, and `ivf_index_search`
    prunes to the probed cells at scan time. The quantizer is trained
    once up front (`_kmeans_fit` on a bounded sample) — the standard
    vector-index recipe where re-training is an offline rebuild, not a
    streaming concern. Returns the StreamingQuery."""
    assigned = stream.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).cast("array<double>").alias("cvec"),
    ).withColumn("cell", _nearest_centroid_col(F.col("cvec"), centroids))
    return (
        assigned.writeStream.format("parquet")
        .partitionBy("cell")
        .option("path", index_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def ivf_index_search(
    spark,
    index_dir: str,
    centroids: np.ndarray,
    queries: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Serve top-k from a cell-partitioned IVF index: queries probe
    their `nprobe` nearest cells, the scan prunes to those PARTITION
    DIRECTORIES (an `IN` filter on the partition column — the physical
    payoff of the partitioned layout: untouched cells are never read),
    then exact cosine + rank within the candidates."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).cast("array<double>").alias("qvec"),
    ).withColumn(
        "cell",
        F.explode(_nearest_centroid_col(F.col("qvec"), centroids, top=nprobe)),
    )
    probe_cells = [int(r["cell"]) for r in q.select("cell").distinct().collect()]
    index = spark.read.parquet(index_dir).where(F.col("cell").isin(probe_cells))
    scored = (
        index.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
