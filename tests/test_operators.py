"""Pipeline operators on the real testdata tables, cross-checked against
DuckDB where the semantics claim oracle-exactness.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from henbun_spark import sources
from henbun_spark.operators import dedup, multimodal, relational, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return sources.load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return sources.load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in sources.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_char_shingles_match_duckdb(docs, duck, sf_dir):
    got = (
        dedup.char_shingles(docs, "text", "doc_id", n=5)
        .groupBy("doc_id")
        .count()
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duck.sql(
        """
        SELECT doc_id, count(DISTINCT substr(text, i, 5)) AS count
        FROM (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text)-4, 1))) AS i
              FROM documents)
        GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    np.testing.assert_array_equal(got["count"].to_numpy(), exp["count"].to_numpy())


def test_exact_dedup(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 4], "text": ["aa", "bb", "aa", "aa"]})
    )
    out = dedup.exact_dedup(df, ["text"], "id").orderBy("id").toPandas()
    assert list(out["id"]) == [1, 2]
    groups = dedup.exact_dup_groups(df, ["text"], "id").orderBy("keep_id").toPandas()
    assert list(groups["n_dups"]) == [3, 1]


def test_minhash_lsh_pairs_runs_and_is_symmetric_free(docs):
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", n=8, bands=4).toPandas()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert (pairs["n_bands"] >= 1).all()


def test_ngram_jaccard_matches_bruteforce(docs, duck):
    got = (
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=5, threshold=0.35)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    exp = duck.sql(
        """
        WITH sh AS (
          SELECT DISTINCT doc_id, substr(text, i, 5) AS s
          FROM (SELECT doc_id, text,
                  unnest(generate_series(1, greatest(length(text)-4,1))) AS i
                FROM documents)
        ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, c::DOUBLE / (za.sz + zb.sz - c) AS jaccard
        FROM common JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
        WHERE c::DOUBLE / (za.sz + zb.sz - c) >= 0.35
        ORDER BY id_a, id_b
        """
    ).df()
    assert len(got) == len(exp)
    if len(got):
        np.testing.assert_array_equal(got["id_a"].to_numpy(), exp["id_a"].to_numpy())
        np.testing.assert_allclose(
            got["jaccard"].to_numpy(), exp["jaccard"].to_numpy(), atol=1e-12
        )


def test_simhash_matches_duckdb(docs, duck):
    got = dedup.simhash(docs, "text", "doc_id", bits=8).orderBy("doc_id").toPandas()
    bit_exprs = []
    for j in range(8):
        nib = f"(instr('0123456789abcdef', substr(md5(tok), {j // 4 + 1}, 1)) - 1)"
        bit = f"(({nib} >> {3 - j % 4}) & 1)"
        bit_exprs.append(f"CASE WHEN sum(2*{bit}-1) > 0 THEN {1 << j} ELSE 0 END")
    exp = duck.sql(
        f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, tok
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok <> ''
        )
        SELECT doc_id, ({' + '.join(bit_exprs)})::BIGINT AS simhash
        FROM toks GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    np.testing.assert_array_equal(
        got["simhash"].to_numpy(), exp["simhash"].to_numpy()
    )


def test_simhash_near_pairs_hamming_correct(docs):
    out = dedup.simhash_near_pairs(docs, "text", "doc_id", bits=16, max_hamming=3)
    pdf = out.toPandas()
    assert (pdf["hamming"] <= 3).all()


def test_embedding_near_dup_and_cosine_vs_numpy(emb):
    pdf = emb.orderBy("vec_id").limit(50).toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    got = (
        dedup.embedding_near_dup_pairs(emb.limit(50), "embedding", "vec_id", -1.1)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    expected = sims[np.triu_indices(50, k=1)]
    np.testing.assert_allclose(got["cos"].to_numpy(), expected, atol=1e-6)


def test_cosine_topk_matches_numpy(emb):
    queries = emb.where(F.col("vec_id") < 5)
    got = similarity.cosine_topk(emb, queries, k=3).toPandas()
    pdf = emb.orderBy("vec_id").toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        s = sims[q].copy()
        s[q] = -np.inf
        expect = set(np.argsort(-s)[:3])
        gotset = set(got[got["query_id"] == q]["neighbor_id"])
        assert gotset == expect, (q, gotset, expect)


def test_ann_topk_recall(emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    approx = similarity.ann_topk(emb, queries, k=5, n_planes=4).toPandas()
    exact_set = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    approx_set = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy()))
    recall = len(exact_set & approx_set) / len(exact_set)
    # random gaussian embeddings are LSH's worst case (top-k cosines are
    # barely above 0): with 4 planes the chance-level recall is ~1/16;
    # assert we beat chance by >2x (structured embeddings score far higher)
    assert recall > 0.08, recall


def test_ann_topk_multiprobe_improves_recall(emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    exact_set = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))

    def recall(probe):
        approx = similarity.ann_topk(
            emb, queries, k=5, n_planes=4, probe_hamming=probe
        ).toPandas()
        got = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy()))
        return len(exact_set & got) / len(exact_set)

    r0, r1 = recall(0), recall(1)
    # probing the n_planes adjacent buckets is a strict candidate superset
    assert r1 >= r0
    assert r1 > 0.2, (r0, r1)


def test_embedding_near_dup_lsh_subset_of_brute_force(emb):
    sub = emb.where(F.col("vec_id") < 100)
    brute = dedup.embedding_near_dup_pairs(sub, "embedding", "vec_id", 0.2).toPandas()
    lsh = dedup.embedding_near_dup_lsh(
        sub, "embedding", "vec_id", threshold=0.2, n_planes=4, bands=3, seed=7
    ).toPandas()
    brute_set = set(map(tuple, brute[["id_a", "id_b"]].to_numpy()))
    lsh_set = set(map(tuple, lsh[["id_a", "id_b"]].to_numpy()))
    # every LSH pair is a true above-threshold pair (refine is exact)...
    assert lsh_set <= brute_set
    # ...and banding finds a nontrivial share of them on worst-case
    # (random) embeddings
    assert len(lsh_set) > 0.1 * len(brute_set), (len(lsh_set), len(brute_set))


def test_text_operators_deterministic(docs, duck):
    got = (
        text.fingerprint(text.quality_score(text.token_stats(docs)))
        .select("doc_id", "n_tokens", "quality", "fingerprint")
        .orderBy("doc_id")
        .toPandas()
    )
    exp = duck.sql(
        """
        SELECT doc_id,
          len(list_filter(string_split(text, ' '), t -> t <> ''))::INT AS n_tokens,
          list_reduce(
            list_transform(generate_series(1, greatest(length(text),1)), i -> ascii(substr(text, i, 1))::BIGINT),
            (acc, c) -> (acc * 31 + c) % 2147483647
          ) AS fingerprint
        FROM documents ORDER BY doc_id
        """
    ).df()
    np.testing.assert_array_equal(got["n_tokens"].to_numpy(), exp["n_tokens"].to_numpy())
    assert got["quality"].between(0, 1).all()
    # rolling hash: duckdb list_reduce has no init -> first element is seed;
    # fold(acc0=0) == fold starting from first elem since 0*31+c0 = c0
    np.testing.assert_array_equal(
        got["fingerprint"].to_numpy(), exp["fingerprint"].to_numpy()
    )


def test_lang_id_runs(docs):
    out = text.lang_id(docs).groupBy("pred_lang").count().toPandas()
    assert out["count"].sum() == docs.count()


def test_asof_join_matches_duckdb(spark, duck, sf_dir):
    ev = sources.load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id").where(F.col("event_type") == "click")
    right = ev.select(
        "user_id", "ts", F.col("value").alias("last_value")
    ).where(F.col("event_type") == "purchase")
    got = (
        relational.asof_join(left, right, on="ts", by="user_id", right_cols=["last_value"])
        .orderBy("event_id")
        .toPandas()
    )
    exp = duck.sql(
        """
        SELECT l.event_id, r.value AS last_value
        FROM (SELECT * FROM events WHERE event_type='click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
        """
    ).df()
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        got["last_value"].fillna(-1).to_numpy(),
        exp["last_value"].fillna(-1).to_numpy(),
        atol=1e-9,
    )


def test_asof_join_forward_matches_duckdb(spark, duck, sf_dir):
    ev = sources.load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id").where(F.col("event_type") == "click")
    right = ev.select(
        "user_id", "ts", F.col("value").alias("next_value")
    ).where(F.col("event_type") == "purchase")
    got = (
        relational.asof_join(
            left, right, on="ts", by="user_id", right_cols=["next_value"],
            direction="forward",
        )
        .orderBy("event_id")
        .toPandas()
    )
    exp = duck.sql(
        """
        SELECT l.event_id, r.value AS next_value
        FROM (SELECT * FROM events WHERE event_type='click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r
          ON l.user_id = r.user_id AND l.ts <= r.ts
        ORDER BY l.event_id
        """
    ).df()
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        got["next_value"].fillna(-1).to_numpy(),
        exp["next_value"].fillna(-1).to_numpy(),
        atol=1e-9,
    )


def test_sessionize(spark, sf_dir):
    ev = sources.load_table(spark, sf_dir, "events")
    out = relational.sessionize(ev, gap_minutes=30)
    pdf = out.select("user_id", "ts", "session_seq").orderBy("user_id", "ts").toPandas()
    one = pdf[pdf["user_id"] == pdf["user_id"].iloc[0]]
    gaps = one["ts"].diff().dt.total_seconds().fillna(1e9)
    expected = (gaps > 1800).cumsum()
    np.testing.assert_array_equal(one["session_seq"].to_numpy(), expected.to_numpy())


def test_top_k_per_group(spark, sf_dir):
    li = sources.load_table(spark, sf_dir, "lineitem")
    out = relational.top_k_per_group(
        li, ["l_returnflag"], "l_extendedprice", 3, tiebreak="l_orderkey"
    ).toPandas()
    assert (out.groupby("l_returnflag").size() <= 3).all()


def test_range_join_bucketed(spark):
    import pandas as pd

    left = spark.createDataFrame(pd.DataFrame({"v": [1.0, 5.0, 9.5, 20.0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"lo": [0.0, 8.0], "hi": [2.0, 10.0], "tag": ["a", "b"]})
    )
    out = relational.range_join_bucketed(left, right, "v", "lo", "hi", 4.0).toPandas()
    assert set(map(tuple, out[["v", "tag"]].to_numpy())) == {(1.0, "a"), (9.5, "b")}


def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, n=32, kind="image")
    feats = multimodal.decode_and_featurize(media, dim=8)
    pdf = feats.toPandas()
    assert len(pdf) == 32
    assert all(len(f) == 8 for f in pdf["feature"])
    # determinism: same payload -> same features
    again = multimodal.decode_and_featurize(media, dim=8).toPandas()
    f0 = np.stack(pdf.sort_values("media_id")["feature"].to_numpy())
    f1 = np.stack(again.sort_values("media_id")["feature"].to_numpy())
    np.testing.assert_array_equal(f0, f1)
    # strict mode surfaces the codec boundary
    with pytest.raises(Exception):
        multimodal.decode_and_featurize(media, strict=True).collect()


def test_frame_sample(spark):
    media = multimodal.synthesize_media(spark, n=4, kind="audio").withColumn(
        "kind", F.lit("video")
    )
    out = multimodal.frame_sample(media, every_ms=500).toPandas()
    assert len(out) == 4 * 4  # duration 1500ms -> offsets 0,500,1000,1500
