"""Text-analysis operators over the `documents` table: tokenization stats,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (whole-stage codegen; zero Python in the data
path) built from engine-portable primitives so every operator has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from henbun_spark.operators._parallel import ensure_parallelism

#: the single scaffold slot for `shingle_tfidf_cosine_topk` — bounds the
#: session-lifetime cache pin for callers who never release scaffolds.
_TFIDF_SCAFFOLD = None

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# marker-token vocabularies for the n-gram/lexicon language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
    "zh": ["de", "shi", "zai", "le", "he"],
}

PUNCT_CHARS = ".,!?;:"


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count, distinct-token count, mean token length —
    the cheap token-budget estimator for corpus sizing."""
    df = ensure_parallelism(df)
    toks = _tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "avg_token_len": (
                F.length(F.regexp_replace(F.col(text_col), " ", ""))
                / F.greatest(F.size(toks), F.lit(1))
            ),
        }
    )


def bpe_ish_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token estimate: words + ceil(chars/4) blend, the usual
    LLM-budget heuristic when no tokenizer is available. Deterministic and
    oracle-exact."""
    toks = _tokens(text_col)
    est = F.size(toks) + F.ceil(F.length(F.col(text_col)) / F.lit(16)).cast("int")
    return df.withColumn("token_estimate", est)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]:
    0.4 * length_score (chars/500 capped)
    + 0.3 * (1 - punct_ratio)          (punct chars per char)
    + 0.3 * stopword_score (stopword fraction of tokens, capped at 0.5, x2)
    """
    df = ensure_parallelism(df)
    toks = _tokens(text_col)
    n_chars = F.length(F.col(text_col))
    punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), f"[{PUNCT_CHARS}]", "")
    )
    sw_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_score = F.least(
        n_stop / F.greatest(F.size(toks), F.lit(1)) / F.lit(0.5), F.lit(1.0)
    )
    return df.withColumn(
        "quality",
        F.lit(0.4) * length_score + F.lit(0.3) * (1 - punct_ratio) + F.lit(0.3) * stop_score,
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexicon-vote language ID: score per language = number of marker-token
    occurrences; predicted language = argmax (alphabetical tie-break).
    A real corpus would use char-n-gram profiles; the plan shape (per-row
    Column arithmetic, no shuffle) is identical."""
    df = ensure_parallelism(df)
    toks = _tokens(text_col)
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    out = df
    for lang, sc in scores.items():
        out = out.withColumn(f"score_{lang}", sc)
    # argmax with deterministic alphabetical tie-break
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{la}") for la in langs])
    pred = None
    for la in langs:
        cond = F.col(f"score_{la}") == best
        pred = F.when(cond, F.lit(la)) if pred is None else pred.when(cond, F.lit(la))
    return out.withColumn("pred_lang", pred)


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smooth_idf), deterministic
    (score desc, term asc) tie-break.

    Plan shape for 100 TB: token explode -> (doc, term) partial-agg
    groupBy (map-side combinable) -> vocabulary-sized doc-frequency agg
    (small; AQE broadcasts it back) -> per-doc window rank. The corpus
    count N rides along as a broadcast 1-row cross join — no driver
    action, the whole plan stays lazy.
    """
    base = ensure_parallelism(df.select(id_col, text_col))
    toks = base.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    ndocs = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_t") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Intra-document repetition signals over token bigrams (the
    Gopher-style boilerplate filter): per doc, the fraction of bigram
    occurrences that are repeats (1 - distinct/total) and the share of
    the single most frequent bigram.

    Docs with fewer than 2 tokens yield no bigrams and drop out (no
    repetition evidence). One explode + two keyed aggregations, both
    partial-aggregatable; no joins.
    """
    base = ensure_parallelism(df.select(id_col, text_col))
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat(
            F.try_element_at(toks, i), F.lit(" "), F.try_element_at(toks, i + F.lit(1))
        ),
    )
    bg = base.select(
        F.col(id_col),
        F.explode(F.filter(grams, lambda g: g.isNotNull())).alias("bigram"),
    )
    per = bg.groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    return per.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double"),
            6,
        ).alias("dup_bigram_frac"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt").cast("double"), 6).alias(
            "top_bigram_frac"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Polynomial rolling hash of the full text, mod 2^31-1 (base 31):
    fp = fold(chars, 0, acc*31 + ascii(c) mod p). A compact content
    fingerprint for exact/near-exact dedup joins; exact DuckDB oracle via
    list_reduce."""
    df = ensure_parallelism(df)
    chars = F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)))
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 31 + F.ascii(F.col(text_col).substr(i, F.lit(1))))
        % F.lit(2147483647),
    )
    return df.withColumn(out, fp)


# (name, pattern, replacement) — patterns restricted to the regex subset
# shared by Java (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
# Redaction applies in list order; counts are measured on the RAW text.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """PII detection + redaction: per-doc match counts for each pattern
    family plus the text with every match replaced by its placeholder.

    Pure Column regexp work — zero shuffles, runs inside whole-stage
    codegen at the scan, so at 100 TB this is a map-only pass limited by
    read bandwidth. Patterns are ordered (email before ip before phone)
    so the redacted text is deterministic when families could overlap.

    Output: (id, n_email, n_ip, n_phone, redacted).
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def unigram_lm_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document cross-entropy under a unigram LM trained on the corpus
    itself — the CCNet/KenLM-style quality signal (low = in-distribution
    text, high = outliers), with the LM reduced to unigrams so the whole
    computation stays in two keyed shuffles.

    Pass 1 trains the LM: token counts (map-side combinable groupBy) and
    the corpus total via a bounded 1-row cross join. Pass 2 scores: join
    tokens to their log-probs keyed on the token (AQE picks broadcast
    when the vocab is small; natural-language vocabs at 100 TB are still
    tiny next to the token stream) and aggregate per doc.

    Determinism: log-probs are rounded to 6 decimals and summed as
    decimals (order-independent) before the final double division.

    Output: (id, n_tokens, xent) with xent = -mean log2-free ln-prob.
    """
    toks = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n"))
    lm = counts.crossJoin(F.broadcast(total)).select(
        "tok", (F.log("c") - F.log("n")).alias("logp")
    )
    return (
        toks.join(lm, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.round(F.col("logp"), 6).cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                * F.lit(-1.0)
            ).alias("xent"),
        )
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    "Scaling Language Models: ...", Appendix A1.1) as per-rule columns +
    an overall pass flag — the rule set most large-corpus pipelines start
    from. Document-level subset: the line-based rules (bullet/ellipsis
    line starts) are omitted because the corpus has no line structure;
    the word-count window, mean-word-length window, symbol ratios,
    alphabetic-word fraction, and stopword-presence rules are exact.

    Pure Column expressions end to end — a map-only pass that runs inside
    whole-stage codegen at the scan, shuffle-free at any scale.
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    n_words = F.size(words)
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = total_chars.cast("double") / n_words
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))
    ) / 3
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    )
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.array_contains(words, sw).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(n_hash / n_words, 6).alias("hash_ratio"),
        F.round(n_ellipsis / n_words, 6).alias("ellipsis_ratio"),
        F.round(alpha_words.cast("double") / n_words, 6).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("hash_ratio") < 0.1)
        & (F.col("ellipsis_ratio") < 0.3)
        & (F.col("alpha_word_frac") > 0.8)
        & (F.col("stop_hits") >= 2),
    )


def bigram_lm_score(
    df: DataFrame, text_col: str, id_col: str, lam: float = 0.7
) -> DataFrame:
    """Per-document cross-entropy under an interpolated bigram LM trained
    on the corpus itself: for each adjacent pair (w1, w2),
        p = lam * c(w1,w2)/c(w1,*) + (1-lam) * c(w2)/N
    and xent = -mean ln p over positions 2..n. The backoff term keeps
    every position finite, so no smoothing hyper-parameters beyond lam.

    Plan shape: ONE bigram explode feeds both the bigram table and (by
    re-grouping on w1) the context totals; the unigram table reuses the
    token explode. Scoring is three vocabulary-keyed joins (AQE
    broadcasts the small sides) + one per-doc aggregation —
    decimal-exact, order-independent.
    """
    base = ensure_parallelism(df.select(id_col, text_col))
    toks = _tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.struct(
            F.try_element_at(toks, i).alias("w1"),
            F.try_element_at(toks, i + F.lit(1)).alias("w2"),
        ),
    )
    bg = base.select(
        F.col(id_col),
        F.explode(F.filter(grams, lambda g: g["w2"].isNotNull())).alias("g"),
    ).select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    uni = base.select(F.explode(toks).alias("w2")).groupBy("w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    total = uni.agg(F.sum("c2").alias("n_total"))
    p = (
        F.lit(lam) * F.col("c12") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("c2") / F.col("n_total")
    )
    # deliberately NOT broadcast: c12/c1 derive from the same bigram
    # explode + (w1,w2) shuffle as the probe side, so sort-merge joins
    # let Catalyst REUSE that exchange (one explode, one shuffle feeds
    # all three) — measured 2x faster than broadcast hints, which force
    # each small table to materialize its own copy of the explode.
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), F.round(F.log(p), 6).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_positions"),
        (
            F.sum(F.col("lp").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(-1.0)
        ).alias("xent2"),
    )


def hashed_features(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    n_features: int = 1024,
    salt: str = "fh",
) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009): each
    (column, value) pair maps to index md5(salt|col|value) mod D with a
    sign bit from the next hash nibble — no vocabulary pass, no fitted
    state, so featurization is a pure map over the table at any scale
    and new categories never break the pipeline.

    Output: (id, idx array<int>, sign array<int>) — the sparse feature
    row. Engine-portable (md5 arithmetic), exactly reproducible.
    """
    idxs, signs = [], []
    for c in cols:
        h = F.md5(
            F.concat(
                F.lit(salt), F.lit("|"), F.lit(c), F.lit("|"),
                F.coalesce(F.col(c).cast("string"), F.lit("\x00")),
            )
        )
        idxs.append(
            (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % n_features)
            .cast("int")
        )
        signs.append(
            (
                F.conv(F.substring(h, 7, 1), 16, 10).cast("int") % 2 * 2 - 1
            ).cast("int")
        )
    return df.select(
        F.col(id_col), F.array(*idxs).alias("idx"), F.array(*signs).alias("sign")
    )


def chunk_with_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_chars: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Fixed-size overlapping text chunking (the RAG / context-window
    prep step): split each document into `chunk_chars`-character windows
    stepping by `chunk_chars - overlap`, preserving (doc, chunk_idx,
    char offset) lineage.

    Pure Column math — sequence + transform + posexplode inside codegen,
    zero shuffle: a 100 TB corpus chunks at full scan speed, and the
    fan-out multiplies rows inside the scan stage where AQE sizes
    downstream partitions by actual output bytes.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    n = F.greatest(
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(float(step))),
        F.lit(1),
    ).cast("int")
    starts = F.sequence(F.lit(0), n - 1)
    chunks = F.transform(
        starts,
        lambda i: F.substring(
            F.col(text_col), (i * step + 1).cast("int"), F.lit(chunk_chars)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    ).select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * step).alias("char_start"),
        "chunk",
        F.length("chunk").alias("chunk_len"),
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_expr,
    max_distance: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy self-join: candidate pairs whose `text_col` values
    are within `max_distance` Levenshtein edits, generated ONLY inside
    blocks (`block_expr` — e.g. the first token, a phonetic key, a
    length band), never all-pairs.

    The classic entity-resolution shape: blocking bounds candidates by
    sum(block_size^2) instead of n^2; the exact edit-distance check runs
    JVM-side (`F.levenshtein`, codegen) on the candidates only. Recall
    is bounded by the blocking key (pairs differing in the key are never
    compared) — standard multi-pass blocking stacks more keys via union.

    `max_block` is the degenerate-block guard for 100 TB runs: a FIXED-
    cardinality blocking key makes sum(block^2) quadratic in corpus
    size (the sf1 probe measured 121x time for 10x rows on first-token
    blocks over a 30-word vocabulary). When a block exceeds the cap it
    is deterministically SPLIT into ceil(size/max_block) sub-blocks by
    an md5 of the string itself (block splitting, the standard
    entity-resolution mitigation next to block purging) — candidate
    volume is then bounded by ~n * max_block (linear), identical-string
    pairs always co-block, and near-pairs split apart are the recall
    price the cap buys bounded work with. None = exact mode; at sizes
    below the cap the split is the identity, so results are unchanged
    wherever the cap doesn't bite.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        block_expr.alias("blk"),
    )
    if max_block is not None:
        counts = keyed.groupBy("blk").agg(F.count(F.lit(1)).alias("__n"))
        nsplit = F.ceil(F.col("__n") / F.lit(max_block)).cast("long")
        sub = F.pmod(
            F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("long"),
            nsplit,
        )
        keyed = (
            keyed.join(counts, "blk")
            .select(
                "id",
                "t",
                F.concat_ws("#", F.col("blk"), sub.cast("string")).alias(
                    "blk"
                ),
            )
        )
    a = keyed.select(F.col("blk"), F.col("id").alias("id_a"), F.col("t").alias("t_a"))
    b = keyed.select(F.col("blk"), F.col("id").alias("id_b"), F.col("t").alias("t_b"))
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("t_a", "t_b"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def shingle_tfidf_cosine_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 3,
    max_df: int = 1000,
    min_cos: float = 0.0,
) -> DataFrame:
    """Sparse lexical retrieval: top-k most similar documents per document
    by TF-IDF-weighted cosine over word n-gram shingles — the classic
    inverted-index "related documents" / lexical near-dup RANKER (vs the
    minhash/Jaccard family, which thresholds set overlap, this ranks by
    weighted cosine, so partial template overlap scores low and true
    rewrites score high).

    Plan shape for 100 TB (never an all-pairs join):
    * shingle explode -> (doc, shingle) tf partial-agg (map-side
      combinable);
    * doc-frequency agg over the vocabulary; shingles with df > `max_df`
      are DROPPED — the same skew guard as the minhash `max_df`: a
      boilerplate shingle shared by millions of docs would otherwise
      produce a df^2 candidate blowup on one shuffle key, and it carries
      ~zero IDF weight anyway (candidate volume is bounded by
      sum_t df_t^2 <= max_df * |postings|);
    * posting-list self-join keyed on shingle (hash shuffle on the
      shingle, fan-out bounded per key by the cap), per-pair dot product
      as a decimal(38,9) partial-agg of ROUND(w_a*w_b, 9) terms — sums
      of quantized products, so the result is independent of shuffle
      order and bit-identical across engines;
    * per-doc L2 norms (same quantized-decimal discipline) joined back
      keyed on doc id, cosine = dot/(norm_a*norm_b) rounded to 6;
    * one keyed window for the per-doc top-k (cos DESC, neighbor ASC).

    Weighting matches `tfidf_top_terms`: w = tf * (ln((N+1)/(df+1)) + 1)
    rounded to 6 (sklearn's smooth_idf). Pairs below `min_cos` are
    dropped before ranking. Output: (id, neighbor_id, cos, rank).

    NOTE: the weighted-postings scaffold is persisted and registered in
    `relational._SCAFFOLD_CACHES`; the bench/oracle/pytest harnesses
    release it after each query — direct library callers should call
    `relational.release_scaffold_caches()` after materializing the
    result (or wrap the call in `relational.scaffold_scope()`). Callers
    who do neither are still bounded: each call releases the previous
    call's scaffold, so at most ONE postings cache is pinned at a time.
    """
    base = ensure_parallelism(df.select(id_col, text_col))
    toks = _tokens(text_col)
    nw = F.size(toks)

    # a window running past the end must vanish, so null-check every part
    # (try_element_at: out-of-bounds -> NULL even under ANSI mode)
    def full_gram(i):
        parts = [F.try_element_at(toks, i + F.lit(j)) for j in range(n)]
        g = F.concat_ws(" ", *parts)
        ok = parts[0].isNotNull()
        for p in parts[1:]:
            ok = ok & p.isNotNull()
        return F.when(ok, g)

    grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(nw - F.lit(n - 1), F.lit(1))),
            lambda i: full_gram(i),
        ),
        lambda g: g.isNotNull(),
    )
    postings = base.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("shingle")
    )
    tf = postings.groupBy("id", "shingle").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .where(F.col("df_t") <= max_df)
    )
    ndocs = base.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    weighted = (
        tf.join(dfreq, "shingle")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "id",
            "shingle",
            "df_t",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df_t") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("w"),
        )
    )
    # four consumers (norms + both self-join sides + the rank join) pull
    # from `weighted`, and Spark's ReusedExchange does NOT fire across
    # them (verified: 16 re-executed explode subtrees = 16 corpus scans
    # without this) — materialize the weighted postings ONCE. Registered
    # in the shared scaffold-cache registry so bench/oracle harnesses
    # release it after each query; MEMORY_AND_DISK so a 100 TB posting
    # table spills instead of evicting (the materialize-once trade every
    # multi-pass indexer makes). Direct library callers who never call
    # release_scaffold_caches() are still bounded: each call releases
    # the PREVIOUS call's scaffold, so at most one postings cache is
    # ever pinned by this function (a held, not-yet-materialized result
    # from an earlier call simply recomputes without the cache).
    from pyspark.storagelevel import StorageLevel

    from henbun_spark.operators import relational as _rel

    global _TFIDF_SCAFFOLD
    prev = _TFIDF_SCAFFOLD
    if prev is not None:
        try:
            _rel._SCAFFOLD_CACHES.remove(prev)
        except ValueError:
            pass  # a harness already released it
        else:
            # best-effort: the scaffold may belong to a SparkSession that
            # has since been stopped (fresh session in the same process,
            # e.g. across test fixtures) — unpersist then raises a
            # Py4J/IllegalState error that must not fail the NEW call
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass
    weighted = weighted.persist(StorageLevel.MEMORY_AND_DISK)
    _rel._SCAFFOLD_CACHES.append(weighted)
    _TFIDF_SCAFFOLD = weighted
    norms = weighted.groupBy("id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("w") * F.col("w"), 9).cast("decimal(38,9)")
            ).cast("double")
        ).alias("norm")
    )
    # df=1 shingles contribute to norms but can never form a pair — and
    # at healthy shingle widths they are most of the vocabulary, so
    # dropping them before the posting self-join removes the bulk of
    # the shuffle + join fan-in
    pairable = weighted.where(F.col("df_t") >= 2)
    a = pairable.select(
        F.col("shingle"), F.col("id").alias("id_a"), F.col("w").alias("w_a")
    )
    b = pairable.select(
        F.col("shingle"), F.col("id").alias("id_b"), F.col("w").alias("w_b")
    )
    dots = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.round(F.col("w_a") * F.col("w_b"), 9).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("norm_b"))
    cos_pairs = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("norm_a") * F.col("norm_b")), 6).alias(
                "cos"
            ),
        )
        .where(F.col("cos") >= min_cos)
    )
    sym = cos_pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("neighbor_id"), "cos"
    ).unionByName(
        cos_pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("neighbor_id"), "cos"
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "neighbor_id", "cos", "rank")
    )
