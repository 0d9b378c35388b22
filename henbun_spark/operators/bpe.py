"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

Training a subword tokenizer is the canonical first step of an LLM data
pipeline. The classic algorithm (Sennrich et al. 2016) is inherently
iterative; the Spark-first decomposition exploits that only ONE pass
touches the corpus:

1. corpus -> word-frequency table: explode + groupBy(word) — the single
   full-data shuffle. Everything after operates on the distinct-word
   table, which is tiny relative to the corpus (Heaps' law: ~millions of
   rows at 100 TB vs trillions of tokens).
2. each merge round runs ON THE VOCAB TABLE: count weighted adjacent
   symbol pairs (zip_with of the symbol array with its own shift — no
   explode of the corpus), pick the global argmax (deterministic
   tie-break on (count desc, pair asc)), and rewrite every word's symbol
   array with a left-to-right fold — all pure Column expressions.
   `localCheckpoint` per round truncates the growing lineage.
3. encoding new text (`bpe_encode`) applies the learned merge ranks in
   an Arrow-batched mapInPandas (the standard rank-greedy algorithm);
   Python-per-word is acceptable here because encoding is embarrassingly
   parallel and the merge table is a broadcast-sized dict.

No reference analogue (the reference is a VI library); part of the
brief-mandated training-data-pipeline surface (SURVEY §2.11).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_encode"]

END = "</w>"


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol)."""
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, 1, n - 1),
        F.slice(sym, 2, n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _merge_pair(sym: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a||b,
    as a fold: append each symbol unless it completes the pair with the
    accumulator's tail, in which case the tail is replaced by the merged
    token. Matches the reference BPE semantics exactly (a fresh merged
    token never re-merges within the same round: its string differs
    from `a`)."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


#: vocab-row ceiling for driver-local merge training. The merge loop
#: operates on the DISTINCT-WORD table only (Heaps' law keeps it far
#: smaller than the corpus); below the cap the whole table is a few MB
#: and 16+ per-round Spark jobs (pair-count shuffle + argmax + periodic
#: checkpoint, each a fixed-latency round trip) cost far more than one
#: collect + a local loop with IDENTICAL semantics (integer counts,
#: same (count desc, pair asc) argmax, same left-to-right merge; Python
#: str `<` and Spark's UTF8 binary collation agree — UTF-8 byte order
#: preserves code-point order). Same bounded-driver-with-distributed-
#: fallback design as graph.py's union-find cap. At 100 TB vocabularies
#: exceed the cap and the distributed loop below is unchanged.
TRAIN_LOCAL_MAX_VOCAB = 65536


def _train_local(rows, n_merges: int) -> list[tuple[str, str]]:
    """Driver-local replica of the distributed merge loop (see
    TRAIN_LOCAL_MAX_VOCAB): same pair counting, argmax tie-break and
    non-overlapping left-to-right merge, on collected (word, cnt)."""
    syms = [(int(cnt), list(w) + [END]) for w, cnt in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for cnt, sym in syms:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        merged = a + b
        for idx, (cnt, sym) in enumerate(syms):
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            syms[idx] = (cnt, out)
    return merges


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 20
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus; returns the ordered
    merge list [(left, right), ...] (rank = list position)."""
    words = (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # r12: small vocabularies train on the driver (one collect instead
    # of 16+ fixed-latency jobs); take(cap+1) keeps the probe bounded
    head = words.take(TRAIN_LOCAL_MAX_VOCAB + 1)
    if len(head) <= TRAIN_LOCAL_MAX_VOCAB:
        return _train_local([(r["w"], r["cnt"]) for r in head], n_merges)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    syms = words.select(
        "cnt", F.concat(chars, F.array(F.lit(END))).alias("sym")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for round_no in range(n_merges):
        best = (
            syms.select("cnt", F.explode(_adjacent_pairs(F.col("sym"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .first()
        )
        if best is None or best["n"] < 2:
            break
        merges.append((best["a"], best["b"]))
        syms = syms.select(
            "cnt", _merge_pair(F.col("sym"), best["a"], best["b"]).alias("sym")
        )
        # checkpoint every few rounds, not every round: truncating the
        # fold-chain lineage is needed only before plan depth compounds
        # (each un-checkpointed round adds one aggregate to the chain),
        # and an eager checkpoint costs a full extra job per round
        if (round_no + 1) % 4 == 0:
            syms = syms.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode text into BPE tokens with the learned merges (rank-greedy,
    the standard serving algorithm) — Arrow-batched mapInPandas; the
    merge-rank dict rides the task closure (broadcast-sized)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        sym = list(word) + [END]
        while len(sym) > 1:
            pairs = [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]
            ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
            if not ranked:
                break
            rank = min(r for r, _ in ranked)
            a, b = merges[rank]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            toks = [
                [t for w in txt.split() for t in encode_word(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks, "n_tokens": [len(t) for t in toks]}
            )

    id_type = dict(df.dtypes)[id_col]
    from henbun_spark.operators._parallel import ensure_parallelism

    # r12: the rank-greedy encode is Python-per-word — widen the narrow
    # scan (one row group locally => one task, i.e. a serial encode of
    # the whole corpus) to cluster parallelism; no-op at scale
    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        run, f"{id_col} {id_type}, tokens array<string>, n_tokens long"
    )
