"""Distributed BPE (byte-pair-encoding) tokenizer training — the merge
learner of an LLM tokenizer pipeline, built Sennrich-style over the
DISTINCT-WORD vocabulary so corpus size never touches the merge loop.

The pivotal scale decision: pair statistics are computed on the word
VOCABULARY weighted by word frequency, not on the raw token stream. A
10^12-token corpus collapses to one map-side-combined word-count
aggregation (`word_vocab` — the only corpus-sized shuffle in the whole
fit); every one of the K merge rounds then runs on the |V|-sized vocab
relation (millions of rows at web scale, i.e. executor-trivial), with a
pair-count aggregation whose output is alphabet², not corpus-sized. The
merge application itself is a NARROW higher-order-function fold — no
shuffle, no Python.

Cross-engine exactness: pair counts are integer sums of word
frequencies; the winning pair per round is argmax with a total
deterministic order (count DESC, lhs ASC, rhs ASC); the greedy
left-to-right non-overlapping merge is the same fold in both engines
(Spark `aggregate` HOF ≡ DuckDB `list_reduce`), so the learned merge
table is bit-identical everywhere and the oracle replays the full fit as
an unrolled CTE (the functions/graph.py PageRank / functions/classify.py
GD pattern).

Like the reference's summarizers, this is a *fit* producing a
model-sized result: the only rows that ever reach the driver are the K
winning pairs, one per round (the kmeans_fit / PageRank loop contract).

Demo scope: the vocabulary is restricted to ASCII ``[a-z0-9]+`` words
(post `normalize_text` lowercasing) because character splitting of
multi-byte graphemes is engine-specific; a production tokenizer swaps in
a byte-level or grapheme pre-splitter at `word_vocab` without touching
the merge loop.

Reference parity: the reference has no tokenizer component; this extends
its summarize-from-logs surface (conn.d:233-441 aggregation idioms) to
the training-data-pipeline operators the task brief lists as
first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from .iterutils import resolve_checkpoint_mode, truncate_lineage
from .textstats import normalize_text, tokens

END = "</w>"  # end-of-word sentinel symbol (Sennrich et al. 2016)

_WORD_RE = "^[a-z0-9]+$"


def word_vocab(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, wfreq, syms) — the distinct-word relation the merge loop
    iterates on. The ONE corpus-sized operation: explode to words, hash
    aggregate with map-side partial combine. ``syms`` is the word's
    character array plus the end-of-word sentinel."""
    words = (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
        .groupBy("word")
        .agg(F.count("*").alias("wfreq"))
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    return words.select("word", "wfreq", syms.alias("syms"))


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count): adjacent symbol pairs weighted by word
    frequency. arrays_zip pads the short side with null — the trailing
    (last_sym, null) row is filtered, not an index error."""
    return (
        vocab.select(
            F.col("wfreq"),
            F.col("syms").alias("a"),
            F.slice(F.col("syms"), 2, F.size("syms")).alias("b"),
        )
        .select(F.col("wfreq"), F.explode(F.arrays_zip("a", "b")).alias("p"))
        .select(
            F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"), F.col("wfreq")
        )
        .filter(F.col("rhs").isNotNull())
        .groupBy("lhs", "rhs")
        .agg(F.sum("wfreq").alias("pair_count"))
    )


def apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right non-overlapping application of one merge
    rule: fold the symbol array, joining x onto the accumulator tail
    when (tail, x) == (lhs, rhs). Narrow expression — no shuffle; the
    HOF lambda is interpreted (CodegenFallback) but stays JVM-side."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(lhs + rhs))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merges(
    df: DataFrame,
    n_merges: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str = "auto",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over ``df``'s text.

    Returns (step, lhs, rhs, pair_count) — one row per learned merge, in
    learning order. Each round: one alphabet²-output aggregation over the
    vocab relation, a 1-row argmax collect (model-sized driver traffic),
    and a narrow literal-parameterized fold; vocab lineage is truncated
    every 2 rounds (auto local/reliable per iterutils) so plan size stays
    constant regardless of K."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    vocab = word_vocab(df, id_col, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    mode = resolve_checkpoint_mode(vocab, checkpoint)
    learned: list[tuple[int, str, str, int]] = []
    try:
        cur = vocab
        for step in range(1, n_merges + 1):
            top = (
                _adjacent_pairs(cur)
                .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not top:  # vocabulary fully merged — stop early
                break
            w = top[0]
            learned.append((step, w["lhs"], w["rhs"], w["pair_count"]))
            nxt = cur.withColumn("syms", apply_merge(F.col("syms"), w["lhs"], w["rhs"]))
            if step % 2 == 0:
                nxt = truncate_lineage(nxt, mode)
            prev, cur = cur, nxt.persist(StorageLevel.MEMORY_AND_DISK)
            cur.count()  # materialize before releasing the parent
            if prev is not vocab:
                prev.unpersist()
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        learned, "step int, lhs string, rhs string, pair_count bigint"
    )


def bpe_token_counts(
    df: DataFrame,
    n_merges: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str = "auto",
) -> DataFrame:
    """The encode path: learn ``n_merges`` rules, apply them in order to
    the vocabulary, and return the resulting subword token frequencies
    (token, token_count) — what a tokenizer's vocab file is built from.
    Application is a chain of narrow folds over the vocab relation; the
    corpus itself is never re-read after `word_vocab`."""
    merges = bpe_merges(df, n_merges, id_col, text_col, checkpoint)
    rules = [(r["lhs"], r["rhs"]) for r in merges.orderBy("step").collect()]
    syms = F.col("syms")
    for lhs, rhs in rules:
        syms = apply_merge(syms, lhs, rhs)
    return (
        word_vocab(df, id_col, text_col)
        .select(F.col("wfreq"), F.explode(syms).alias("token"))
        .groupBy("token")
        .agg(F.sum("wfreq").alias("token_count"))
    )


# --------------------------------------------------------------------------
# DuckDB oracle mirrors: the full fit unrolled as CTEs (one block per
# round), with each round's winner computed IN SQL and applied through
# list_reduce — the same greedy fold as apply_merge. NOTE DuckDB list
# slicing is 1-based INCLUSIVE (acc[:-1] keeps the last element), hence
# the explicit list_slice(acc, 1, len(acc)-1).
# --------------------------------------------------------------------------


def _vocab_cte(rel: str, text_col: str) -> str:
    return f"""
        v0 AS (
          SELECT word, CAST(count(*) AS BIGINT) AS wfreq,
                 list_append(string_split(word, ''), '{END}') AS syms
          FROM (SELECT unnest(string_split_regex(
                         trim(regexp_replace(lower({text_col}), '\\s+', ' ', 'g')),
                         '\\s+')) AS word
                FROM ({rel}))
          WHERE regexp_matches(word, '{_WORD_RE}')
          GROUP BY word)"""


def _round_ctes(i: int) -> str:
    prev, cur = f"v{i - 1}", f"v{i}"
    return f"""
        p{i} AS (
          SELECT pr[1] AS lhs, pr[2] AS rhs, CAST(sum(wfreq) AS BIGINT) AS pair_count
          FROM (SELECT wfreq, unnest(list_zip(syms, syms[2:])) AS pr
                FROM {prev})
          WHERE pr[2] IS NOT NULL
          GROUP BY 1, 2),
        w{i} AS (
          SELECT lhs, rhs, pair_count
          FROM p{i} ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
        {cur} AS (
          SELECT word, wfreq,
                 CASE WHEN len(syms) <= 1 THEN syms ELSE
                   list_reduce(
                     list_transform(syms, s -> [s]),
                     (acc, x) -> CASE WHEN acc[-1] = w{i}.lhs AND x[1] = w{i}.rhs
                                      THEN list_append(
                                             list_slice(acc, 1, len(acc) - 1),
                                             w{i}.lhs || w{i}.rhs)
                                      ELSE list_concat(acc, x) END)
                 END AS syms
          FROM {prev}, w{i})"""


def bpe_merges_sql(rel: str, n_merges: int = 6, text_col: str = "text") -> str:
    ctes = [_vocab_cte(rel, text_col)]
    ctes += [_round_ctes(i) for i in range(1, n_merges + 1)]
    sel = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, lhs, rhs, pair_count FROM w{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH" + ",".join(ctes) + f"\n        {sel}\n        ORDER BY step"


def bpe_token_counts_sql(rel: str, n_merges: int = 6, text_col: str = "text") -> str:
    ctes = [_vocab_cte(rel, text_col)]
    ctes += [_round_ctes(i) for i in range(1, n_merges + 1)]
    return (
        "WITH" + ",".join(ctes) + f"""
        SELECT token, CAST(sum(wfreq) AS BIGINT) AS token_count
        FROM (SELECT wfreq, unnest(syms) AS token FROM v{n_merges})
        GROUP BY token"""
    )
