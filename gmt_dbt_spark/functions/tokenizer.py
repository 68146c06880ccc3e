"""BPE tokenizer TRAINING — the missing piece between a raw corpus
and a token-count budget: learn the merge table itself, distributed.

This is the standard production shape (HuggingFace `tokenizers`,
SentencePiece BPE): training never iterates the corpus — it iterates
the WORD-COUNT relation (Heaps-law-sublinear in the corpus), which a
single scan produces. Each merge step is then two vocab-sized
dataframe operations: count weighted adjacent symbol pairs, pick the
argmax pair, apply the merge to every word's symbol sequence. The
corpus is touched exactly once regardless of how many merges are
learned — the property that makes BPE training feasible at 100 TB.

The merge application is a left-to-right greedy fold over the symbol
array (`F.aggregate` — a JVM higher-order function, no Python). The
fold IS exact BPE greedy: after merging (a,b)→ab, the new token can
never re-match the same pair within the step, because ab is strictly
longer than both a and b (tokens are non-empty), so no just-merged
flag is needed. DuckDB 1.0 replays the identical fold via
`list_reduce` (with a list-of-lists lift, since list_reduce seeds the
accumulator from the first element), so the ENTIRE training run — k
argmax pairs with their counts — is value-hashed cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gmt_dbt_spark.catalog import table
from gmt_dbt_spark.functions.text import _DUCK_TOKENS
from gmt_dbt_spark.operators.dedup import tokens_col
from gmt_dbt_spark.registry import query

N_MERGES = 8


def _char_syms(word: Column) -> Column:
    """word → array of its characters (the BPE base alphabet)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _pair_counts(it: DataFrame) -> DataFrame:
    """(a, b, n): adjacent symbol pairs weighted by word count.
    Words reduced to a single symbol contribute nothing (the
    size-guard keeps `sequence` ascending — Spark's sequence(1, 0)
    is DESCENDING [1, 0], not empty)."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        it.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_syms(syms: Column, a: Column, b: Column) -> Column:
    """Apply one BPE merge (a,b)→ab to a symbol array: greedy
    left-to-right fold, all JVM-side."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(a, b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_with_clause(k: int) -> str:
    """The shared training CTE chain (it{i} = vocab after i merges,
    p{i} = the i-th learned pair — argmax count, ties broken
    lexicographically, deterministic on both engines). Both oracles
    compose it with their own final SELECT."""
    parts = [
        f"""wc AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_DUCK_TOKENS}) AS tok FROM documents) GROUP BY 1
),
it0 AS (
  SELECT word, cnt,
         list_transform(range(length(word)),
             i -> substr(word, CAST(i + 1 AS INT), 1)) AS syms
  FROM wc
)"""
    ]
    for i in range(1, k + 1):
        parts.append(f"""pc{i} AS (
  SELECT u.pair[1] AS a, u.pair[2] AS b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM it{i-1}, LATERAL (
    SELECT unnest(list_transform(range(len(syms) - 1),
        i -> [syms[CAST(i + 1 AS INT)], syms[CAST(i + 2 AS INT)]])) AS pair) u
  GROUP BY 1, 2
),
p{i} AS (SELECT a, b, n FROM pc{i} ORDER BY n DESC, a, b LIMIT 1),
it{i} AS (
  SELECT word, cnt,
         list_reduce([CAST([] AS VARCHAR[])] || list_transform(syms, s -> [s]),
            (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = p{i}.a
                                  AND x[1] = p{i}.b
                        THEN acc[1:len(acc)-1] || [p{i}.a || p{i}.b]
                        ELSE acc || x END) AS syms
  FROM it{i-1} LEFT JOIN p{i} ON TRUE
)""")
    return "WITH " + ",\n".join(parts)


def _bpe_oracle(k: int) -> str:
    """DuckDB replay of the full k-merge training run: the merge
    table (step, a, b, n)."""
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS step, a, b, n FROM p{i}" for i in range(1, k + 1)
    )
    return _bpe_with_clause(k) + "\n" + union


def _train_chain(docs: DataFrame) -> tuple[list[DataFrame], DataFrame]:
    """Run the k-merge training loop. Returns (merge_steps, vocab):
    the k argmax 1-row frames and the final ENCODED vocabulary
    (word, cnt, syms after all merges) — the artifact `text_bpe_encode`
    joins against the corpus.

    Pair exhaustion (every word down to one symbol): the argmax frame
    goes EMPTY. The merge application is therefore a LEFT join on the
    ≤1-row pair frame, not a cross join — an empty step leaves the
    vocabulary intact (NULL pair → fold's merge branch never fires)
    instead of annihilating it, and the merge table simply truncates."""
    wc = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    it = wc.select(
        "word", "cnt", _char_syms(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merge_steps: list[DataFrame] = []
    for step in range(1, N_MERGES + 1):
        p = (
            _pair_counts(it)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(F.lit(step).alias("step"), "a", "b", "n")
            .localCheckpoint(eager=True)
        )
        merge_steps.append(p)
        pair = F.broadcast(
            p.select(F.col("a").alias("__a"), F.col("b").alias("__b"))
        )
        it = (
            it.join(pair, F.lit(True), "left")
            .select(
                "word",
                "cnt",
                _merge_syms(F.col("syms"), F.col("__a"), F.col("__b")).alias(
                    "syms"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return merge_steps, it


@query("text_bpe_train", oracle=_bpe_oracle(N_MERGES))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE tokenizer over `documents`: learn N_MERGES merges,
    return the merge table (step, a, b, n) — the trained artifact a
    tokenizer runtime consumes.

    Scale shape: ONE corpus scan builds the word-count relation
    (checkpointed); every subsequent step runs on that Heaps-bounded
    vocab — pair counting is a vocab-sized explode+groupBy, the
    argmax pair is a 1-row frame (deterministic tie-break: count
    desc, then lexicographic), the merge is a broadcast of that one
    row into a JVM fold over each word's symbol array. Each
    iteration's vocab frame is localCheckpoint'd because it has TWO
    consumers (the next pair count and the next merge) — without the
    checkpoint, lineage re-execution grows exponentially in the
    number of merges. Checkpoint bytes per step ≈ the vocabulary,
    not the corpus.

    Whole-run value-hashed: all counts are exact integers and the
    fold replays identically in DuckDB (module docstring), so the
    oracle certifies every learned pair AND its count — training
    drift (tie-break, fold semantics, pair windowing) fails the hash.
    If the vocabulary exhausts its pairs before N_MERGES (every word
    reduced to one symbol), the argmax frame goes empty and later
    steps emit no row — identically on both engines (`_train_chain`'s
    left-join keeps the vocabulary itself intact)."""
    docs = table(spark, sf_dir, "documents")
    merge_steps, _ = _train_chain(docs)
    out = merge_steps[0]
    for p in merge_steps[1:]:
        out = out.unionByName(p)
    return out


def _bpe_encode_oracle(k: int) -> str:
    """Replay training to it{k} (the encoded vocab), then join it to
    the corpus token stream and aggregate per-doc budgets."""
    return f"""{_bpe_with_clause(k)},
tokc AS (
  SELECT doc_id, unnest({_DUCK_TOKENS}) AS word FROM documents
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(e.syms)) AS BIGINT) AS n_bpe_tokens,
       CAST(MAX(len(e.syms)) AS INTEGER) AS max_word_pieces
FROM tokc t JOIN it{k} e USING (word)
GROUP BY t.doc_id
"""


@query("text_bpe_encode", oracle=_bpe_encode_oracle(N_MERGES))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE tokenizer to the corpus: per-doc token
    budget under the learned merges — (n_words, n_bpe_tokens,
    max_word_pieces). THE production encode trick: encoding never
    re-runs merges over the corpus — the training loop's final vocab
    relation already maps every distinct word to its merged symbol
    sequence, so encode is ONE equi-join of the corpus token stream
    against that Heaps-bounded map (AQE broadcasts it while it fits)
    plus a per-doc aggregate. This is why BPE at 100 TB costs two
    corpus scans total: one to learn (word counts), one to apply
    (this join).

    Value-hashed end-to-end THROUGH the training run: the oracle
    replays all N_MERGES merges AND the encode join, so a drift
    anywhere in the trained vocab shows up in some doc's token
    budget."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _train_chain(docs)
    enc = vocab.select(
        "word",
        F.size("syms").alias("n_sub"),
    )
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("word")
    )
    return tok.join(enc, "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sub").alias("n_bpe_tokens"),
        F.max("n_sub").cast("int").alias("max_word_pieces"),
    )


def _bpe_fertility_oracle(k: int) -> str:
    """Replay training to it{k}, join the lang-tagged token stream,
    aggregate the fertility evidence per language."""
    return f"""{_bpe_with_clause(k)},
tokc AS (
  SELECT lang, unnest({_DUCK_TOKENS}) AS word FROM documents
)
SELECT t.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(e.syms)) AS BIGINT) AS n_bpe_tokens,
       CAST(COUNT(*) FILTER (WHERE len(e.syms) > 1) AS BIGINT)
         AS n_split_words,
       CAST(MAX(len(e.syms)) AS INTEGER) AS max_word_pieces
FROM tokc t JOIN it{k} e USING (word)
GROUP BY t.lang
"""


@query("text_bpe_fertility", oracle=_bpe_fertility_oracle(N_MERGES))
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility — the standard
    tokenizer-fairness eval (tokens-per-word by language): a BPE
    vocabulary trained on a skewed mix over-fragments the minority
    languages, inflating their effective sequence length and training
    cost. Reports, per lang, the exact integer evidence the eval
    consumer ratios: word occurrences, total BPE pieces (fertility =
    n_bpe_tokens/n_words), words split into >1 piece (continuation
    rate), and the worst fragmentation. No division on the surface —
    the ratios stay exact in the consumer's hands.

    Plan shape: identical cost to `text_bpe_encode` — the trained
    vocab relation (ONE corpus scan + Heaps-bounded merge loop) is
    equi-joined against the lang-tagged token stream, then a
    k-language rollup; the per-lang aggregate is strictly cheaper
    than encode's per-doc one. Value-hashed through the whole
    training run, so a vocab drift shows up as a fertility shift in
    some language."""
    docs = table(spark, sf_dir, "documents")
    _, vocab = _train_chain(docs)
    enc = vocab.select("word", F.size("syms").alias("n_sub"))
    tok = docs.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("word")
    )
    return tok.join(enc, "word").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
        F.count_if(F.col("n_sub") > 1).alias("n_split_words"),
        F.max("n_sub").cast("int").alias("max_word_pieces"),
    )
