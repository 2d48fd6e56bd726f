"""Round-12 staged queries: distributed BPE merge training.

``corpus_bpe_train_merges`` — the tokenizer TRAINING loop itself run
distributed, closing the one bounded-driver concession in the BPE
family: ``operators/bpe.bpe_train`` learns merges from a 100k-doc
collected sample (defensible — production tokenizers are
sample-trained), but at 100 TB the honest version of "train on the
corpus" is a distributed pair-count loop, and it is exactly the shape
Spark is good at:

- the corpus collapses ONCE into the word-frequency table (the classic
  Sennrich et al. 2016 formulation trains on word->count, not on raw
  tokens), so every iteration's cost scales with DISTINCT words — the
  Zipf ceiling — never with corpus tokens;
- each of the K iterations is: adjacent-pair counts over the word table
  (map-side-combinable hash agg), a 1-ROW argmax collect
  (count DESC, pair lexicographic — the bounded driver step, same
  contract as the graph fixpoints' convergence checks), and one JVM
  string ``replace`` applying the merge to every word's symbol string.
  Zero Python rows cross the wire; the whole loop is JVM expressions.

Merge application reuses the boundary-safe delimiter scheme PROVEN in
``operators/bpe_artifact.py`` (double unit-separators between symbols,
pattern consumes one separator from each side): Spark's ``replace`` and
DuckDB's ``replace`` are both non-overlapping left-to-right scans, so
the state strings evolve bit-identically in both engines — symbols and
integer counts only, no floats anywhere, which is what makes a TRAINING
loop hash-matchable cross-engine. The oracle is the same K iterations
unrolled as chained CTEs (programmatically generated — one block per
step, argmax via ORDER BY total DESC, a, b LIMIT 1).

Exhaustion: if a step has no pairs left its ``best`` CTE is empty, the
CROSS JOIN empties the state, and every later step is empty — the
oracle then emits exactly the merges that exist, and the Spark loop
breaks on the empty argmax: both engines agree on degenerate corpora
(the ADVICE-r10 winnowing lesson applied at design time). Unlike
``bpe_train`` there is no count>=2 stop — a fixed-K training run merges
whatever is most frequent (the equivalence test asserts the regimes
coincide on the test corpus).

Reference parity: the reference has no tokenizer (this is north-star
scope like the rest of the corpus family, SURVEY §2-extras).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cognitive_score_bigdata_spark.io import load_table
from cognitive_score_bigdata_spark.queries import register

K_BPE_MERGES = 16
_US = "\x1f"
_D2 = "chr(31)||chr(31)"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt): the corpus word-frequency table — the only
    corpus-sized pass in the whole training run."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " +")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_train_distributed(
    words: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """K merge iterations over the (w, cnt) table; returns
    [(step, lhs, rhs, pair_count)] with step 1-based."""
    return bpe_train_state(words, n_merges)[0]


def bpe_train_state(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """K merge iterations over the (w, cnt) table; returns the merge
    list [(step, lhs, rhs, pair_count)] (step 1-based) AND the final
    state table (w, cnt, s) — each distinct word's fully-merged symbol
    string, i.e. the corpus ENCODED under the just-trained tokenizer
    (``corpus_bpe_pipeline`` consumes it; training for merges alone
    discards it).

    Each iteration: pair counts (hash agg with map-side partials over
    the materialized word table), 1-row argmax collect, one ``replace``
    projection. State is EAGERLY ``localCheckpoint``-ed per iteration —
    the graph-fixpoint rule, and here it is not just about replaying
    work: a persist()+count() chain leaves each step's LOGICAL plan
    nested inside the next step's (InMemoryRelation children), and
    Catalyst's per-iteration re-analysis over that nesting grows
    EXPONENTIALLY (measured: step 10 0.4 s -> step 16 22 s at sf0.01's
    31-word table — the time was all driver-side plan work, zero data).
    localCheckpoint truncates the plan to a LogicalRDD, so every
    iteration re-analyzes a constant-size tree. No window hides behind
    these checkpoints (the §9r sweep concern): the loop's plans are
    agg/project only, and the registered query returns a local merge
    table.
    """
    s0 = F.concat(
        F.lit(_US * 2), F.regexp_replace(F.col("w"), "(.)", "$1" + _US * 2)
    )
    state = words.select("w", "cnt", s0.alias("s")).localCheckpoint()

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        core = F.expr("substring(s, 3, length(s) - 4)")
        toks = F.split(core, _US * 2)
        n = F.size(toks)
        pairs = state.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.slice(toks, F.lit(1), n - 1).alias("a"),
                    F.slice(toks, F.lit(2), n - 1).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # pairs exhausted — the oracle's empty-CTE cascade
        a, b, total = best[0].a, best[0].b, int(best[0].total)
        merges.append((step, a, b, total))
        pat = _US + a + _US * 2 + b + _US
        rep = _US + a + b + _US
        state = state.withColumn(
            "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
        ).localCheckpoint()
    return merges, state


def _train_oracle(k: int = K_BPE_MERGES) -> str:
    """The K iterations unrolled as chained CTEs (see module doc).

    ``st{i}`` and ``best{i}`` are each referenced twice (next step +
    final union), so they MUST be ``MATERIALIZED``: DuckDB inlines
    non-materialized CTEs per reference, which turns the chain into a
    2^K-way re-expansion of the base scan (observed as a
    too-many-open-files blowup at K=16)."""
    parts = [
        f"""
    WITH words AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split_regex(text, ' +')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    st0 AS MATERIALIZED (
      SELECT cnt,
             {_D2}||array_to_string(string_split(w, ''), {_D2})||{_D2} AS s
      FROM words
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
    pairs{i} AS (
      SELECT p[1] AS a, p[2] AS b, SUM(cnt) AS total FROM (
        SELECT cnt,
               unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
        FROM (
          SELECT cnt, string_split(trim(s, chr(31)), {_D2}) AS toks
          FROM st{i - 1}
        )
      ) GROUP BY 1, 2
    ),
    best{i} AS MATERIALIZED (
      SELECT {i} AS step, a, b, total FROM pairs{i}
      ORDER BY total DESC, a ASC, b ASC LIMIT 1
    ),
    st{i} AS MATERIALIZED (
      SELECT cnt,
             replace(s, chr(31)||a||{_D2}||b||chr(31),
                     chr(31)||a||b||chr(31)) AS s
      FROM st{i - 1} CROSS JOIN best{i}
    )"""
        )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT step, a AS lhs, b AS rhs, "
        f"CAST(total AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, k + 1)
    )
    parts.append(
        f"""
    SELECT * FROM (
      {union}
    ) ORDER BY step
    """
    )
    return "".join(parts)


@register(
    "corpus_bpe_train_merges",
    oracle=_train_oracle(),
    doc=f"distributed BPE tokenizer TRAINING (Sennrich et al. 2016): "
    f"{K_BPE_MERGES} merge iterations over the word-frequency table — "
    f"per-iteration cost scales with DISTINCT words (the Zipf "
    f"ceiling), never corpus tokens; each step is a map-side-combined "
    f"pair-count agg, a 1-row argmax collect, and one JVM string "
    f"replace using the boundary-safe delimiter scheme "
    f"operators/bpe_artifact.py proved equivalent to greedy merge "
    f"application. Symbols + integer counts only — no floats — so the "
    f"training RUN itself hash-matches the oracle's {K_BPE_MERGES} "
    f"unrolled chained-CTE iterations (ties: count DESC, pair "
    f"lexicographic, both engines binary collation). Complements "
    f"corpus_bpe_encode (apply a PINNED artifact): this row is the "
    f"artifact PRODUCER; bpe_train (bounded driver sample) remains "
    f"the documented small-corpus shortcut",
)
def corpus_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = word_freq_table(load_table(spark, sf_dir, "documents"))
    merges = bpe_train_distributed(words, K_BPE_MERGES)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long"
    )
