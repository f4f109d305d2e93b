"""Distributed BPE (byte-pair-encoding) vocabulary induction.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm). Two operators:

* ``tx_bpe_pair_counts`` — the inner statistic of BPE training: adjacent
  symbol-pair frequencies over the word-frequency table, weighted by
  word count. SQL-expressible, oracle-checked.
* ``tx_bpe_merges`` — the full iterative trainer: N merge rounds, each
  round one distributed aggregation + a single-row argmax collect.
  Iterative, yet ORACLE-CHECKED since round 8: the DuckDB oracle unrolls
  every round over an exploded symbol table (``_bpe_round_ctes``) —
  the recurrence is pure integer/string arithmetic, and the fold's
  left-to-right non-overlapping merge is replayed positionally with the
  run-parity rule. Also pinned against a pure-Python reference BPE in
  tests/test_bpe.py.

100-TB shape: the corpus is scanned ONCE, in the word-frequency
aggregation (map-side combined, shuffles word→count). Every merge round
then runs on the REDUCED word-frequency frame — bounded by vocabulary
size (~10M distinct words for a web corpus), not corpus size — with the
per-round argmax a TakeOrdered(1). The pair-merge rewrite itself is a
JVM-side ``aggregate`` fold over the symbol array (whole-stage codegen;
no Python UDFs), and each round's frame is persisted so round k does not
recompute rounds 1..k-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table

EOW = "</w>"          # end-of-word marker symbol (its own symbol, merges like any other)
WORD_RE = "^[a-z]+$"  # train on clean lowercase word forms
PAIR_TOP_K = 30
N_MERGES = 20
MIN_PAIR_COUNT = 2    # stop when the best pair drops below this support


def word_frequencies(docs: DataFrame) -> DataFrame:
    """(w, freq): the ONE corpus-sized aggregation in BPE training."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"))
        .filter(F.col("w").rlike(WORD_RE))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols() -> Column:
    """word → its character symbols + the end-of-word marker."""
    return F.expr(
        f"concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
        f" array('{EOW}'))"
    )


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs weighted by word frequency,
    from the vocab-bounded (w, freq, syms) frame."""
    return (
        # size guard: a fully-merged word has ONE symbol, and Spark's
        # sequence(1, 0) is a DESCENDING [1, 0] — not empty — so the
        # transform would index out of bounds without the filter
        vocab.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms)-1),"
                    " i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_pair(syms: Column, a: str, b: str, ab: str) -> Column:
    """Replace every adjacent (a, b) in the symbol array with ab —
    left-to-right, non-overlapping (classic BPE pass semantics: in
    "aaa" the rule (a,a) yields [aa, a]). A JVM-side fold: the merged
    token lands as the accumulator's last element, so an overlapping
    second occurrence sees ab (not a) and correctly does not re-merge."""
    a_l, b_l, ab_l = F.lit(a), F.lit(b), F.lit(ab)
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a_l) & (x == b_l),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab_l)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    words: DataFrame, n_merges: int = N_MERGES, min_count: int = MIN_PAIR_COUNT
) -> list[tuple[str, str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules from a (w, freq) frame.

    Returns [(left, right, merged, weighted_count), ...] in merge order.
    Argmax tie-break: highest count, then lexicographic (a, b) — the
    deterministic convention the pure-Python reference in tests/test_bpe.py
    mirrors exactly. Each round collects exactly ONE row (bounded by
    construction); the working frame stays vocabulary-sized throughout.
    """
    # localCheckpoint materializes the round AND truncates lineage, so
    # round k never replays rounds 1..k-1 (same device as the pointer-
    # jumping loop in dedup.py); the frame is vocab-bounded throughout.
    vocab = words.select("w", "freq", _initial_symbols().alias("syms")).localCheckpoint()
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _adjacent_pairs(vocab)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        ab = a + b
        merges.append((a, b, ab, cnt))
        vocab = vocab.withColumn(
            "syms", _merge_pair(F.col("syms"), a, b, ab)
        ).localCheckpoint()
    return merges


def tx_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent symbol-pair frequencies over the initial (character)
    symbolization — round 1 of BPE training as a standalone, oracle-
    checked statistic."""
    words = word_frequencies(load_table(spark, sf_dir, "documents"))
    vocab = words.select("w", "freq", _initial_symbols().alias("syms"))
    ranked = _adjacent_pairs(vocab).orderBy(F.col("cnt").desc(), "a", "b").limit(PAIR_TOP_K)
    # rank over the already-limited 30-row frame: the single-partition
    # window touches PAIR_TOP_K rows, never the corpus
    w = Window.orderBy(F.col("cnt").desc(), "a", "b")
    return ranked.select(
        F.row_number().over(w).cast("bigint").alias("rank"), "a", "b", "cnt"
    )


TX_BPE_PAIR_ORACLE = f"""
WITH words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE regexp_matches(w, '{WORD_RE}') GROUP BY w
),
syms AS (
  SELECT freq,
         list_append(list_transform(generate_series(1, length(w)), i -> substring(w, i, 1)), '{EOW}') AS s
  FROM words
),
pairs AS (
  SELECT s[i] AS a, s[i+1] AS b, SUM(freq) AS cnt
  FROM syms, unnest(generate_series(1, len(s)-1)) AS g(i)
  GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS BIGINT) AS rank,
       a, b, CAST(cnt AS BIGINT) AS cnt
FROM pairs ORDER BY cnt DESC, a, b LIMIT {PAIR_TOP_K}
"""


def tx_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table after N_MERGES rounds. ORACLE-CHECKED
    since round 8 despite being iterative: the DuckDB oracle unrolls all
    training rounds (see ``_bpe_round_ctes`` — the recurrence is pure
    integer/string arithmetic, so unlike PageRank/MMR no float grid is
    even needed). Merge-sequence parity vs a pure-Python reference BPE
    additionally pinned in tests/test_bpe.py."""
    words = word_frequencies(load_table(spark, sf_dir, "documents"))
    merges = train_bpe(words, N_MERGES)
    rows = [
        (i + 1, a, b, ab, cnt) for i, (a, b, ab, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "round BIGINT, left STRING, right STRING, merged STRING, cnt BIGINT"
    )


def apply_merges(vocab: DataFrame, merges: list[tuple[str, str, str, int]]) -> DataFrame:
    """Tokenize the (w, freq, syms) frame with a learned merge list: the
    merges are applied in training order as chained JVM folds — ONE
    execution pass over the frame (the fold chain is a single codegen'd
    projection; no per-merge job, unlike training which must argmax
    between rounds)."""
    out = vocab
    for a, b, ab, _cnt in merges:
        out = out.withColumn("syms", _merge_pair(F.col("syms"), a, b, ab))
    return out


def tx_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff metric of BPE training: tokenize the corpus vocabulary
    with the learned merges and report corpus-weighted compression —
    symbols per word before/after, token-count ratio, and the subword
    vocabulary size. One summary row. ORACLE-CHECKED since round 8: the
    unrolled-trainer oracle's final symbol table IS the tokenized vocab,
    so the stats derive from it directly; also pinned vs the pure-Python
    tokenizer in tests/test_bpe.py."""
    words = word_frequencies(load_table(spark, sf_dir, "documents"))
    merges = train_bpe(words, N_MERGES)
    toked = apply_merges(
        words.select("w", "freq", _initial_symbols().alias("syms")), merges
    ).localCheckpoint()  # two consumers below — don't rescan the corpus twice
    stats = toked.agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.col("freq") * (F.length("w") + 1)).cast("bigint").alias("symbols_before"),
        F.sum(F.col("freq") * F.size("syms")).cast("bigint").alias("symbols_after"),
        (
            F.sum(F.col("freq") * F.size("syms")).cast("double")
            / F.sum(F.col("freq") * (F.length("w") + 1)).cast("double")
        ).alias("compression"),
    )
    # distinct-token count as its own map-side-combined aggregation (a
    # collect_list over the vocab would funnel it through one buffer);
    # joined as a collected scalar — a 1-row cross join would plan as a
    # nested-loop join, which the global plan guard forbids
    n_vocab = (
        toked.select(F.explode("syms").alias("tok"))
        .agg(F.count_distinct("tok"))
        .collect()[0][0]
    )
    return stats.withColumn("vocab_tokens", F.lit(int(n_vocab)).cast("bigint"))


def tx_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE tokenizer fertility (round 14) — the canonical
    "is the tokenizer fair to every domain/language slice" audit a
    mixture plan needs BEFORE training commits to a vocab: train the
    BPE merges globally (the production setup: one tokenizer, many
    sources), tokenize the vocabulary once, then weight per-word piece
    counts by each source's own word frequencies. Emits per source:
    n_words (corpus-weighted), n_pieces (after merges),
    pieces_per_word_ppm and chars_per_piece_ppm in exact integer ppm
    (chars counts the EOW marker, tx_bpe_tokenize's convention — so at
    zero merges pieces==chars and the ratio is exactly 1e6).

    A source whose pieces_per_word_ppm runs far above the corpus line
    pays more sequence length for the same text — the fertility skew
    that silently shifts the EFFECTIVE mixture away from
    tx_mixture_plan's char-share targets.

    100-TB shape: one extra corpus-sized aggregation next to training's
    own ((source, w) counts, map-side combined), one vocab-bounded
    equi-join of per-word piece counts onto it, and a |sources|-row
    output. Training cost is tx_bpe_tokenize's (shared kernel)."""
    docs = load_table(spark, sf_dir, "documents")
    words_src = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w").rlike(WORD_RE))
        .groupBy("source", "w")
        .agg(F.count("*").alias("freq"))
    )
    words = word_frequencies(docs)
    merges = train_bpe(words, N_MERGES)
    pieces = apply_merges(
        words.select("w", "freq", _initial_symbols().alias("syms")), merges
    ).select("w", F.size("syms").cast("bigint").alias("n_pieces"))
    return (
        words_src.join(pieces, "w")
        .groupBy("source")
        .agg(
            F.sum("freq").cast("bigint").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_pieces")).cast("bigint").alias("n_pieces"),
            F.sum(F.col("freq") * (F.length("w") + 1)).cast("bigint").alias("n_chars"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            F.expr("n_pieces * 1000000L div n_words").alias("pieces_per_word_ppm"),
            F.expr("n_chars * 1000000L div n_pieces").alias("chars_per_piece_ppm"),
        )
        .orderBy("source")
    )


def _bpe_fertility_oracle() -> str:
    n = N_MERGES
    return (
        _bpe_round_ctes()
        + f""",
pieces AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces FROM sym{n} GROUP BY w),
words_src AS (
  SELECT source, w, COUNT(*) AS freq FROM (
    SELECT source, unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE regexp_matches(w, '{WORD_RE}') GROUP BY source, w
)
SELECT source,
       CAST(SUM(freq) AS BIGINT) AS n_words,
       CAST(SUM(freq * n_pieces) AS BIGINT) AS n_pieces,
       CAST(SUM(freq * n_pieces) * 1000000 // SUM(freq) AS BIGINT)
         AS pieces_per_word_ppm,
       CAST(SUM(freq * (length(w) + 1)) * 1000000 // SUM(freq * n_pieces) AS BIGINT)
         AS chars_per_piece_ppm
FROM words_src JOIN pieces USING (w)
GROUP BY source
ORDER BY source
"""
    )


def _bpe_round_ctes() -> str:
    """The shared unrolled-trainer SQL (round 8 — promotes the BPE
    trainer out of rows-only): N_MERGES rounds, each one argmax + one
    merge application, replayed over an EXPLODED symbol table
    sym_r(w, freq, posn, sym). The recurrence is pure integer/string
    arithmetic — no float grids needed, unlike PageRank/MMR.

    The left-to-right non-overlapping fold (`_merge_pair`) is replayed
    positionally: candidate positions (sym=a AND next=b) that are
    CONSECUTIVE form a run (possible only when a=b — a≠b consecutive
    candidates would need s[i+1]=b AND s[i+1]=a), and the fold merges
    exactly the odd-ranked positions of each run; the row AFTER a
    merged position is consumed (LAG), survivors renumber. An invalid
    round (best cnt < MIN_PAIR_COUNT, where Spark's trainer BREAKS)
    materializes an EMPTY rule table, so the frame passes through
    unchanged and every later round recomputes the same invalid rule —
    the frozen frame makes validity monotone, so filtering output rules
    by cnt reproduces the break exactly."""
    words_cte = f"""words AS MATERIALIZED (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  ) WHERE regexp_matches(w, '{WORD_RE}') GROUP BY w
),
sym0 AS MATERIALIZED (
  SELECT w, freq, i AS posn,
         CASE WHEN i <= length(w) THEN substring(w, i, 1) ELSE '{EOW}' END AS sym
  FROM words, unnest(generate_series(1, length(w) + 1)) AS g(i)
)"""
    rounds = []
    for r in range(1, N_MERGES + 1):
        rounds.append(
            f"""p{r} AS (
  SELECT w, freq, posn, sym,
         LEAD(sym) OVER (PARTITION BY w ORDER BY posn) AS nxt
  FROM sym{r - 1}
),
rule{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM (
    SELECT sym AS a, nxt AS b, SUM(freq) AS cnt
    FROM p{r} WHERE nxt IS NOT NULL
    GROUP BY 1, 2
    ORDER BY cnt DESC, a, b
    LIMIT 1
  ) WHERE cnt >= {MIN_PAIR_COUNT}
),
k{r} AS (
  SELECT *, CASE WHEN cand THEN
              (ROW_NUMBER() OVER (PARTITION BY w, grp, cand ORDER BY posn) % 2) = 1
            ELSE FALSE END AS keep
  FROM (
    SELECT p.*, (r.a IS NOT NULL) AS cand,
           p.posn - ROW_NUMBER() OVER (
             PARTITION BY p.w, (r.a IS NOT NULL) ORDER BY p.posn) AS grp
    FROM p{r} p LEFT JOIN rule{r} r ON p.sym = r.a AND p.nxt = r.b
  )
),
sym{r} AS MATERIALIZED (
  SELECT w, freq,
         ROW_NUMBER() OVER (PARTITION BY w ORDER BY posn) AS posn,
         CASE WHEN keep THEN sym || nxt ELSE sym END AS sym
  FROM (
    SELECT *, COALESCE(LAG(keep) OVER (PARTITION BY w ORDER BY posn), FALSE) AS consumed
    FROM k{r}
  )
  WHERE NOT consumed
)"""
        )
    return "WITH " + words_cte + ",\n" + ",\n".join(rounds)


def _bpe_merges_oracle() -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, a, b, cnt FROM rule{r}" for r in range(1, N_MERGES + 1)
    )
    return (
        _bpe_round_ctes()
        + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY r) AS BIGINT) AS round,
       a AS "left", b AS "right", a || b AS merged, CAST(cnt AS BIGINT) AS cnt
FROM ({union})
ORDER BY round
"""
    )


def _bpe_tokenize_oracle() -> str:
    n = N_MERGES
    return (
        _bpe_round_ctes()
        + f""",
before AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
                  CAST(SUM(freq * (length(w) + 1)) AS BIGINT) AS symbols_before
           FROM words),
after AS (SELECT CAST(SUM(freq) AS BIGINT) AS symbols_after,
                 CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_tokens
          FROM sym{n})
SELECT n_words, symbols_before, symbols_after,
       CAST(symbols_after AS DOUBLE) / CAST(symbols_before AS DOUBLE) AS compression,
       vocab_tokens
FROM before, after
"""
    )


def _bpe_probes(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Construction-phase plan of BPE training (round-7 verdict #2): one
    merge round's distributed pair-count argmax — the plan that
    train_bpe's per-round localCheckpoint + 1-row collect hides from
    the audit. Live lineage from the corpus scan, no execution."""
    words = word_frequencies(load_table(spark, sf_dir, "documents"))
    vocab = words.select("w", "freq", _initial_symbols().alias("syms"))
    return {
        "merge_round_argmax": _adjacent_pairs(vocab)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(1)
    }


SPECS = [
    QuerySpec("tx_bpe_pair_counts", tx_bpe_pair_counts, TX_BPE_PAIR_ORACLE),
    QuerySpec("tx_bpe_merges", tx_bpe_merges, _bpe_merges_oracle(), probes=_bpe_probes),
    QuerySpec("tx_bpe_tokenize", tx_bpe_tokenize, _bpe_tokenize_oracle(),
              probes=_bpe_probes),
    QuerySpec("tx_bpe_fertility", tx_bpe_fertility, _bpe_fertility_oracle(),
              probes=_bpe_probes),
]
