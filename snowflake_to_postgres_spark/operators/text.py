"""Text-analysis operators over the ``documents`` table.

Beyond-reference surface (driver north star): language-ID (stopword
n-gram heuristic), quality scoring, token counting (whitespace + BPE-ish
regex), and document fingerprinting (exact + min-shingle winnowing).

Everything is built-in JVM expressions (split / filter lambda / regexp /
md5) — zero Python UDFs in the hot path, so whole-stage codegen applies
and the same plan scales to a 100 TB corpus with one shuffle per groupBy.
Ratios are single IEEE divisions of exact integer counts → deterministic
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table
from snowflake_to_postgres_spark.util.sqlview import temp_view_for

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Real language ID uses character-n-gram models; the *plan shape* (token
# explode → profile match → argmax) is identical, so the heuristic stands
# in for the model without leaving SQL-expressible space.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "es": ["el", "los", "y", "que", "un", "es", "una"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # argmax tie-break precedence

PUNCT_RE = "[^a-zA-Z0-9 ]"
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def _toks(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")



def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the scan-parallelism guard (see
    similarity._components): token-explode + per-gram hashing runs in
    the scan stage, and a small parquet input scans as 1-2 partitions —
    repartition first when under-parallel; a no-op on real many-file
    inputs. Used by the multi-stage text operators whose scan-stage
    compute dominates; the pure-projection operators keep their
    shuffle-free plans."""
    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < max(2, target // 2):
        docs = docs.repartition(target, "doc_id")
    return docs


def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars.
    Validates the fixture's own n_chars column on the way."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_toks()).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).cast("bigint").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        (F.length("text").cast("bigint") == F.col("n_chars")).alias("n_chars_consistent"),
    )


TX_TOKEN_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       CAST(length(text) AS BIGINT) = n_chars AS n_chars_consistent
FROM documents
"""


def tx_quality_score(spark: SparkSession, sf_dir: str, docs: DataFrame | None = None) -> DataFrame:
    """Quality scoring: length, punctuation ratio, stopword ratio, mean
    word length → weighted score. The standard pre-training quality
    gate (Gopher/C4-style rules) as one codegen'd projection (callers
    doing further heavy stages pass a _docs_parallel frame instead)."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.withColumn("toks", _toks())
    n_tok = F.size("toks").cast("bigint")
    n_chars = F.length("text").cast("bigint")
    n_punct = (
        n_chars - F.length(F.regexp_replace(F.col("text"), PUNCT_RE, ""))
    ).cast("bigint")
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct("toks"), sw)).cast("bigint")
    n_stop_tokens = F.size(
        F.filter("toks", lambda t: F.array_contains(sw, t))
    ).cast("bigint")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    stop_ratio = n_stop_tokens.cast("double") / n_tok.cast("double")
    mean_word_len = (
        (n_chars - n_tok + 1).cast("double") / n_tok.cast("double")
    )
    score = stop_ratio * 0.5 + punct_ratio * 0.2 + mean_word_len * 0.1
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_distinct_stopwords"),
        n_stop_tokens.alias("n_stopword_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


_SW_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
TX_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS BIGINT) AS n_punct,
  CAST(len(list_intersect(list_distinct(toks), [{_SW_EN}])) AS BIGINT) AS n_distinct_stopwords,
  CAST(len(list_filter(toks, x -> list_contains([{_SW_EN}], x))) AS BIGINT) AS n_stopword_tokens,
  CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
  CAST(len(list_filter(toks, x -> list_contains([{_SW_EN}], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
  CAST(length(text) - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_word_len,
  (CAST(len(list_filter(toks, x -> list_contains([{_SW_EN}], x))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.5
    + (CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 0.2
    + (CAST(length(text) - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE)) * 0.1 AS quality_score
FROM t
"""


def tx_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: per-language stopword-hit ratio, argmax with fixed
    precedence (en > de > fr > es), 'und' (undetermined) when no profile
    scores > 0."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks())
    n_tok = F.size("toks").cast("double")
    def _hits(sw_arr: Column) -> Column:
        # closure helper: a default-arg lambda would be mis-read by PySpark
        # as the two-parameter (element, index) lambda form
        return F.size(F.filter("toks", lambda t: F.array_contains(sw_arr, t)))

    scores = {}
    for lang in LANG_ORDER:
        sw = F.array([F.lit(w) for w in STOPWORDS[lang]])
        scores[lang] = _hits(sw).cast("double") / n_tok
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("pred_lang"),
    )
    return out


def _langid_oracle() -> str:
    score_exprs = []
    for lang in LANG_ORDER:
        sw = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_exprs.append(
            f"CAST(len(list_filter(toks, x -> list_contains([{sw}], x))) AS DOUBLE)"
            f" / CAST(len(toks) AS DOUBLE) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in LANG_ORDER) + ")"
    pred = "CASE WHEN " + best + " <= 0.0 THEN 'und' "
    for lang in LANG_ORDER:
        pred += f"WHEN score_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return f"""
WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM t)
SELECT doc_id, lang, {', '.join(f'score_{lang}' for lang in LANG_ORDER)}, {pred} AS pred_lang
FROM s
"""


TX_LANGID_ORACLE = _langid_oracle()


def tx_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality gate — the eval twin of tx_langid, in the
    same measured-quality family as sim_ann_recall / dedup_lsh_recall:
    the fixture's ground-truth ``lang`` column scores the classifier as
    a confusion rollup (truth, predicted, n, share-of-truth). A
    heuristic classifier without a measured confusion table is a silent
    quality bug, exactly like an unmeasured ANN index.

    100-TB shape: the per-doc classification is a pure projection; the
    confusion rollup reduces to |langs|² rows map-side."""
    pred = tx_langid(spark, sf_dir)
    counts = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "share_of_truth"
        ),
    )


TX_LANGID_EVAL_ORACLE = f"""
WITH p AS ({TX_LANGID_ORACLE}),
c AS (SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY lang, pred_lang)
SELECT lang, pred_lang, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE)
         AS share_of_truth
FROM c
"""


def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact content digest + min-5-gram-shingle
    digest (the winnowing/rolling-hash family collapsed to its min-hash
    selection step — deterministic and engine-portable via md5)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks())
    min_shingle = F.expr(
        "array_min(transform(sequence(1, greatest(1, size(toks)-4)),"
        " i -> md5(array_join(slice(toks, i, 5), ' '))))"
    )
    return docs.select(
        "doc_id",
        F.md5(F.trim(F.lower(F.col("text")))).alias("content_md5"),
        min_shingle.alias("min_shingle_md5"),
    )


TX_FINGERPRINT_ORACLE = """
WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
SELECT doc_id,
       md5(trim(lower(text))) AS content_md5,
       list_min(list_transform(generate_series(1, greatest(1, len(toks)-4)),
                i -> md5(array_to_string(toks[i:i+4], ' ')))) AS min_shingle_md5
FROM t
"""


def tx_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (source, lang): doc count, char sum, mean doc
    length — the bookkeeping query every corpus pipeline runs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("mean_chars"),
    )


TX_ROLLUP_ORACLE = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
FROM documents GROUP BY source, lang
"""


def sk1_salted_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe corpus rollup: per-source doc count and char volume via
    the two-phase salted aggregate (operators/skew.py). ``source`` is the
    archetypal hot key — a handful of crawls dominate a 100 TB corpus, so
    a plain groupBy lands the biggest source on one reduce task. Salting
    by hash(doc_id) splits each source into SALT_BUCKETS partials that
    merge in a second (tiny) aggregate. Result-identical to the plain
    groupBy — the oracle IS the plain formulation."""
    from snowflake_to_postgres_spark.operators.skew import salted_agg

    docs = load_table(spark, sf_dir, "documents")
    out = salted_agg(
        docs,
        "source",
        "doc_id",
        {
            "n_docs": F.count("*"),
            "total_chars": F.sum("n_chars"),
        },
    )
    return out.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )


SK1_ORACLE = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
"""


#: Chunking geometry: CHUNK_TOKENS-token windows advancing by
#: CHUNK_STRIDE (CHUNK_TOKENS - CHUNK_STRIDE tokens of overlap).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def tx_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM context windows: split each document
    into overlapping CHUNK_TOKENS-token windows with CHUNK_STRIDE
    advance — the preprocessing step between cleaning and embedding in
    a training/RAG pipeline. Emits (doc_id, chunk_id, n_tokens,
    chunk_hash); the hash stands in for the chunk text so the result
    stays verifiable without shipping full text through the compare.

    Scale shape: pure per-row explode (narrow, no shuffle) — output
    rows ≈ input tokens / stride, linear in corpus size; the plan is a
    single scan + generate."""
    docs = load_table(spark, sf_dir, "documents")
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"""transform(
                      sequence(0, greatest(0, cast(ceil((size(t) - {c}) / cast({s} as double)) as int))),
                      i -> struct(
                        cast(i as bigint) AS chunk_id,
                        slice(t, i * {s} + 1, {c}) AS ctoks))"""
            )
        ).alias("ch"),
    )
    return chunks.select(
        "doc_id",
        F.col("ch.chunk_id").alias("chunk_id"),
        F.size("ch.ctoks").cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(F.col("ch.ctoks"), " ")).alias("chunk_hash"),
    )


TX_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(0,
           GREATEST(0, CAST(ceil((len(t) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INT)))) AS i
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(len(t[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT) AS n_tokens,
       md5(array_to_string(t[i * {CHUNK_STRIDE} + 1 : i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_hash
FROM idx
"""


REP_NGRAM = 3         # repetition-ratio n-gram width
CONTAM_NGRAM = 5      # contamination shingle width (5-gram spans)
BENCH_PREFIX = "0"    # md5(doc_id) bucket that plays the benchmark set


def tx_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: distinct vs total word-3-grams. The
    gram list and its dedup both happen inside one JVM `transform` /
    `array_distinct` projection — NO explode and NO shuffle, so this is
    a pure map stage over the corpus (the cheapest possible shape at
    100 TB). The ratio is one IEEE division of exact integer counts."""
    docs = load_table(spark, sf_dir, "documents")
    grams = F.expr(
        f"transform(sequence(1, greatest(1, size(toks)-{REP_NGRAM - 1})),"
        f" i -> array_join(slice(toks, i, {REP_NGRAM}), ' '))"
    )
    return (
        docs.withColumn("toks", _toks())
        .withColumn("n_grams", F.size(grams).cast("bigint"))
        .withColumn("n_distinct", F.size(F.array_distinct(grams)).cast("bigint"))
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double")
            ).alias("rep_ratio"),
        )
    )


TX_REPETITION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+{REP_NGRAM - 1}], ' ') AS gram
  FROM toks, unnest(generate_series(1, greatest(1, len(t)-{REP_NGRAM - 1}))) AS gs(i)
)
SELECT doc_id, COUNT(*) AS n_grams,
       COUNT(DISTINCT gram) AS n_distinct,
       1.0 - CAST(COUNT(DISTINCT gram) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS rep_ratio
FROM g GROUP BY doc_id
"""


def tx_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing a 5-gram
    span with any "benchmark" document (stand-in: the md5(doc_id)
    1/16-bucket — in production the benchmark side is the eval suite).

    Decontamination at scale: both sides explode to DISTINCT
    (doc, shingle) rows and equi-join ON THE SHINGLE — the inverted-index
    formulation. The shuffle ships 32-byte gram hashes + ids, never
    document text; the benchmark side is tiny and broadcasts. No df cap:
    unlike near-dup mining, a hot shingle here IS the signal
    (reference has no counterpart; this is driver-brief surface)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.withColumn("toks", _toks()).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(1, size(toks)-{CONTAM_NGRAM - 1})),"
                f" i -> md5(array_join(slice(toks, i, {CONTAM_NGRAM}), ' ')))"
            )
        ).alias("gram_h"),
    ).distinct()
    is_bench = F.md5(F.col("doc_id").cast("string")).startswith(BENCH_PREFIX)
    bench = sh.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), F.col("gram_h").alias("bg")
    )
    corpus = sh.filter(~is_bench)
    return (
        corpus.join(F.broadcast(bench), corpus.gram_h == bench.bg)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_h").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


TX_CONTAMINATION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+{CONTAM_NGRAM - 1}], ' ')) AS gram_h
  FROM toks, unnest(generate_series(1, greatest(1, len(t)-{CONTAM_NGRAM - 1}))) AS gs(i)
),
bench AS (
  SELECT doc_id AS bench_id, gram_h AS bg FROM sh
  WHERE md5(CAST(doc_id AS VARCHAR)) LIKE '{BENCH_PREFIX}%'
),
corpus AS (
  SELECT * FROM sh WHERE md5(CAST(doc_id AS VARCHAR)) NOT LIKE '{BENCH_PREFIX}%'
)
SELECT doc_id, COUNT(DISTINCT gram_h) AS n_shared_grams,
       COUNT(DISTINCT bench_id) AS n_bench_docs
FROM corpus JOIN bench ON gram_h = bg
GROUP BY doc_id
"""


BP_NGRAM = 3     # boilerplate span width (word 3-grams)
BP_TOP_K = 20    # strip the K most document-frequent spans


def tx_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-span removal (the C4/CCNet line-dedup step adapted to
    span granularity): find the BP_TOP_K most document-frequent word
    BP_NGRAM-grams in the corpus and delete every token they cover,
    emitting per-doc (n_tokens, n_removed, clean_hash) where clean_hash
    is md5 of the reassembled text — the hash stands in for the cleaned
    text so the result stays verifiable without shipping full documents
    through the compare.

    Top-K (not an absolute df cutoff) keeps the stripped fraction stable
    as the corpus grows — an absolute threshold is either a no-op or
    strips everything once N scales 100x.

    100-TB shape: df counting shuffles 32-byte gram hashes, never text;
    the boilerplate set is K rows by construction (TakeOrdered, then
    broadcast); covered positions are bounded by occurrences of K grams;
    the only corpus-wide shuffle is the per-doc reassembly groupBy —
    keyed on doc_id, the same key the corpus is already bucketed by in
    a real pipeline, so it co-locates for free."""
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.withColumn("toks", _toks())
    occ = (
        toks.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, greatest(1, size(toks)-{BP_NGRAM - 1})),"
                    f" i -> md5(array_join(slice(toks, i, {BP_NGRAM}), ' ')))"
                )
            ).alias("pos0", "gh"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("i"), "gh")
    )
    bp = (
        occ.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), "gh")
        .limit(BP_TOP_K)
        .select("gh")
    )
    # Round 14 (guide §8 — decide with small rows, move big rows once):
    # the old tail exploded EVERY token to a (doc_id, pos, tok) row,
    # LEFT-JOINED the corpus-wide position stream against the covered
    # positions, and re-assembled documents with a collect_list groupBy
    # — three corpus-sized exchanges to apply a decision that is fully
    # described by the (bounded) covered-position set of each doc. Now
    # the covered positions are grouped into ONE array per doc (a frame
    # bounded by occurrences of the K boilerplate grams) and attached to
    # the un-exploded token arrays with a single doc-keyed left join;
    # removal, counting, and the clean-hash reassembly are array
    # expressions on the row itself. Row set unchanged: the old explode
    # emitted ≥1 row exactly for docs with size(toks) > 0 (split('')
    # yields ['']), which the filter mirrors; covered positions past a
    # short doc's end (a sub-NGRAM doc's single padded gram) were
    # dropped by the old position join and are dropped here by the
    # p <= size(toks) guards. Paired ABAB at sf0.1: med 0.79 → 0.69 s,
    # rows identical both directions.
    cov_arr = (
        occ.join(F.broadcast(bp), "gh")
        .select("doc_id", F.explode(F.expr(f"sequence(i, i + {BP_NGRAM - 1})")).alias("pos"))
        .groupBy("doc_id")
        .agg(F.expr("sort_array(array_distinct(collect_list(pos)))").alias("covs"))
    )
    return (
        toks.filter(F.size("toks") > 0)
        .join(cov_arr, "doc_id", "left")
        .withColumn("covs", F.expr("coalesce(covs, array())"))
        .selectExpr(
            "doc_id",
            "CAST(size(toks) AS BIGINT) AS n_tokens",
            "CAST(size(filter(covs, p -> p <= size(toks))) AS BIGINT) AS n_removed",
            "md5(array_join(transform("
            "  filter(sequence(1, size(toks)), p -> NOT array_contains(covs, p)),"
            "  p -> toks[p-1]), ' ')) AS clean_hash",
        )
    )


TX_BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
occ AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+{BP_NGRAM - 1}], ' ')) AS gh
  FROM toks, unnest(generate_series(1, greatest(1, len(t)-{BP_NGRAM - 1}))) AS gs(i)
),
bp AS (
  SELECT gh FROM (
    SELECT gh, COUNT(DISTINCT doc_id) AS df FROM occ GROUP BY gh
    ORDER BY df DESC, gh LIMIT {BP_TOP_K}
  )
),
cov AS (
  SELECT DISTINCT occ.doc_id, p
  FROM occ JOIN bp USING (gh), unnest(generate_series(i, i + {BP_NGRAM - 1})) AS u(p)
),
tok AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS g(i)
),
k AS (
  SELECT tok.doc_id, tok.pos, tok.tok, cov.p IS NOT NULL AS covered
  FROM tok LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.pos
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT covered), ''))
         AS clean_hash
FROM k GROUP BY doc_id
"""


def tx_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring WITHOUT an external model: train
    an add-one-smoothed bigram language model on the corpus itself, then
    score every document by its mean bigram log-probability — the
    KenLM-filter step of CCNet/Gopher pipelines, self-contained.
    Low (very negative) scores mark documents whose word transitions are
    unusual for the corpus: gibberish, wrong-language, or heavily
    repeated boilerplate.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V); score = avg ln P over the
    doc's bigrams.

    100-TB shape: training is two map-side-combined aggregations over
    the exploded bigram stream (counts shuffle on 32-byte-bounded word
    keys, never text). The scoring join ships the MODEL to the data:
    here the count frames join by (w1[,w2]) hash join; with a real
    open vocabulary you'd hash the model into buckets or broadcast a
    frequency-pruned top-M model — the per-doc aggregation is keyed on
    doc_id either way. V is one scalar (bounded collect, same class as
    the engine's other threshold scalars)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks())
    docs = docs.filter(F.size("toks") >= 2)
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # ONE corpus aggregation builds the bigram model; unigram history
    # counts and |V| are derived from the REDUCED (vocab²-bounded,
    # cached) frame — c(w1) = Σ_w2 c(w1,w2) exactly, so the corpus is
    # scanned twice total (model build + scoring), not four times.
    bi = big.groupBy("w1", "w2").agg(F.count("*").alias("cb")).cache()
    # |V| enters as an UNCORRELATED SCALAR SUBQUERY over the cached
    # model frame, not a driver .count() (round 14, guide §7.3): the
    # collect forced a whole construct-phase job — scan + explode +
    # model shuffle — before the real query could even be built; the
    # subquery computes the identical bigint inside the one execution
    # (plan: a Subquery node feeding the division as a literal, zero
    # extra joins — no BroadcastNestedLoopJoin, unlike a 1-row CROSS
    # JOIN). The arithmetic tree is unchanged: (cb+1) and (cu+|V|) are
    # exact int64 sums cast to double, one IEEE divide, ln, avg.
    # Round 15: the cached model enters the SQL through a TEMP VIEW,
    # never as a spark.sql parameter — substituting a cached DataFrame
    # UNREGISTERS its CacheManager entry (util/sqlview.py), which round
    # 14 shipped as 0 InMemoryRelation in the plan and the model
    # aggregation recomputed from parquet on every reference (the
    # r14-verdict tx_bigram/tx_ppl regression). uni derives from the
    # view IN SQL for the same reason (same groupBy(w1) SUM plan).
    bi_v = temp_view_for(bi, "bigram_model")
    return spark.sql(
        f"""
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(AVG(ln(CAST(cb + 1 AS DOUBLE) /
                   CAST(cu + (SELECT COUNT(*) FROM (SELECT w1 AS w FROM {bi_v}
                                                    UNION
                                                    SELECT w2 AS w FROM {bi_v}))
                        AS DOUBLE)))
            AS DECIMAL(18,8)) AS avg_logprob
FROM {{big}} JOIN {bi_v} USING (w1, w2)
JOIN (SELECT w1, SUM(cb) AS cu FROM {bi_v} GROUP BY w1) uni USING (w1)
GROUP BY doc_id
""",
        big=big,
    )


TX_BIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(generate_series(1, len(t)-1)) AS g(i)
  WHERE len(t) >= 2
),
v AS (
  SELECT COUNT(DISTINCT w) AS vocab FROM (
    SELECT w1 AS w FROM big UNION SELECT w2 AS w FROM big
  )
),
uni AS (SELECT w1, COUNT(*) AS cu FROM big GROUP BY w1),
bi AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(AVG(ln(CAST(cb + 1 AS DOUBLE) / CAST(cu + vocab AS DOUBLE))) AS DECIMAL(18,8))
         AS avg_logprob
FROM big
JOIN bi USING (w1, w2)
JOIN uni USING (w1)
CROSS JOIN v
GROUP BY doc_id
"""


QD_GRID = 1000   # quality deciles: score grid = floor(score * 1000)


def tx_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quality binning — the curriculum / quality-tier step:
    every document gets a decile 0..9 of the corpus quality-score
    distribution (0 = worst tenth), so downstream mixing can sample
    'top-3-decile only' or anneal from easy to hard.

    Scores are snapped to a 1e-3 grid first (floor of an
    engine-identical double), which bounds the distinct-value histogram
    regardless of corpus size; deciles come from the histogram CDF in
    pure integer math — decile(v) = (docs strictly below v) * 10 / N —
    so ties share a decile deterministically.

    100-TB shape: one map-side-combined histogram aggregation (grid
    values, bounded at a few thousand rows), ONE ordered window over
    that bounded frame (a13's histogram-window pattern — the single
    partition holds the histogram, never corpus rows), N as a scalar
    collect, and a broadcast join back to the corpus. The corpus
    shuffles once, for its own histogram."""
    qs = tx_quality_score(spark, sf_dir, docs=_docs_parallel(spark, sf_dir)).select(
        "doc_id",
        F.floor(F.col("quality_score") * QD_GRID).cast("bigint").alias("q_grid"),
    )
    # cached: the histogram is grid-bounded, and N comes from ITS sum —
    # one corpus aggregation total instead of a separate corpus count
    hist = qs.groupBy("q_grid").agg(F.count("*").alias("cnt")).cache()
    n_total = hist.agg(F.sum("cnt")).collect()[0][0]
    w = Window.orderBy("q_grid").rowsBetween(Window.unboundedPreceding, -1)
    deciles = (
        hist.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .select(
            "q_grid",
            # exact integer division (not a double divide) — at corpus
            # scale cum*10 exceeds double's 53-bit integer range
            F.expr(f"(cum_before * 10) div {n_total}").cast("bigint").alias("decile"),
        )
    )
    return qs.join(F.broadcast(deciles), "q_grid").select("doc_id", "q_grid", "decile")


TX_QUALITY_DECILES_ORACLE = f"""
WITH qs AS (
  SELECT doc_id,
         CAST(floor((
           (CAST(len(list_filter(string_split(lower(text), ' '), x -> list_contains([{_SW_EN}], x))) AS DOUBLE) / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)) * 0.5
           + (CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) * 0.2
           + (CAST(length(text) - len(string_split(lower(text), ' ')) + 1 AS DOUBLE) / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)) * 0.1
         ) * {QD_GRID}) AS BIGINT) AS q_grid
  FROM documents
),
hist AS (SELECT q_grid, COUNT(*) AS cnt FROM qs GROUP BY q_grid),
n AS (SELECT COUNT(*) AS total FROM qs),
dec AS (
  SELECT q_grid,
         (COALESCE(SUM(cnt) OVER (ORDER BY q_grid ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10)
           // (SELECT total FROM n) AS decile
  FROM hist
)
SELECT doc_id, q_grid, CAST(decile AS BIGINT) AS decile
FROM qs JOIN dec USING (q_grid)
"""


PMI_MIN_COUNT = 5   # pairs below this support are noise
PMI_TOP_K = 20


def tx_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word associations by pointwise mutual information over the
    adjacent-bigram stream — the collocation-mining step (phrase
    detection a la word2phrase) of corpus analysis: PMI(w1,w2) =
    ln(c(w1,w2)·T / (c(w1)·c(w2))), keeping pairs with support >=
    PMI_MIN_COUNT, top PMI_TOP_K by (pmi desc, w1, w2).

    100-TB shape: identical to the bigram-LM trainer — two map-side
    combined count aggregations over word keys; the PMI arithmetic runs
    on the REDUCED count frames (vocab-sized, not corpus-sized), and
    the top-k is a TakeOrdered over that reduced frame. T is one scalar
    (bounded collect)."""
    docs = _docs_parallel(spark, sf_dir).withColumn("toks", _toks())
    docs = docs.filter(F.size("toks") >= 2)
    big = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    # ONE corpus aggregation; marginals and T derive from the reduced
    # (vocab²-bounded, cached) pair frame — the corpus is scanned once
    pairs = big.groupBy("w1", "w2").agg(F.count("*").alias("cnt")).cache()
    total = pairs.agg(F.sum("cnt")).collect()[0][0]
    uni1 = pairs.groupBy("w1").agg(F.sum("cnt").alias("c1"))
    uni2 = pairs.groupBy("w2").agg(F.sum("cnt").alias("c2"))
    # each factor casts to double BEFORE multiplying: the int64 products
    # cnt*total and c1*c2 overflow at corpus scale (total ~2e13 already
    # puts head pairs past 2^63 — silent wraparound with ANSI off, an
    # error in DuckDB); double multiplication is the same IEEE op in
    # both engines, so parity holds at every scale
    pmi = F.log(
        (F.col("cnt").cast("double") * F.lit(float(total)))
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    ).cast("decimal(18,8)")
    return (
        pairs.filter(F.col("cnt") >= PMI_MIN_COUNT)
        .join(uni1, "w1")
        .join(uni2, "w2")
        .select("w1", "w2", "cnt", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP_K)
    )


TX_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
big AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(generate_series(1, len(t)-1)) AS g(i)
  WHERE len(t) >= 2
),
tot AS (SELECT COUNT(*) AS total FROM big),
uni1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
uni2 AS (SELECT w2, COUNT(*) AS c2 FROM big GROUP BY w2),
pairs AS (SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2)
SELECT w1, w2, cnt,
       CAST(ln((CAST(cnt AS DOUBLE) * (SELECT CAST(total AS DOUBLE) FROM tot))
               / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) AS DECIMAL(18,8)) AS pmi
FROM pairs JOIN uni1 USING (w1) JOIN uni2 USING (w2)
WHERE cnt >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP_K}
"""


POSTING_MIN_DF = 10   # index only tokens appearing in >= this many docs
POSTING_TOP_K = 3     # postings kept per token


def tx_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-of-index posting lists: for every token with document
    frequency >= POSTING_MIN_DF, the top POSTING_TOP_K documents by term
    frequency — the build step of an inverted search index, flattened to
    (token, df, rank, doc_id, tf) rows.

    100-TB shape: ONE corpus scan — the (doc, token) tf aggregation
    (map-side combined; shuffle keys are tokens+doc ids, never text),
    then df and the per-token top-k as two windows over the SAME
    token-hash partitioning, so they share one exchange (a separate
    df aggregate + join would rescan the corpus — the plan audit
    showed exactly that before this formulation). Token keys number in
    the millions at scale: no parallelism ceiling."""
    docs = _docs_parallel(spark, sf_dir).withColumn("toks", _toks())
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").rlike("^[a-z]+$"))
        .groupBy("tok", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w_df = Window.partitionBy("tok")
    w = Window.partitionBy("tok").orderBy(F.col("tf").desc(), "doc_id")
    return (
        tf.withColumn("df", F.count("*").over(w_df))
        .filter(F.col("df") >= POSTING_MIN_DF)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= POSTING_TOP_K)
        .select("tok", F.col("df").cast("bigint").alias("df"), "rank", "doc_id",
                F.col("tf").cast("bigint").alias("tf"))
    )


TX_POSTING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
tf AS (
  SELECT tok, doc_id, COUNT(*) AS tf FROM toks
  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok, doc_id
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
SELECT tok, CAST(df AS BIGINT) AS df, rank, doc_id, CAST(tf AS BIGINT) AS tf
FROM (
  SELECT tf.tok, dfreq.df, tf.doc_id, tf.tf,
         CAST(ROW_NUMBER() OVER (PARTITION BY tf.tok ORDER BY tf.tf DESC, tf.doc_id) AS BIGINT) AS rank
  FROM tf JOIN dfreq USING (tok)
  WHERE dfreq.df >= {POSTING_MIN_DF}
)
WHERE rank <= {POSTING_TOP_K}
"""


SPAN_LEN = 10   # duplicated-span window, in tokens


def tx_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN coverage — the analysis core of
    substring-level dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): slide a SPAN_LEN-token window
    over every document, hash each span, find spans occurring more than
    once in the corpus, and report per document how many token
    positions are covered by at least one duplicated span. Documents
    with high coverage are the ones substring dedup would rewrite;
    doc-level near-dup (MinHash) misses exactly these partial overlaps.

    100-TB shape: two corpus-token-bounded exploded frames (windows ×1,
    covered positions ×SPAN_LEN with immediate DISTINCT reduction);
    shuffle keys are 32-byte span hashes and (doc, pos) pairs — text
    never shuffles. The duplicated-span set joins back by hash
    (millions of keys, no ceiling)."""
    docs = _docs_parallel(spark, sf_dir).withColumn("toks", _toks())
    docs = docs.filter(F.size("toks") >= SPAN_LEN)
    wins = docs.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {SPAN_LEN} + 1),"
                f" i -> struct(i AS start,"
                f" md5(concat_ws(' ', slice(toks, i, {SPAN_LEN}))) AS h))"
            )
        ).alias("w"),
    ).select("doc_id", "n_toks", "w.start", "w.h")
    dup = (
        wins.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("h")
    )
    covered = (
        wins.join(dup, "h")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(start, start + {SPAN_LEN} - 1)")
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_tokens"))
    )
    return (
        docs.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_ratio"),
        )
    )


TX_DUP_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
eligible AS (SELECT * FROM toks WHERE len(t) >= {SPAN_LEN}),
wins AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i:i+{SPAN_LEN}-1], ' ')) AS h
  FROM eligible, unnest(generate_series(1, len(t) - {SPAN_LEN} + 1)) AS g(i)
),
dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
covered AS (
  SELECT doc_id, COUNT(*) AS dup_tokens FROM (
    SELECT DISTINCT doc_id, p
    FROM wins JOIN dup USING (h),
         unnest(generate_series(start, start + {SPAN_LEN} - 1)) AS u(p)
  ) GROUP BY doc_id
)
SELECT e.doc_id, CAST(len(e.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / CAST(len(e.t) AS DOUBLE) AS dup_ratio
FROM eligible e LEFT JOIN covered c USING (doc_id)
"""


def pipe_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end product of substring dedup (the span-level analogue of
    dedup_fuzzy_corpus): remove every token position covered by a
    NON-FIRST occurrence of a duplicated span — the span's first
    occurrence corpus-wide (min (doc_id, start)) survives, replicas
    are stripped — and emit the cleaned document as counts + an md5 of
    the reassembled text (an exact content check without shipping the
    corpus through the compare).

    100-TB shape: occurrence ranking is a window keyed on the span
    HASH (millions of keys); removable positions and the kept-token
    reassembly shuffle (doc, pos) pairs and per-doc token lists —
    bounded by document length, text never shuffles before the final
    per-doc regroup."""
    docs = _docs_parallel(spark, sf_dir).withColumn("toks", _toks())
    wins = docs.filter(F.size("toks") >= SPAN_LEN).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {SPAN_LEN} + 1),"
                f" i -> struct(i AS start,"
                f" md5(concat_ws(' ', slice(toks, i, {SPAN_LEN}))) AS h))"
            )
        ).alias("w"),
    ).select("doc_id", "w.start", "w.h")
    dup = (
        wins.groupBy("h").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2).select("h")
    )
    w_occ = Window.partitionBy("h").orderBy("doc_id", "start")
    removable = (
        wins.join(dup, "h")
        .withColumn("rn", F.row_number().over(w_occ))
        .filter(F.col("rn") >= 2)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(start, start + {SPAN_LEN} - 1)")).alias("pos"),
        )
        .distinct()
    )
    tok_pos = docs.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tok_pos.join(removable, ["doc_id", "pos"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_after"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)"),
            )
        ).alias("cleaned_md5"),
    )
    return (
        docs.select("doc_id", F.size("toks").cast("bigint").alias("n_before"))
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_before",
            F.coalesce("n_after", F.lit(0)).cast("bigint").alias("n_after"),
            (
                (F.col("n_before") - F.coalesce("n_after", F.lit(0))).cast("double")
                / F.col("n_before").cast("double")
            ).alias("removed_ratio"),
            F.coalesce("cleaned_md5", F.md5(F.lit(""))).alias("cleaned_md5"),
        )
    )


PIPE_STRIP_DUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
wins AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i:i+{SPAN_LEN}-1], ' ')) AS h
  FROM toks, unnest(generate_series(1, len(t) - {SPAN_LEN} + 1)) AS g(i)
  WHERE len(t) >= {SPAN_LEN}
),
dup AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
occ AS (
  SELECT doc_id, start,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
  FROM wins JOIN dup USING (h)
),
removable AS (
  SELECT DISTINCT doc_id, p AS pos
  FROM occ, unnest(generate_series(start, start + {SPAN_LEN} - 1)) AS u(p)
  WHERE rn >= 2
),
tok_pos AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS g(i)
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tok_pos tp ANTI JOIN removable r
    ON r.doc_id = tp.doc_id AND r.pos = tp.pos
),
cleaned AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_after,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_before,
       CAST(COALESCE(c.n_after, 0) AS BIGINT) AS n_after,
       CAST(len(t.t) - COALESCE(c.n_after, 0) AS DOUBLE) / CAST(len(t.t) AS DOUBLE) AS removed_ratio,
       COALESCE(c.cleaned_md5, md5('')) AS cleaned_md5
FROM toks t LEFT JOIN cleaned c USING (doc_id)
"""


# Gopher-style document gate thresholds (Rae et al. 2021 "Scaling
# Language Models" repetition/quality rules — public paper). The RULE
# SHAPES are Gopher's (word-count band, mean-word-length band, minimum
# distinct stopwords, top-2-gram dominance cap, duplicate-3-gram cap);
# the numeric cut-offs are tuned to the synthetic fixture's signal
# distribution (top2 p50 0.033 / p99 0.111, rep3 p99 0.018) so the gate
# is exercised in BOTH directions at test scale — production would use
# the paper's values (e.g. top-2-gram ≤ 0.20).
GOPHER_WORDS = (20, 100_000)
GOPHER_MWL = (3.0, 10.0)
GOPHER_MIN_STOPWORDS = 2
GOPHER_TOP2_MAX = 0.06
GOPHER_REP3_MAX = 0.01


def tx_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed Gopher repetition/quality document gate: every
    signal and the final keep/drop verdict in ONE codegen'd projection —
    zero shuffles, the cheapest possible 100-TB shape (like
    tx_repetition_ratio, the n-gram work happens in per-row array
    expressions; docs are bounded, so the O(|grams|²) dominance count is
    constant per row). Signals: word count, mean word length, distinct
    stopwords, top-2-gram dominance (count fraction of the most frequent
    word 2-gram), duplicate-3-gram fraction."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks())
    n_tok = F.size("toks").cast("bigint")
    n_chars = F.length("text").cast("bigint")
    mwl = (n_chars - n_tok + 1).cast("double") / n_tok.cast("double")
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct("toks"), sw)).cast("bigint")
    g2 = F.expr(
        "transform(sequence(1, greatest(1, size(toks)-1)),"
        " i -> array_join(slice(toks, i, 2), ' '))"
    )
    g3 = F.expr(
        f"transform(sequence(1, greatest(1, size(toks)-{REP_NGRAM - 1})),"
        f" i -> array_join(slice(toks, i, {REP_NGRAM}), ' '))"
    )
    with_grams = docs.withColumn("g2", g2).withColumn("g3", g3)
    top2_cnt = F.expr(
        "array_max(transform(array_distinct(g2), d -> size(filter(g2, x -> x = d))))"
    ).cast("bigint")
    top2_frac = top2_cnt.cast("double") / F.size("g2").cast("double")
    rep3 = (
        F.lit(1.0)
        - F.size(F.array_distinct("g3")).cast("double") / F.size("g3").cast("double")
    )
    out = with_grams.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mwl.alias("mean_word_len"),
        n_stop.alias("n_distinct_stopwords"),
        top2_frac.alias("top_2gram_frac"),
        rep3.alias("dup_3gram_frac"),
    )
    keep = (
        F.col("n_tokens").between(*GOPHER_WORDS)
        & F.col("mean_word_len").between(*GOPHER_MWL)
        & (F.col("n_distinct_stopwords") >= GOPHER_MIN_STOPWORDS)
        & (F.col("top_2gram_frac") <= GOPHER_TOP2_MAX)
        & (F.col("dup_3gram_frac") <= GOPHER_REP3_MAX)
    )
    return out.withColumn("keep", keep)


TX_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(length(text) - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE)
           AS mean_word_len,
         CAST(len(list_intersect(list_distinct(toks), [{_SW_EN}])) AS BIGINT)
           AS n_distinct_stopwords,
         list_transform(generate_series(1, greatest(1, len(toks)-1)),
                        i -> array_to_string(toks[i:i+1], ' ')) AS g2,
         list_transform(generate_series(1, greatest(1, len(toks)-{REP_NGRAM - 1})),
                        i -> array_to_string(toks[i:i+{REP_NGRAM - 1}], ' ')) AS g3
  FROM t
),
s AS (
  SELECT doc_id, n_tokens, mean_word_len, n_distinct_stopwords,
         CAST(list_max(list_transform(list_distinct(g2),
              d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE)
           / CAST(len(g2) AS DOUBLE) AS top_2gram_frac,
         1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
           AS dup_3gram_frac
  FROM g
)
SELECT doc_id, n_tokens, mean_word_len, n_distinct_stopwords,
       top_2gram_frac, dup_3gram_frac,
       (n_tokens BETWEEN {GOPHER_WORDS[0]} AND {GOPHER_WORDS[1]}
        AND mean_word_len BETWEEN {GOPHER_MWL[0]} AND {GOPHER_MWL[1]}
        AND n_distinct_stopwords >= {GOPHER_MIN_STOPWORDS}
        AND top_2gram_frac <= {GOPHER_TOP2_MAX}
        AND dup_3gram_frac <= {GOPHER_REP3_MAX}) AS keep
FROM s
"""


SPECS = [
    QuerySpec("tx_token_stats", tx_token_stats, TX_TOKEN_ORACLE),
    QuerySpec("tx_gopher_gate", tx_gopher_gate, TX_GOPHER_ORACLE),
    QuerySpec("tx_posting_lists", tx_posting_lists, TX_POSTING_ORACLE),
    QuerySpec("tx_dup_span_coverage", tx_dup_span_coverage, TX_DUP_SPAN_ORACLE),
    QuerySpec("pipe_strip_dup_spans", pipe_strip_dup_spans, PIPE_STRIP_DUP_ORACLE),
    QuerySpec("tx_quality_score", tx_quality_score, TX_QUALITY_ORACLE),
    QuerySpec("tx_langid", tx_langid, TX_LANGID_ORACLE),
    QuerySpec("tx_langid_eval", tx_langid_eval, TX_LANGID_EVAL_ORACLE),
    QuerySpec("tx_fingerprint", tx_fingerprint, TX_FINGERPRINT_ORACLE),
    QuerySpec("tx_source_rollup", tx_source_rollup, TX_ROLLUP_ORACLE),
    QuerySpec("sk1_salted_source_agg", sk1_salted_source_agg, SK1_ORACLE),
    QuerySpec("tx_chunk_documents", tx_chunk_documents, TX_CHUNK_ORACLE),
    QuerySpec("tx_repetition_ratio", tx_repetition_ratio, TX_REPETITION_ORACLE),
    QuerySpec("tx_contamination", tx_contamination, TX_CONTAMINATION_ORACLE),
    QuerySpec("tx_boilerplate_strip", tx_boilerplate_strip, TX_BOILERPLATE_ORACLE),
    QuerySpec("tx_bigram_lm_score", tx_bigram_lm_score, TX_BIGRAM_LM_ORACLE),
    QuerySpec("tx_quality_deciles", tx_quality_deciles, TX_QUALITY_DECILES_ORACLE),
    QuerySpec("tx_pmi_pairs", tx_pmi_pairs, TX_PMI_ORACLE),
]


ZIPF_R = 200  # head of the rank-frequency curve used for the fit


def tx_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: closed-form OLS
    of ln(freq) on ln(rank) over the top-:data:`ZIPF_R` terms — the
    standard corpus-health diagnostic (a healthy natural-language crawl
    sits near slope −1; template/boilerplate-heavy corpora flatten).

    Cross-engine determinism: ln() is libm-backed, so each ln is
    ROUNDED TO DECIMAL(10,5) before any arithmetic (the tx_pmi/bigram-LM
    idiom, one scale tighter); products and sums then stay in exact
    decimal — scale 10 keeps the widest sum's scaled integer below 2^53,
    where decimal→double conversion is correctly rounded in BOTH engines
    (DuckDB's int128 path is not, above it) — and the final slope /
    intercept are identical chains of IEEE double ops on identical
    inputs. Ranks tie-break by term so both engines agree.

    100-TB shape: one corpus groupBy for term counts, TakeOrdered(R)
    head, then all fit math over R rows."""
    docs = _docs_parallel(spark, sf_dir)
    terms = docs.select(F.explode(_toks()).alias("term")).filter(F.col("term") != "")
    freq = terms.groupBy("term").agg(F.count("*").alias("cnt"))
    top = freq.orderBy(F.desc("cnt"), F.asc("term")).limit(ZIPF_R)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))  # R rows — bounded
    ranked = top.withColumn("rank", F.row_number().over(w))
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).cast("decimal(10,5)").alias("x"),
        F.log(F.col("cnt").cast("double")).cast("decimal(10,5)").alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return s.select(
        F.col("n").cast("int").alias("r_terms"),
        slope.alias("slope"),
        ((sy - slope * sx) / nd).alias("intercept"),
    )


TX_ZIPF_ORACLE = f"""
WITH terms AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
freq AS (
  SELECT term, COUNT(*) AS cnt FROM terms WHERE term <> '' GROUP BY term),
top AS (
  SELECT term, cnt FROM freq ORDER BY cnt DESC, term LIMIT {ZIPF_R}),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM top),
xy AS (
  SELECT CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(10,5)) AS x,
         CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(10,5)) AS y
  FROM ranked),
s AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM xy)
SELECT CAST(n AS INT) AS r_terms,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM s
"""


SPECS.append(QuerySpec("tx_zipf_fit", tx_zipf_fit, TX_ZIPF_ORACLE))


# ---------------------------------------------------------------------------
# Full winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003) — the
# window-min selection tx_fingerprint collapses to a single global min.
# ---------------------------------------------------------------------------

WINNOW_K = 5        # k-gram size (shared with tx_fingerprint's shingles)
WINNOW_W = 4        # selection window: density guarantee 2 / (w + 1)
_WINNOW_POS_BASE = 1048576  # 2^20: (hash, pos) packed into one bigint


def tx_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    k-gram, slide a w-wide window over the hash sequence, keep the
    minimal hash of each window, dedupe. Guarantees: every match of
    length >= w + k - 1 shares a fingerprint, and expected density is
    2/(w+1) — the local-selection properties tx_fingerprint's single
    global min does not have.

    Engine-exactness: the window argmin packs (hash, pos) into one
    bigint (hash·2^20 + pos) so MIN resolves hash ties to the LEFTMOST
    position — Schleimer et al. pick the rightmost; the density bound
    is insensitive to the choice, and packed-integer MIN is identical
    algebra in both engines. Positions are bounded by the pack base:
    documents beyond 2^20 tokens go through tx_chunk_documents first
    (the fixture max is ~10^2).

    100-TB shape: one token explode (linear in corpus tokens), one
    window partitioned BY DOCUMENT (bounded frames — never a global
    sort), one distinct on (doc, fingerprint). The fingerprint set is
    the dedup/contamination index feed; its size is the 2/(w+1)
    density times the token count."""
    docs = _docs_parallel(spark, sf_dir)
    grams = docs.withColumn("toks", _toks()).select(
        "doc_id",
        F.greatest(F.lit(1), F.size("toks") - (WINNOW_K - 1)).alias("n_h"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(1, size(toks) - {WINNOW_K - 1})),"
                f" i -> array_join(slice(toks, i, {WINNOW_K}), ' '))"
            )
        ).alias("pos0", "gram"),
    )
    hashed = grams.select(
        "doc_id",
        "n_h",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint").alias("h"),
    )
    packed = F.col("h") * _WINNOW_POS_BASE + F.col("pos")
    wmin = F.min(packed).over(
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    )
    # full windows only (pos <= n_h - w + 1); a doc with fewer than w
    # hashes keeps its single truncated window = the global min.
    fps = hashed.withColumn("c", wmin).filter(
        F.col("pos") <= F.greatest(F.lit(1), F.col("n_h") - (WINNOW_W - 1))
    )
    return (
        fps.select(
            "doc_id",
            (F.col("c") % _WINNOW_POS_BASE).alias("fp_pos"),
            F.expr(f"c div {_WINNOW_POS_BASE}").alias("fp_hash"),
        )
        .distinct()
        .orderBy("doc_id", "fp_pos")
    )


TX_WINNOWING_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
grams AS (
  SELECT doc_id,
         greatest(1, len(toks) - {WINNOW_K - 1}) AS n_h,
         CAST(i AS BIGINT) AS pos,
         CAST('0x' || substr(md5(array_to_string(toks[i:i+{WINNOW_K - 1}], ' ')), 1, 8)
              AS BIGINT) AS h
  FROM t, unnest(generate_series(1, greatest(1, len(toks) - {WINNOW_K - 1}))) AS g(i)
),
win AS (
  SELECT doc_id, pos, n_h,
         MIN(h * {_WINNOW_POS_BASE} + pos) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS c
  FROM grams
)
SELECT DISTINCT doc_id,
       c % {_WINNOW_POS_BASE} AS fp_pos,
       c // {_WINNOW_POS_BASE} AS fp_hash
FROM win
WHERE pos <= greatest(1, n_h - {WINNOW_W - 1})
ORDER BY doc_id, fp_pos
"""


SPECS.append(QuerySpec("tx_winnowing", tx_winnowing, TX_WINNOWING_ORACLE))


WINNOW_SHARED_MIN = 5   # pair threshold (fixture near-dups share 15-37)
WINNOW_DF_CAP = 100     # boilerplate suppression: ignore over-common fps


def dedup_winnow_pairs(
    spark: SparkSession, sf_dir: str, min_shared: int = WINNOW_SHARED_MIN
) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints — MOSS's own
    pair stage: the inverted index over tx_winnowing's fingerprint
    HASHES (positions matter within a doc, not across docs) yields
    candidate pairs; a pair survives at >= WINNOW_SHARED_MIN shared
    fingerprints, scored by containment (shared / smaller fingerprint
    set). Winnowing guarantees any CONTIGUOUS match of length
    >= w + k - 1 shares at least ONE fingerprint, so candidate
    generation at min_shared=1 has guaranteed recall on long
    overlaps — the structural property the MinHash path only has
    probabilistically (pinned vs the exact Jaccard pairs in pytest).
    The registered default (min_shared=WINNOW_SHARED_MIN) trades that
    floor for precision: fixture near-dups share 15-37 fingerprints,
    random collisions 1-2.

    Fingerprints with document frequency above WINNOW_DF_CAP are
    dropped before the pair join (boilerplate suppression — exactly
    MOSS's ignore-over-common rule, and the same hot-key fanout cap
    the shingle index uses). Fixture max df is 3; the cap is the
    100-TB guard, not a fixture tweak.

    100-TB shape: shuffle key = fingerprint hash (capped fanout),
    pair volume = sum df·(df-1)/2 over kept fingerprints — the
    sparsity winnowing's 2/(w+1) density bought. Every join here is
    UNHINTED: ``df_counts`` has one row per kept fingerprint and
    ``na``/``nb`` one row per document — corpus-cardinality frames
    that must never be forced broadcast (the anti-pattern the MinHash
    path purged in round 6). The join keys (``fp``, then ``d1``/``d2``)
    are exactly the existing shuffle keys, so the unhinted shuffle
    joins co-locate for free; AQE may still broadcast from MEASURED
    stats at small scale, which is safe because it is size-gated."""
    fps = (
        tx_winnowing(spark, sf_dir)
        .select("doc_id", F.col("fp_hash").alias("fp"))
        .distinct()
    )
    df_counts = fps.groupBy("fp").agg(F.count("*").alias("df"))
    kept = fps.join(
        df_counts.filter(F.col("df") <= WINNOW_DF_CAP), "fp"
    ).select("doc_id", "fp")
    sizes = kept.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    na = sizes.select(F.col("doc_id").alias("d1"), F.col("n_fp").alias("n1"))
    nb = sizes.select(F.col("doc_id").alias("d2"), F.col("n_fp").alias("n2"))
    return (
        shared.join(na, "d1")
        .join(nb, "d2")
        .select(
            "d1",
            "d2",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least("n1", "n2").cast("double")
            ).alias("containment"),
        )
        .orderBy("d1", "d2")
    )


DEDUP_WINNOW_PAIRS_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
grams AS (
  SELECT doc_id,
         greatest(1, len(toks) - {WINNOW_K - 1}) AS n_h,
         CAST(i AS BIGINT) AS pos,
         CAST('0x' || substr(md5(array_to_string(toks[i:i+{WINNOW_K - 1}], ' ')), 1, 8)
              AS BIGINT) AS h
  FROM t, unnest(generate_series(1, greatest(1, len(toks) - {WINNOW_K - 1}))) AS g(i)
),
win AS (
  SELECT doc_id, pos, n_h,
         MIN(h * {_WINNOW_POS_BASE} + pos) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS c
  FROM grams
),
fps AS (
  SELECT DISTINCT doc_id, c // {_WINNOW_POS_BASE} AS fp
  FROM win WHERE pos <= greatest(1, n_h - {WINNOW_W - 1})
),
kept AS (
  SELECT doc_id, fp FROM fps
  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {WINNOW_DF_CAP})
),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM kept GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_SHARED_MIN}
)
SELECT d1, d2, CAST(shared AS BIGINT) AS shared,
       CAST(shared AS DOUBLE) / CAST(LEAST(na.n_fp, nb.n_fp) AS DOUBLE) AS containment
FROM shared
JOIN sizes na ON na.doc_id = d1
JOIN sizes nb ON nb.doc_id = d2
ORDER BY d1, d2
"""


SPECS.append(
    QuerySpec("dedup_winnow_pairs", dedup_winnow_pairs, DEDUP_WINNOW_PAIRS_ORACLE)
)


def tx_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per document (in doc_id ingest order), the
    fraction of its 5-gram shingles appearing for the FIRST time —
    min(doc_id) over the shingle's postings attributes each shingle to
    its earliest document, no ordered scan needed. The curation signal
    that says when a source stops adding information (novelty decays →
    crawl is re-reading itself → dedup/stop); the complement of the
    duplication profiles in the dedup family.

    100-TB shape: one shingle explode + one (shingle -> min doc)
    aggregate + one join back — all shuffle on the shingle hash, the
    same layout the posting-list and Jaccard kernels use."""
    docs = _docs_parallel(spark, sf_dir).withColumn("toks", _toks())
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(1, size(toks) - 4)),"
                " i -> array_join(slice(toks, i, 5), ' '))"
            )
        ).alias("shingle"),
    ).distinct()
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias(
            "novelty"
        ),
    ).orderBy("doc_id")


TX_NOVELTY_ORACLE = """
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i:i+4], ' ') AS shingle
  FROM t, unnest(generate_series(1, greatest(1, len(toks) - 4))) AS g(i)
),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM sh JOIN first USING (shingle)
GROUP BY doc_id
ORDER BY doc_id
"""


SPECS.append(QuerySpec("tx_ngram_novelty", tx_ngram_novelty, TX_NOVELTY_ORACLE))


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (round 11) — the inverted-index ranking function
# every lexical search / RAG retrieval stack runs (Robertson & Zaragoza
# 2009, "The Probabilistic Relevance Framework: BM25 and Beyond").
# ---------------------------------------------------------------------------

BM25_K1 = 1.2  # term-frequency saturation
BM25_B = 0.75  # document-length normalization strength
BM25_TOPK = 5
N_BM25_QUERIES = 3  # probe docs (doc_id < 3) — sim_doc_hashed_topk's probe set


def _bm25_scored(
    spark: SparkSession, sf_dir: str, n_queries: int = N_BM25_QUERIES
) -> DataFrame:
    """(qid, doc_id, n_terms, score_scaled): every probe document's BM25
    score against every candidate document sharing at least one term —
    the shared scoring block behind :func:`tx_bm25_topk` and the hybrid
    RRF fusion (pipeline_ext.sim_hybrid_rrf).

    Retrieval topology, not a scan-per-query: tf is the inverted index
    (one corpus groupBy), the probe term block is broadcast, and the
    postings equi-join on ``term`` touches only candidates containing a
    query term. Per-query work is bounded by posting-list length — the
    same plan a 1000-executor cluster wants at 100 TB (df-skewed terms
    are the posting lists themselves; a production deployment would
    additionally drop stop-terms with df above a MAX_DF cap, the
    shingle-index discipline, which at these SFs removes nothing).

    Determinism: idf = ln((N − df + ½)/(df + ½) + 1) (the Lucene form,
    always ≥ 0) is libm-backed, so it is snapped to DECIMAL(10,5) before
    use (the tx_zipf/tx_pmi idiom); the saturation factor is an
    identical chain of IEEE double ops on exact ints (tf, dl) and shared
    literals; each contribution is snapped to the 1e-6 grid AS AN
    INTEGER and summed exactly (the PSI idiom) — never a float sum.
    N and avgdl are driver literals (exact-int count + one IEEE
    division, the tx_tfidf pattern)."""
    from pyspark import StorageLevel

    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(_toks()).alias("term")).filter(
        F.col("term") != ""
    )
    # tf is the inverted index; it feeds dl, df, the probe block AND the
    # postings join — persist the compact (doc, term, tf) frame so the
    # scan+explode+shuffle subtree runs once (the tx_hashed_features
    # discipline). Cache lifetime: session-pinned by design, like the
    # partnership-edge cache (PERFORMANCE.md round-10 — unpersist
    # variants measured 2.3-3.1x slower there); repeat calls do NOT
    # stack copies because Spark's CacheManager dedupes persists by
    # canonicalized plan, so tx_bm25_topk + sim_hybrid_rrf share one
    # entry. df/dl are grouped aggregates joined back, NOT
    # per-term/per-doc windows: a `COUNT(*) OVER (PARTITION BY term)`
    # funnels each stop-term's full posting list through one task with
    # no AQE escape, while the join form gets skew-split at runtime.
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Round 14 (guide §7.3, the change-8 pattern): N and Σtf were two
    # SEQUENTIAL construct-phase jobs (docs.count + a 1-row agg that
    # forced the tf cache build) feeding literal idf/avgdl terms. They
    # now enter as uncorrelated scalar subqueries inside one spark.sql
    # build — zero construct jobs, same cached tf, and the arithmetic
    # tree is unchanged term for term: N and Σtf are exact int64s below
    # 2^53, so CAST(...AS DOUBLE) and the one IEEE division reproduce
    # the old Python-side avgdl double bit-for-bit; double literals
    # carry the D suffix so no decimal-typed literal enters the float
    # math. Broadcast hint on the probe block mirrors F.broadcast(q).
    # Round 15: the persisted inverted index enters the SQL through a
    # TEMP VIEW, never as a spark.sql parameter — substituting a
    # persisted DataFrame UNREGISTERS its CacheManager entry
    # (util/sqlview.py), which round 14 shipped as 0 InMemoryRelation
    # and the scan+explode+tf shuffle recomputed per reference (the
    # r14-verdict tx_bm25 regression). df/dl derive from the view IN
    # SQL for the same reason (identical groupBy plans); docs is the
    # only remaining parameter and is cache-free.
    tf_v = temp_view_for(tf, "bm25_tf")
    return spark.sql(
        f"""
SELECT /*+ BROADCAST(q) */ q.qid, en.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       SUM(CAST(FLOOR(
         CAST(CAST(LN((CAST((SELECT COUNT(*) FROM {{docs}}) - en.df AS DOUBLE) + 0.5D) /
                      (CAST(en.df AS DOUBLE) + 0.5D) + 1.0D)
                  AS DECIMAL(10,5)) AS DOUBLE)
         * ((CAST(en.tf AS DOUBLE) * {BM25_K1 + 1.0!r}D) /
            (CAST(en.tf AS DOUBLE) + {BM25_K1!r}D *
             ({1.0 - BM25_B!r}D + {BM25_B!r}D *
              (CAST(en.dl AS DOUBLE) /
               (CAST((SELECT SUM(tf) FROM {tf_v}) AS DOUBLE) /
                CAST((SELECT COUNT(*) FROM {{docs}}) AS DOUBLE))))))
         * 1e6 + 0.5D) AS BIGINT)) AS score_scaled
FROM (SELECT t.doc_id, t.term, t.tf, d.df, l.dl
      FROM {tf_v} t
      JOIN (SELECT term, COUNT(*) AS df FROM {tf_v} GROUP BY term) d USING (term)
      JOIN (SELECT doc_id, SUM(tf) AS dl FROM {tf_v} GROUP BY doc_id) l USING (doc_id)) en
JOIN (SELECT doc_id AS qid, term FROM {tf_v} WHERE doc_id < {n_queries}) q
  USING (term)
WHERE en.doc_id != q.qid
GROUP BY q.qid, en.doc_id
""",
        docs=docs,
    )


def tx_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-:data:`BM25_TOPK` BM25 neighbors per probe document — the
    lexical ("more like this") retrieval twin of the embedding-side
    sim_topk_bruteforce, over the same probe ids. See
    :func:`_bm25_scored` for topology and determinism."""
    scored = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("qid").orderBy(F.col("score_scaled").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "qid",
            "rank",
            "doc_id",
            "n_terms",
            (F.col("score_scaled").cast("double") / F.lit(1e6)).alias("bm25"),
        )
    )


_BM25_CTES = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term),
meta AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         CAST(SUM(tf) AS DOUBLE) / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS avgdl
  FROM tf),
en AS (
  SELECT doc_id, term, tf,
         SUM(tf) OVER (PARTITION BY doc_id) AS dl,
         COUNT(*) OVER (PARTITION BY term) AS df
  FROM tf),
scored AS (
  SELECT q.doc_id AS qid, en.doc_id, COUNT(*) AS n_terms,
         SUM(CAST(floor(
           CAST(CAST(ln((CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                AS DECIMAL(10,5)) AS DOUBLE)
           * ((CAST(en.tf AS DOUBLE) * {BM25_K1 + 1.0}) /
              (CAST(en.tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} *
               (CAST(dl AS DOUBLE) / avgdl))))
           * 1000000.0 + 0.5) AS BIGINT)) AS score_scaled
  FROM en
  JOIN (SELECT doc_id, term FROM tf WHERE doc_id < {N_BM25_QUERIES}) q USING (term)
  CROSS JOIN meta
  WHERE en.doc_id <> q.doc_id
  GROUP BY q.doc_id, en.doc_id)
"""

TX_BM25_ORACLE = (
    _BM25_CTES
    + f"""
SELECT qid, rank, doc_id, CAST(n_terms AS BIGINT) AS n_terms,
       CAST(score_scaled AS DOUBLE) / 1000000.0 AS bm25
FROM (
  SELECT qid, doc_id, n_terms, score_scaled,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rank
  FROM scored) r
WHERE rank <= {BM25_TOPK}
"""
)


SPECS.append(QuerySpec("tx_bm25_topk", tx_bm25_topk, TX_BM25_ORACLE))


# ---------------------------------------------------------------------------
# DSIR importance weights (round 11) — Data Selection via Importance
# Resampling (Xie et al. 2023): score every raw document by the
# log-likelihood ratio of a target-domain unigram model over a raw model,
# both on hashed token buckets. Docs whose hashed-unigram profile looks
# more like the target than like the average crawl get positive weight —
# THE standard cheap pre-filter for "select crawl data that looks like
# my curated corpus" before training.
# ---------------------------------------------------------------------------

DSIR_DIM = 256  # hashed vocabulary buckets (the tx_hashed_features trick)
DSIR_TARGET_LANG = "en"  # target domain: the curated-looking slice


def tx_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight.

    Both unigram models live on :data:`DSIR_DIM` hashed buckets with
    add-1 smoothing, so the model table is bounded metadata (DIM rows)
    and broadcastable at any corpus size; the per-doc fold is one
    map-side-combinable aggregate over the (doc, bucket) tf frame.

    Determinism: the per-bucket log-ratio is snapped to DECIMAL(10,5)
    and carried as an exact ×1e5 integer; per-doc weights are
    Σ tf·lr_scaled — integer arithmetic end to end, one final IEEE
    division back to the float weight. Totals are driver literals from
    one 1-row aggregate (the BM25/tfidf pattern).

    100-TB shape: tokenize+hash is embarrassingly parallel; the model
    build is a DIM-row aggregate; scoring joins tf against the
    broadcast DIM-row model — no shuffle grows with the corpus beyond
    the (doc, bucket) groupBy."""
    docs = _docs_parallel(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(_toks()).alias("term"),
    ).filter(F.col("term") != "")
    bucketed = toks.select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint") % DSIR_DIM)
        .cast("int")
        .alias("bkt"),
    )
    tf = bucketed.groupBy("doc_id", "lang", "bkt").agg(F.count("*").alias("tf"))
    is_t = F.col("lang") == DSIR_TARGET_LANG
    model = tf.groupBy("bkt").agg(
        F.sum(F.when(is_t, F.col("tf")).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_t, F.col("tf")).otherwise(0)).alias("cr"),
    )
    tot = model.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    ).collect()[0]  # 1-row agg: two exact longs
    tot_t, tot_r = int(tot["tt"]), int(tot["tr"])
    lr = F.log(
        ((F.col("ct") + F.lit(1)).cast("double") / F.lit(float(tot_t + DSIR_DIM)))
        / ((F.col("cr") + F.lit(1)).cast("double") / F.lit(float(tot_r + DSIR_DIM)))
    ).cast("decimal(10,5)")
    model_s = model.select(
        "bkt", (lr * F.lit(100000)).cast("bigint").alias("lr_scaled")
    )
    scored = (
        tf.join(F.broadcast(model_s), "bkt")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lr_scaled")).alias("w_scaled"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.col("w_scaled").cast("double") / F.lit(1e5)).alias("dsir_logratio"),
        (F.col("w_scaled") > 0).alias("selected"),
    )


TX_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
b AS (
  SELECT doc_id, lang,
         CAST(CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % {DSIR_DIM} AS INT) AS bkt
  FROM toks WHERE term <> ''),
tf AS (
  SELECT doc_id, lang, bkt, COUNT(*) AS tf FROM b GROUP BY doc_id, lang, bkt),
model AS (
  SELECT bkt,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END) AS ct,
         SUM(CASE WHEN lang <> '{DSIR_TARGET_LANG}' THEN tf ELSE 0 END) AS cr
  FROM tf GROUP BY bkt),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM model),
model_s AS (
  SELECT bkt,
         CAST(CAST(ln(
             ((CAST(ct AS DOUBLE) + 1.0) / CAST(tt + {DSIR_DIM} AS DOUBLE))
           / ((CAST(cr AS DOUBLE) + 1.0) / CAST(tr + {DSIR_DIM} AS DOUBLE)))
           AS DECIMAL(10,5)) * 100000 AS BIGINT) AS lr_scaled
  FROM model CROSS JOIN tot)
SELECT doc_id, lang,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(tf * lr_scaled) AS DOUBLE) / 100000.0 AS dsir_logratio,
       SUM(tf * lr_scaled) > 0 AS selected
FROM tf JOIN model_s USING (bkt)
GROUP BY doc_id, lang
ORDER BY doc_id
"""


SPECS.append(QuerySpec("tx_dsir_weights", tx_dsir_weights, TX_DSIR_ORACLE))


# ---------------------------------------------------------------------------
# CCNet-style perplexity tiers (round 11). CCNet (Wenzek et al. 2020)
# buckets each language's documents into head/middle/tail thirds of the
# LM-perplexity distribution and trains mostly on the head. The LM here
# is the engine's own corpus-trained bigram model (tx_bigram_lm_score —
# KenLM stand-in), so the tiering is self-contained and oracle-exact.
# ---------------------------------------------------------------------------

PPL_GRID = 1000      # logprob grid = floor(avg_logprob * 1000)
PPL_TIERS = 3        # head / middle / tail


def tx_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, tier) corpus report: doc count and mean/min/max bigram
    log-probability, where tier 0 = head (highest avg logprob = lowest
    perplexity) per language. Only docs the LM scores (≥2 tokens) tier.

    Tier assignment is tx_quality_deciles' histogram-CDF device, per
    language and in DESCENDING score order: snap avg_logprob to a 1e-3
    grid (bounds the histogram regardless of corpus size), tier(v) =
    (docs strictly above v) * 3 div N_lang — pure integer math, ties
    share a tier deterministically.

    100-TB shape: the LM score is tx_bigram_lm_score's two model
    aggregations + scoring join; on top of that ONE (lang, grid)
    map-side-combined histogram, windows over that bounded histogram
    only (each lang partition holds grid rows, never docs), and a
    broadcast tier-map join back. Per-lang N comes from a window over
    the histogram itself — no driver collect, no corpus recount."""
    scored = tx_bigram_lm_score(spark, sf_dir).select("doc_id", "avg_logprob")
    lang = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    g = scored.join(lang, "doc_id").select(
        "lang",
        "avg_logprob",
        F.floor(F.col("avg_logprob") * PPL_GRID).cast("bigint").alias("p_grid"),
    )
    # Round 15 (guide §2.3 "aggregate before you shuffle", §2.4): the
    # per-doc frame used to be consumed TWICE — once to build the
    # histogram/tier map and once more in a broadcast join back for the
    # final per-(lang, tier) aggregate — and the two consumers shuffle
    # on different keys, so runtime exchange reuse could not dedupe the
    # scoring subtree (executed plan: 2 ReusedExchange / 58 Exchange,
    # the whole LM scoring pass ran twice per execution). Every output
    # column is cell-decomposable, so ALL per-doc aggregates now fold
    # into the ONE bounded (lang, p_grid) histogram — cnt, the exact
    # decimal sum, min, max — and the tier map plus the final aggregate
    # compute over grid rows only. Identical values: tier is a function
    # of (lang, p_grid), decimal sums/mins/maxes are exact and
    # order-free, sum(cnt) equals the old COUNT(*), and the
    # decimal(18,8)→double cast and the one IEEE divide see the same
    # operands. ABAB (7 alternating rounds, one JVM): med 1.767 →
    # 1.549 s, min 1.526 → 1.330 s; exceptAll 0 both ways at sf0.01
    # AND sf0.1.
    hist = g.groupBy("lang", "p_grid").agg(
        F.count("*").alias("cnt"),
        F.sum("avg_logprob").alias("slp"),
        F.min("avg_logprob").alias("mn_lp"),
        F.max("avg_logprob").alias("mx_lp"),
    )
    w_above = (
        Window.partitionBy("lang")
        .orderBy(F.col("p_grid").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tiered = (
        hist.withColumn(
            "cum_above", F.coalesce(F.sum("cnt").over(w_above), F.lit(0))
        )
        .withColumn("n_lang", F.sum("cnt").over(Window.partitionBy("lang")))
        .withColumn(
            "tier",
            # exact integer division — cum*3 outgrows double's 53-bit
            # integer range at corpus scale (the deciles rationale)
            F.expr(f"(cum_above * {PPL_TIERS}) div n_lang").cast("bigint"),
        )
    )
    return (
        tiered.groupBy("lang", "tier")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            # exact decimal sum, downcast (fits: |sum| < 1e10), then ONE
            # int64-exact →double conversion and ONE IEEE divide — both
            # engines see identical inputs at every step
            (
                F.sum("slp").cast("decimal(18,8)").cast("double")
                / F.sum("cnt")
            ).alias("mean_lp"),
            F.min("mn_lp").cast("double").alias("min_lp"),
            F.max("mx_lp").cast("double").alias("max_lp"),
        )
        .orderBy("lang", "tier")
    )


TX_PPL_BUCKETS_ORACLE = f"""
WITH scored AS (SELECT doc_id, avg_logprob FROM ({TX_BIGRAM_LM_ORACLE}) lm),
g AS (
  SELECT s.doc_id, d.lang, s.avg_logprob,
         CAST(floor(avg_logprob * {PPL_GRID}) AS BIGINT) AS p_grid
  FROM scored s JOIN documents d USING (doc_id)
),
hist AS (SELECT lang, p_grid, COUNT(*) AS cnt FROM g GROUP BY lang, p_grid),
tiers AS (
  SELECT lang, p_grid,
         CAST((COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY p_grid DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * {PPL_TIERS})
              // SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS tier
  FROM hist
)
SELECT lang, tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(SUM(avg_logprob) AS DECIMAL(18,8)) AS DOUBLE) / COUNT(*) AS mean_lp,
       CAST(MIN(avg_logprob) AS DOUBLE) AS min_lp,
       CAST(MAX(avg_logprob) AS DOUBLE) AS max_lp
FROM g JOIN tiers USING (lang, p_grid)
GROUP BY lang, tier
ORDER BY lang, tier
"""

SPECS.append(QuerySpec("tx_ppl_buckets", tx_ppl_buckets, TX_PPL_BUCKETS_ORACLE))


# ---------------------------------------------------------------------------
# Quality-filter classifier (round 14) — the CCNet/fasttext-style learned
# quality gate every LLM data pipeline runs (Wenzek et al. 2020 trains a
# model to keep "Wikipedia-like" pages; GPT-3's pipeline does the same).
# A linear probe over cheap per-doc statistics, trained by full-batch
# gradient descent IN the engine: per round, one scan of the compact
# feature frame + one 1-row map-side-combinable gradient aggregate; the
# (QL_DIM+1)-value weight vector re-enters the next round as literal
# coefficients (the emb_kmeans discipline — the model IS the collect).
#
# Cross-engine determinism without libm: the link is the "fast sigmoid"
# p = 1/2 + (m/2)/(1+|m|) — one IEEE division (correctly rounded, so
# bit-identical in Spark and DuckDB), unlike exp()-based logistic which
# is libm-dependent and would need grid forgiveness. Everything else is
# fixed-point int64: features are 1e6-scaled ints (centered so GD can
# move the boundary), margins are exact int64 sums (< 2^53, so the cast
# to double is exact), p is snapped to the 1e6 grid half-up, and the
# gradient Σ(p−y)·x accumulates in DECIMAL(38,0) — exact and
# order-independent (no float-sum reordering hazard), with headroom for
# web-scale N where an int64 accumulator would overflow (N·1e12 > 2^63
# past ~9M docs). The weight update's single rounding
# floor(g/(N·1e6)+0.5) is mirrored between the Python driver and the
# oracle's unrolled CTE chain.
# ---------------------------------------------------------------------------

QL_SCALE = 1_000_000          # fixed-point scale for features/weights/p
QL_ROUNDS = 4                 # full-batch GD rounds (lr = 1.0)
QL_CHAR_CAP = 512             # n_chars saturation for the length feature
QL_TOK_CAP = 64               # token-count saturation
QL_DIST_CAP = 48              # distinct-term saturation
QL_STOPWORDS = ("the", "a")   # stop-ratio feature vocabulary
QL_FEATURES = (
    "bias", "chars", "tokens", "distinct_terms",
    "type_token_ratio", "stop_ratio", "is_en",
)
QL_DIM = len(QL_FEATURES)


def _quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fixed-point feature vector (x0..x6) + label yf.

    Features are saturating ratios in [0, 1e6] centered to
    [-5e5, +5e5] (an uncentered all-positive design matrix makes
    full-batch GD fight the bias for every boundary move); the label is
    a gopher-style rule gate (enough tokens, bounded stopword density,
    English) the probe has to re-learn from the features. All integer
    arithmetic: div() on positive operands before the centering
    subtraction, so Spark's truncating div and DuckDB's flooring //
    agree. The frame is (doc_id + 8 ints) — the persistable compact
    form, orders of magnitude smaller than the text it summarizes."""
    return quality_features_from(_docs_parallel(spark, sf_dir))


def quality_features_from(docs: DataFrame) -> DataFrame:
    """Feature/label frame from any documents-shaped frame (doc_id,
    text, lang, n_chars). Every feature is PER-DOC (no corpus
    aggregate), which is what makes the trained gate a stateless
    projection over a live stream — quality_gate_stream scores each
    micro-batch with this same builder and frozen weights."""
    S, half = QL_SCALE, QL_SCALE // 2
    toks = docs.select("doc_id", F.explode(_toks()).alias("term")).filter(
        F.col("term") != ""
    )
    tc = toks.groupBy("doc_id").agg(
        F.count("*").alias("nt"),
        F.countDistinct("term").alias("dt"),
        F.sum(
            F.when(F.col("term").isin(*QL_STOPWORDS), 1).otherwise(0)
        ).alias("stop"),
    )
    return docs.join(tc, "doc_id").select(
        "doc_id",
        F.lit(S).cast("bigint").alias("x0"),
        F.expr(
            f"div(least(n_chars, {QL_CHAR_CAP}) * {S}L, {QL_CHAR_CAP}) - {half}"
        ).alias("x1"),
        F.expr(
            f"div(least(nt, {QL_TOK_CAP}) * {S}L, {QL_TOK_CAP}) - {half}"
        ).alias("x2"),
        F.expr(
            f"div(least(dt, {QL_DIST_CAP}) * {S}L, {QL_DIST_CAP}) - {half}"
        ).alias("x3"),
        F.expr(f"div(dt * {S}L, nt) - {half}").alias("x4"),
        F.expr(f"div(stop * {S}L, nt) - {half}").alias("x5"),
        F.when(F.col("lang") == "en", F.lit(half))
        .otherwise(F.lit(-half))
        .cast("bigint")
        .alias("x6"),
        F.when(
            (F.col("nt") >= 25)
            & (F.col("stop") * 10 <= F.col("nt") * 3)
            & (F.col("lang") == "en"),
            F.lit(S),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("yf"),
    )


def _ql_scored(feats: DataFrame, w: "list[int]") -> DataFrame:
    """feats + (pf) under literal fixed-point weights w: margin is the
    exact int64 dot product (|m_fp| ≤ 7·1e6·|w|max < 2^53), the fast-
    sigmoid p is pure IEEE (+,*,/,abs — each correctly rounded, no
    libm), snapped half-up to the 1e6 grid. Weights enter as literal
    coefficients — a projection, not a join, so each GD round is one
    scan + one aggregate with NO shuffle beyond the 1-row combine."""
    m_fp = sum(
        [F.col(f"x{i}") * F.lit(int(w[i])) for i in range(1, QL_DIM)],
        F.col("x0") * F.lit(int(w[0])),
    )
    mr = m_fp.cast("double") / F.lit(1e12)
    p = F.lit(0.5) + F.lit(0.5) * mr / (F.lit(1.0) + F.abs(mr))
    return feats.withColumn(
        "pf", F.floor(p * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    )


def train_quality_logreg(
    feats: DataFrame, rounds: int = QL_ROUNDS
) -> "tuple[list[int], int]":
    """Full-batch GD: returns (fixed-point weights, N). One collect per
    round — a 1-row aggregate of QL_DIM gradient sums + the count
    (SCALAR-1ROW class); the update floor(g/(N·1e6)+0.5) in driver
    floats mirrors the oracle's double expression exactly (Python floats
    ARE IEEE doubles)."""
    import math

    w = [0] * QL_DIM
    n = 0
    for _ in range(rounds):
        scored = _ql_scored(feats, w)
        diff = F.col("pf") - F.col("yf")
        row = scored.agg(
            F.count("*").alias("n"),
            *[
                F.sum((diff * F.col(f"x{i}")).cast("decimal(38,0)")).alias(
                    f"g{i}"
                )
                for i in range(QL_DIM)
            ],
        ).collect()[0]
        n = row["n"]
        if not n:
            break
        w = [
            w[i]
            - math.floor(float(row[f"g{i}"]) / (n * 1e6) + 0.5)
            for i in range(QL_DIM)
        ]
    return [int(v) for v in w], int(n)


def tx_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality probe and return the model: one row per
    feature (feature, weight_fp, weight). The model is the output —
    the frame a pipeline would broadcast to score petabytes of new
    documents with a pure projection (no join, no shuffle, no model
    server). reference: the repo has no ML surface at all; this is
    beyond-reference pipeline capability (SURVEY §2 extension)."""
    from pyspark import StorageLevel

    feats = _quality_features(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w, _ = train_quality_logreg(feats)
    feats.unpersist()  # safe: training collected eagerly, result is driver-built
    rows = [
        (QL_FEATURES[i], w[i], w[i] / float(QL_SCALE)) for i in range(QL_DIM)
    ]
    return spark.createDataFrame(
        rows, schema="feature string, weight_fp bigint, weight double"
    )


def quality_calibration_from(scored: DataFrame) -> DataFrame:
    """(decile, n, n_pos, n_correct, mean_p) from a scored frame — the
    ≤10-row map-side-combinable reliability aggregate, shared by the
    registered query and the quality-filter CLI verb (which trains
    once and reuses the scored frame)."""
    half, s10 = QL_SCALE // 2, QL_SCALE // 10
    return (
        scored.withColumn(
            "decile", F.expr(f"least(div(pf, {s10}), 9)").cast("bigint")
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("yf") == QL_SCALE, 1).otherwise(0)
            ).cast("bigint").alias("n_pos"),
            F.sum(
                F.when(
                    (F.col("pf") >= half) == (F.col("yf") == QL_SCALE), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_correct"),
            (
                F.sum("pf").cast("double")
                / (F.count("*") * F.lit(1e6))
            ).alias("mean_p"),
        )
        .orderBy("decile")
    )


def tx_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/evaluation table of the trained probe: per predicted-
    probability decile, (n, n_pos, n_correct, mean_p) — the reliability
    diagram + confusion mass an operator reads before trusting the gate
    on a fresh crawl. Scoring is the same literal-weight projection;
    the table is one (≤10-row) map-side-combinable aggregate."""
    from pyspark import StorageLevel

    feats = _quality_features(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w, _ = train_quality_logreg(feats)
    return quality_calibration_from(_ql_scored(feats, w))


def _ql_feats_cte() -> str:
    S, half = QL_SCALE, QL_SCALE // 2
    stop_sql = "(" + ", ".join(f"'{t}'" for t in QL_STOPWORDS) + ")"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tc AS (
  SELECT doc_id, COUNT(*) AS nt, COUNT(DISTINCT term) AS dt,
         SUM(CASE WHEN term IN {stop_sql} THEN 1 ELSE 0 END) AS stop
  FROM toks WHERE term <> '' GROUP BY doc_id),
feats AS (
  SELECT d.doc_id,
    CAST({S} AS BIGINT) AS x0,
    (LEAST(d.n_chars, {QL_CHAR_CAP}) * {S}) // {QL_CHAR_CAP} - {half} AS x1,
    (LEAST(tc.nt, {QL_TOK_CAP}) * {S}) // {QL_TOK_CAP} - {half} AS x2,
    (LEAST(tc.dt, {QL_DIST_CAP}) * {S}) // {QL_DIST_CAP} - {half} AS x3,
    (tc.dt * {S}) // tc.nt - {half} AS x4,
    (tc.stop * {S}) // tc.nt - {half} AS x5,
    CASE WHEN d.lang = 'en' THEN {half} ELSE -{half} END AS x6,
    CASE WHEN tc.nt >= 25 AND tc.stop * 10 <= tc.nt * 3 AND d.lang = 'en'
         THEN {S} ELSE 0 END AS yf
  FROM documents d JOIN tc USING (doc_id)),
n AS (SELECT COUNT(*) AS n FROM feats),
w0 AS (SELECT {", ".join(f"CAST(0 AS BIGINT) AS w{i}" for i in range(QL_DIM))})"""


def _ql_round_cte(r: int, prev: str) -> str:
    dot = " + ".join(f"f.x{i} * w.w{i}" for i in range(QL_DIM))
    grads = ",\n    ".join(
        f"w.w{i} - CAST(floor(CAST(SUM(CAST((m.pf - m.yf) * m.x{i} AS DECIMAL(38,0))) AS DOUBLE)"
        f" / (n.n * 1000000.0) + 0.5) AS BIGINT) AS w{i}"
        for i in range(QL_DIM)
    )
    gb = ", ".join(f"w.w{i}" for i in range(QL_DIM))
    xs = ", ".join(f"f.x{i}" for i in range(QL_DIM))
    return f""",
m{r} AS (
  SELECT f.doc_id, f.yf, {xs},
         CAST(floor((0.5 + 0.5 * mr / (1.0 + abs(mr))) * 1000000 + 0.5) AS BIGINT) AS pf
  FROM (SELECT f.*, CAST({dot} AS DOUBLE) / 1e12 AS mr
        FROM feats f CROSS JOIN {prev} w) f),
c{r} AS (
  SELECT
    {grads}
  FROM m{r} m CROSS JOIN {prev} w CROSS JOIN n
  GROUP BY {gb}, n.n)"""


def _ql_train_ctes() -> "tuple[str, str]":
    """(CTE chain through the final weight table, its name)."""
    parts = [_ql_feats_cte()]
    prev = "w0"
    for r in range(1, QL_ROUNDS + 1):
        parts.append(_ql_round_cte(r, prev))
        prev = f"c{r}"
    return "".join(parts), prev


_QL_CTES, _QL_WFIN = _ql_train_ctes()

TX_QUALITY_CLASSIFIER_ORACLE = _QL_CTES + "\n" + "\nUNION ALL\n".join(
    f"SELECT '{QL_FEATURES[i]}' AS feature, w{i} AS weight_fp,"
    f" CAST(w{i} AS DOUBLE) / 1000000.0 AS weight FROM {_QL_WFIN}"
    for i in range(QL_DIM)
)

_QL_DOT_FIN = " + ".join(f"f.x{i} * w.w{i}" for i in range(QL_DIM))

TX_QUALITY_CALIBRATION_ORACLE = (
    _QL_CTES
    + f""",
scored AS (
  SELECT f.doc_id, f.yf,
         CAST(floor((0.5 + 0.5 * mr / (1.0 + abs(mr))) * 1000000 + 0.5) AS BIGINT) AS pf
  FROM (SELECT f.*, CAST({_QL_DOT_FIN} AS DOUBLE) / 1e12 AS mr
        FROM feats f CROSS JOIN {_QL_WFIN} w) f)
SELECT CAST(LEAST(pf // {QL_SCALE // 10}, 9) AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN yf = {QL_SCALE} THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN (pf >= {QL_SCALE // 2}) = (yf = {QL_SCALE})
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(pf) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_p
FROM scored
GROUP BY 1
ORDER BY decile"""
)


def _ql_probes(spark: SparkSession, sf_dir: str) -> "dict[str, DataFrame]":
    """Construction plan of one GD round (weights re-enter as literals,
    so the zero-weight stand-in reproduces the identical round-plan
    structure: scan → scored projection → 1-row gradient combine)."""
    feats = _quality_features(spark, sf_dir)
    scored = _ql_scored(feats, [0] * QL_DIM)
    diff = F.col("pf") - F.col("yf")
    grad = scored.agg(
        F.count("*").alias("n"),
        *[
            F.sum((diff * F.col(f"x{i}")).cast("decimal(38,0)")).alias(f"g{i}")
            for i in range(QL_DIM)
        ],
    )
    return {"logreg_round_grad": grad}


SPECS.append(
    QuerySpec(
        "tx_quality_classifier",
        tx_quality_classifier,
        TX_QUALITY_CLASSIFIER_ORACLE,
        probes=_ql_probes,
    )
)
SPECS.append(
    QuerySpec(
        "tx_quality_calibration",
        tx_quality_calibration,
        TX_QUALITY_CALIBRATION_ORACLE,
        probes=_ql_probes,
    )
)


# ---------------------------------------------------------------------------
# Interpolated Kneser–Ney bigram scoring (round 14, session 2) — the
# smoothing KenLM actually ships (Heafield 2011) and CCNet's filter
# really uses; add-one (tx_bigram_lm_score) systematically over-smooths
# frequent histories. KN replaces "+1 everywhere" with absolute
# discounting plus a CONTINUATION distribution: how many distinct
# histories a word follows, not how often it occurs — the classic
# "San Francisco" example (frequent "Francisco", single history).
# ---------------------------------------------------------------------------

KN_DISCOUNT = 0.75  # standard absolute discount (Chen & Goodman 1999)


def tx_kn_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean ln P_KN(w2|w1) under an interpolated Kneser–Ney
    bigram model trained on the corpus itself:

        P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
                      + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)

    Every statistic derives from ONE reduced (w1, w2, cb) frame
    (vocab²-bounded, cached): c(w1) and N1+(w1,·) are one groupBy(w1)
    (sum + count over the SAME rows), N1+(·,w2) one groupBy(w2), and
    N1+(·,·) = the frame's row count (a scalar literal, the vocab-count
    class). The corpus is scanned twice total (model build + scoring) —
    identical topology to the add-one twin, one extra vocab-bounded
    hash join for the continuation counts.

    Determinism: all counts are exact ints; the probability is a fixed
    tree of correctly-rounded IEEE ops (D = 0.75 is binary-exact, so
    D·n1 is exact too) mirrored verbatim in the oracle; ln() is libm —
    forgiven at the DECIMAL(18,8) snap of the per-doc average, the
    tx_bigram_lm_score precedent (stable in FULLCHECK since round 3).
    P > 0 always: every scored bigram was observed, so the
    continuation term ≥ D/(c(w1)·N1+(·,·)) > 0."""
    docs = load_table(spark, sf_dir, "documents").withColumn("toks", _toks())
    docs = docs.filter(F.size("toks") >= 2)
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks)-1),"
                " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    bi = big.groupBy("w1", "w2").agg(F.count("*").alias("cb")).cache()
    hist = bi.groupBy("w1").agg(
        F.sum("cb").alias("cu"), F.count("*").alias("n1f")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("n1b"))
    n_types = bi.count()  # N1+(·,·): scalar literal (vocab-count class)
    d = F.lit(KN_DISCOUNT)
    p = (
        F.greatest(F.col("cb").cast("double") - d, F.lit(0.0))
        / F.col("cu").cast("double")
        + (d * F.col("n1f").cast("double"))
        / F.col("cu").cast("double")
        * (F.col("n1b").cast("double") / F.lit(float(n_types)))
    )
    return (
        big.join(bi, ["w1", "w2"])
        .join(hist, "w1")
        .join(cont, "w2")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.avg(F.log(p)).cast("decimal(18,8)").alias("kn_logprob"),
        )
    )


TX_KN_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
big AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM toks, unnest(generate_series(1, len(t)-1)) AS g(i)
  WHERE len(t) >= 2
),
bi AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY w1, w2),
hist AS (SELECT w1, SUM(cb) AS cu, COUNT(*) AS n1f FROM bi GROUP BY w1),
cont AS (SELECT w2, COUNT(*) AS n1b FROM bi GROUP BY w2),
nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types FROM bi)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(AVG(ln(
         GREATEST(CAST(cb AS DOUBLE) - {KN_DISCOUNT}, 0.0) / CAST(cu AS DOUBLE)
         + ({KN_DISCOUNT} * CAST(n1f AS DOUBLE)) / CAST(cu AS DOUBLE)
           * (CAST(n1b AS DOUBLE) / n_types)
       )) AS DECIMAL(18,8)) AS kn_logprob
FROM big
JOIN bi USING (w1, w2)
JOIN hist USING (w1)
JOIN cont USING (w2)
CROSS JOIN nt
GROUP BY doc_id
"""


SPECS.append(QuerySpec("tx_kn_lm_score", tx_kn_lm_score, TX_KN_LM_ORACLE))


def tx_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking quality of the trained probe: AUC via the Mann-Whitney
    U statistic with exact integer midranks — the threshold-free
    companion to tx_quality_calibration's fixed-threshold table (a
    gate whose AUC is ~0.5 ranks no better than chance no matter where
    the threshold sits).

    Exact integer path: scores collapse to the (pf, count, pos_count)
    grid (≤1e6+1 rows — the tx_quality_deciles histogram class), one
    ordered window over that bounded frame gives cumulative counts,
    and Σ_groups pos·(2·cum_before + cnt + 1) is twice the positive
    rank sum — so U·2 and auc_ppm = div(U2·1e6, 2·n_pos·n_neg) never
    touch a float. int64 headroom: U2 < 2n², fine to ~2e9 docs; past
    that lift the two products to DECIMAL(38,0).

    Returns one row: (n_pos, n_neg, u2, auc_ppm)."""
    from pyspark import StorageLevel

    feats = _quality_features(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w, _ = train_quality_logreg(feats)
    scored = _ql_scored(feats, w)
    grid = scored.groupBy("pf").agg(
        F.count("*").alias("cnt"),
        F.sum(F.when(F.col("yf") == QL_SCALE, 1).otherwise(0)).alias("pos"),
    )
    win = Window.orderBy("pf").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grid.select(
        "pf",
        "cnt",
        "pos",
        F.coalesce(F.sum("cnt").over(win), F.lit(0)).alias("cum_before"),
    )
    return ranked.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("bigint").alias("n_neg"),
        (
            F.sum(
                F.col("pos")
                * (F.lit(2) * F.col("cum_before") + F.col("cnt") + F.lit(1))
            )
            - F.sum("pos") * (F.sum("pos") + F.lit(1))
        )
        .cast("bigint")
        .alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        F.expr("div(u2 * 1000000L, 2L * n_pos * n_neg)")
        .cast("bigint")
        .alias("auc_ppm"),
    )


TX_QUALITY_AUC_ORACLE = (
    _QL_CTES
    + f""",
scored AS (
  SELECT f.doc_id, f.yf,
         CAST(floor((0.5 + 0.5 * mr / (1.0 + abs(mr))) * 1000000 + 0.5) AS BIGINT) AS pf
  FROM (SELECT f.*, CAST({_QL_DOT_FIN} AS DOUBLE) / 1e12 AS mr
        FROM feats f CROSS JOIN {_QL_WFIN} w) f),
grid AS (
  SELECT pf, COUNT(*) AS cnt,
         SUM(CASE WHEN yf = {QL_SCALE} THEN 1 ELSE 0 END) AS pos
  FROM scored GROUP BY pf),
ranked AS (
  SELECT pf, cnt, pos,
         COALESCE(SUM(cnt) OVER (ORDER BY pf
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM grid),
agg AS (
  SELECT SUM(pos) AS n_pos,
         SUM(cnt) - SUM(pos) AS n_neg,
         SUM(pos * (2 * cum_before + cnt + 1)) - SUM(pos) * (SUM(pos) + 1) AS u2
  FROM ranked)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(u2 AS BIGINT) AS u2,
       CAST((u2 * 1000000) // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
FROM agg"""
)


SPECS.append(
    QuerySpec("tx_quality_auc", tx_quality_auc, TX_QUALITY_AUC_ORACLE, probes=_ql_probes)
)
