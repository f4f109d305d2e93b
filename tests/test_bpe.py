"""BPE trainer parity: the distributed merge-induction loop must learn
the exact merge sequence a pure-Python reference BPE (Sennrich et al.
2016 algorithm, same argmax tie-break) learns from the same corpus."""

from __future__ import annotations

from collections import Counter

from snowflake_to_postgres_spark.operators.bpe import (
    EOW,
    MIN_PAIR_COUNT,
    train_bpe,
    tx_bpe_merges,
    tx_bpe_pair_counts,
    word_frequencies,
)
from snowflake_to_postgres_spark.sources import load_table


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w and all("a" <= ch <= "z" for ch in w):
                c[w] += 1
    return c


def _py_train_bpe(word_freqs, n_merges, min_count=MIN_PAIR_COUNT):
    """Reference BPE: symbol lists per word, argmax pair by (count desc,
    pair lexicographic asc), left-to-right non-overlapping merge."""
    vocab = {w: [*w, EOW] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        ab = a + b
        merges.append((a, b, ab, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_merge_sequence_matches_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = _py_train_bpe(_py_word_freqs(texts), n_merges=12)
    got = train_bpe(word_frequencies(docs), n_merges=12)
    assert got == ref
    assert len(got) == 12  # fixture corpus has at least 12 viable merges


def test_bpe_merge_fold_handles_overlaps(spark):
    # "aaa b" stresses the non-overlapping left-to-right pass: rule (a,a)
    # must produce [aa, a, </w>], and the NEXT round may merge again.
    df = spark.createDataFrame([("aaa aaa aaa bb",)], "text STRING")
    ref = _py_train_bpe(_py_word_freqs(["aaa aaa aaa bb"]), n_merges=3, min_count=1)
    got = train_bpe(word_frequencies(df), n_merges=3, min_count=1)
    assert got == ref
    assert got[0][:3] == ("a", "a", "aa")


def test_bpe_pair_counts_match_python(spark, sf_dir, duck):
    got = {
        (r["a"], r["b"]): r["cnt"]
        for r in tx_bpe_pair_counts(spark, sf_dir).collect()
    }
    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    wf = _py_word_freqs(texts)
    pairs = Counter()
    for w, f in wf.items():
        syms = [*w, EOW]
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += f
    top = dict(sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)])
    assert got == top


def test_bpe_merges_query_shape(spark, sf_dir):
    df = tx_bpe_merges(spark, sf_dir)
    rows = df.collect()
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # counts are non-increasing is NOT guaranteed by BPE (a merge can
    # create a new heavier pair), but every count meets the support floor
    assert all(r["cnt"] >= MIN_PAIR_COUNT for r in rows)


def test_bpe_tokenize_stats_match_reference(spark, sf_dir):
    from snowflake_to_postgres_spark.operators.bpe import (
        N_MERGES,
        tx_bpe_tokenize,
    )

    texts = [
        r["text"]
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    wf = _py_word_freqs(texts)
    merges = _py_train_bpe(wf, n_merges=N_MERGES)
    vocab = {w: [*w, EOW] for w in wf}
    for a, b, ab, _ in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    before = sum((len(w) + 1) * f for w, f in wf.items())
    after = sum(len(vocab[w]) * f for w, f in wf.items())
    distinct = len({t for syms in vocab.values() for t in syms})

    row = tx_bpe_tokenize(spark, sf_dir).collect()[0]
    assert row["n_words"] == len(wf)
    assert row["symbols_before"] == before
    assert row["symbols_after"] == after
    assert row["vocab_tokens"] == distinct
    assert abs(row["compression"] - after / before) < 1e-12
    assert row["compression"] < 1.0  # merges only ever shrink
