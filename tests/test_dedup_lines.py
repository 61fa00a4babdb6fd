"""Cross-document line dedup (dedup.dedup_lines): C4-style keep-first
semantics, min_df boilerplate strip, blank-line exemption, whole-doc
removal, and partition invariance."""

import pytest
from pyspark.sql import functions as F

from cpp_parquet_spark import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha one\nshared footer\nunique to one"),
        (2, "beta two\nshared footer\nunique to two"),
        (3, "shared footer\ngamma three"),
        (4, "shared footer"),                       # only the dup line
        (5, "delta five\n\n  \ndelta tail"),        # blank + ws-only lines
        (6, "alpha one\nepsilon six"),              # dup of doc 1 line 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(rows):
    return {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in rows}


def test_keep_first_global(corpus):
    out = _by_id(dedup.dedup_lines(corpus).collect())
    assert out[1] == ("alpha one\nshared footer\nunique to one", 3, 0)
    assert out[2] == ("beta two\nunique to two", 3, 1)
    assert out[3] == ("gamma three", 2, 1)
    assert out[4] == ("", 1, 1)                    # doc survives, empty
    assert out[5] == ("delta five\n\n  \ndelta tail", 4, 0)  # blanks kept
    assert out[6] == ("epsilon six", 2, 1)
    assert len(out) == 6


def test_min_df_strip_all_occurrences(corpus):
    # 'shared footer' is in 4 docs -> stripped everywhere incl. doc 1;
    # 'alpha one' (2 docs) still keep-first dedups
    out = _by_id(dedup.dedup_lines(corpus, min_df=3).collect())
    assert out[1] == ("alpha one\nunique to one", 3, 1)
    assert out[4] == ("", 1, 1)
    assert out[6] == ("epsilon six", 2, 1)
    # strip-only mode: duplicates below the df threshold are untouched
    out = _by_id(dedup.dedup_lines(corpus, keep_first=False,
                                   min_df=3).collect())
    assert out[1] == ("alpha one\nunique to one", 3, 1)
    assert out[6] == ("alpha one\nepsilon six", 2, 0)


def test_partition_invariant_and_lossless_no_dups(spark, corpus):
    a = sorted(map(tuple, dedup.dedup_lines(corpus).collect()))
    b = sorted(map(tuple, dedup.dedup_lines(
        corpus.repartition(7, "text")).collect()))
    assert a == b
    solo = spark.createDataFrame(
        [(9, "only\nlines\nhere"), (10, "")], "doc_id long, text string")
    out = _by_id(dedup.dedup_lines(solo).collect())
    assert out[9] == ("only\nlines\nhere", 3, 0)   # no dups -> identity
    assert out[10] == ("", 1, 0)                   # empty doc preserved


def test_dup_span_coverage_matches_bruteforce(spark):
    import re
    from collections import Counter

    from cpp_parquet_spark.dedup import dup_span_coverage

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "prefix words here the quick brown fox jumps over a fence"),
        (3, "totally unique words alpha beta gamma delta epsilon zeta"),
        (4, "repeat me repeat me repeat me repeat me repeat me"),
        (5, "x"),                       # shorter than the window
        (6, "exactly five tokens right here"),   # n == w: one window
        (7, "exactly five tokens right here"),   # its duplicate
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in dup_span_coverage(df, w=5).collect()}

    W = 5
    cnt: Counter = Counter()
    wins = {}
    for d, t in docs:
        toks = re.split(r"\s+", t.strip())
        ws = [" ".join(toks[i:i + W]) for i in range(len(toks) - W + 1)]
        wins[d] = (toks, ws)
        cnt.update(ws)
    for d, _ in docs:
        toks, ws = wins[d]
        dup_pos = [i for i, g in enumerate(ws) if cnt[g] >= 2]
        covered, prev = 0, None
        for p in dup_pos:
            covered += W if prev is None else min(W, p - prev)
            prev = p
        g = got[d]
        assert g["n_tokens"] == len(toks)
        assert g["dup_windows"] == len(dup_pos)
        assert g["covered_tokens"] == covered
        assert g["dup_frac"] == covered / len(toks)


def test_dup_span_survivors_threshold(spark):
    from cpp_parquet_spark.dedup import dup_span_coverage, dup_span_survivors
    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "prefix words here the quick brown fox jumps over a fence"),
        (3, "totally unique words alpha beta gamma delta epsilon zeta"),
        (4, "repeat me repeat me repeat me repeat me repeat me"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cov = {r["doc_id"]: r["dup_frac"]
           for r in dup_span_coverage(df, w=5).collect()}
    kept = sorted(r["doc_id"]
                  for r in dup_span_survivors(df, max_frac=0.55,
                                              w=5).collect())
    assert kept == sorted(d for d, f in cov.items() if f <= 0.55)
    assert 4 not in kept          # fully-duplicated doc dropped
    assert 3 in kept              # unique doc kept with all columns
