"""Semantic tests for the round-4 corpus-statistics entries:
unigram log-perplexity, duplicated-n-gram fraction, Zipf/vocab stats.

Each entry reads ``documents.parquet`` from an sf dir, so the tests
write a tiny hand-computable corpus and assert exact values.
"""

import os

import pytest

import __spark_entry__ as entry


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_unigram_logppl_rare_tokens_score_higher(spark, tmp_path):
    # corpus: 'x' occurs 4 times, q/w/e/r once each -> total 8 tokens
    # s1 doc = all-common tokens: -log2(4/8) = 1.0 per token
    # s2 doc = all-hapax tokens:  -log2(1/8) = 3.0 per token
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x x x x", "en", "s1", 7),
            (2, "q w e r", "en", "s2", 7),
        ],
    )
    out = {
        r["source"]: r
        for r in entry.q_unigram_logppl(spark, sf).collect()
    }
    assert out["s1"]["avg_logppl"] == pytest.approx(1.0)
    assert out["s2"]["avg_logppl"] == pytest.approx(3.0)
    assert out["s2"]["avg_logppl"] > out["s1"]["avg_logppl"]


def test_dup_ngram_frac_flags_exact_duplicates(spark, tmp_path):
    # docs 1 and 2 are byte-identical -> every 3-gram occurrence is
    # shared -> frac 1.0 for both; doc 3 shares no shingle -> 0.0
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c d e", "en", "dup", 9),
            (2, "a b c d e", "en", "dup", 9),
            (3, "p q r s t", "en", "uniq", 9),
        ],
    )
    out = {
        r["source"]: r for r in entry.q_dup_ngram_frac(spark, sf).collect()
    }
    assert out["dup"]["avg_dup_frac"] == pytest.approx(1.0)
    assert out["dup"]["heavy_dup_docs"] == 2
    assert out["uniq"]["avg_dup_frac"] == pytest.approx(0.0)
    assert out["uniq"]["heavy_dup_docs"] == 0


def test_zipf_vocab_stats_exact_counts(spark, tmp_path):
    # s1: 4 tokens, 1 type, 0 hapax, ttr 0.25
    # s2: 4 tokens, 3 types ('u' twice + v/w once), 2 hapax, ttr 0.75
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "x x x x", "en", "s1", 7),
            (2, "u u v w", "en", "s2", 7),
        ],
    )
    out = {
        r["source"]: r for r in entry.q_zipf_vocab_stats(spark, sf).collect()
    }
    assert out["s1"]["total_tokens"] == 4
    assert out["s1"]["vocab"] == 1
    assert out["s1"]["hapax"] == 0
    assert out["s1"]["type_token_ratio"] == pytest.approx(0.25)
    assert out["s2"]["vocab"] == 3
    assert out["s2"]["hapax"] == 2
    assert out["s2"]["type_token_ratio"] == pytest.approx(0.75)


def test_new_entries_registered_with_oracles():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = ["unigram_logppl", "dup_ngram_frac", "zipf_vocab_stats"]
    for n in names:
        # the entries debuted in the round-4 driver window (green in
        # CORRECTNESS_r04) and now rotate like any other green record —
        # the standing contract is registration with hard oracles
        assert n in qs and n in oracles
