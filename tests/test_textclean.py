"""Corpus-cleaning ops: C4-style line dedup, PII redaction, Gopher-style
repetition signals (pipeline/textclean.py). Cross-engine parity lives in the
text_line_dedup / text_pii_scrub / text_repetition oracle entries; these pin
the semantics on hand-computed cases."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from webcrawler_spark.session import get_spark

    return get_spark(
        app_name="textclean-tests", master="local[4]", shuffle_partitions=8
    )


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_line_dedup_removes_corpus_wide_boilerplate(spark):
    from webcrawler_spark.pipeline.textclean import line_dedup

    rows = [
        (1, "COOKIE BANNER\nunique one text here\nFooter: example.com"),
        (2, "COOKIE BANNER\nanother different body\nFooter: example.com"),
        (3, "no banner just content\nFooter: example.com"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 2)
    assert out[1]["cleaned_hash"] == _sha("unique one text here")
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 1)
    assert out[3]["cleaned_hash"] == _sha("no banner just content")


def test_line_dedup_trims_but_preserves_original_lines(spark):
    """Matching is on TRIMMED lines ('  footer ' == 'footer') but the kept
    text keeps its original bytes."""
    from webcrawler_spark.pipeline.textclean import line_dedup

    rows = [(1, "  shared footer \nkeep me"), (2, "shared footer\nother")]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["n_removed"] == 1 and out[2]["n_removed"] == 1
    assert out[1]["cleaned_hash"] == _sha("keep me")


def test_line_dedup_min_df_threshold(spark):
    from webcrawler_spark.pipeline.textclean import line_dedup

    rows = [(1, "twice\na"), (2, "twice\nb"), (3, "c")]
    out = {
        r["doc_id"]: r["n_removed"]
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), min_df=3
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 0}  # df=2 < min_df=3: nothing removed


def test_pii_scrub_counts_and_text(spark):
    from webcrawler_spark.pipeline.textclean import pii_scrub

    rows = [
        (1, "Email a@b.com and b@c.org, call 555-123-4567, ip 10.0.0.7. end"),
        (2, "no pii at all"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 1, 1)
    assert out[1]["scrubbed_hash"] == _sha(
        "Email <EMAIL> and <EMAIL>, call <PHONE>, ip <IP>. end"
    )
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["scrubbed_hash"] == _sha("no pii at all")


def test_repetition_stats_planted_spam(spark):
    from webcrawler_spark.pipeline.textclean import repetition_stats

    rows = [
        # 10x "buy now": 19 bigrams of which "buy now" occurs 10 times;
        # all 18 trigrams occur >1 time except none... compute below
        (1, " ".join(["buy now"] * 10)),
        (2, "all tokens unique here ok"),
        (3, "dup line\ndup line\nfresh"),
    ]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    # doc1: 20 tokens, 19 bigrams: 'buy now' x10, 'now buy' x9 -> top 10/19
    assert out[1]["top_bigram_frac"] == round(10 / 19 * 10000)
    # doc1: 18 trigrams, every one repeats -> 1.0
    assert out[1]["dup_trigram_frac"] == 10000
    assert out[2]["top_bigram_frac"] == round(1 / 4 * 10000)
    assert out[2]["dup_trigram_frac"] == 0
    # doc3: 3 lines, 2 identical -> 1 - 2/3
    assert out[3]["dup_line_frac"] == round((1 - 2 / 3) * 10000)


def test_repetition_stats_degenerate_docs(spark):
    from webcrawler_spark.pipeline.textclean import repetition_stats

    rows = [(1, ""), (2, "one"), (3, "two tokens")]
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i in (1, 2):
        assert (
            out[i]["dup_line_frac"],
            out[i]["top_bigram_frac"],
            out[i]["dup_trigram_frac"],
        ) == (0, 0, 0)
    assert out[3]["top_bigram_frac"] == 10000  # single bigram = 1/1


def test_nfc_normalization_and_control_strip(spark):
    import unicodedata

    from webcrawler_spark.pipeline.textclean import with_nfc_text

    decomposed = "café Ångström"
    rows = [(1, decomposed), (2, "plain ascii"), (3, "ctl\x01\x02 keep\ttab\nnl"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text_nfc"] for r in with_nfc_text(df).collect()}
    assert got[1] == unicodedata.normalize("NFC", decomposed) == "café Ångström"
    assert got[2] == "plain ascii"
    assert got[3] == "ctl keep\ttab\nnl"     # C0 controls gone, tab/nl kept
    assert got[4] is None


def test_host_boilerplate_site_scoped(spark):
    import hashlib

    from webcrawler_spark.pipeline.textclean import host_boilerplate

    shared = "same sentence on unrelated sites"
    rows = [
        (1, "a.com", "NAV A\nreal content one\n" + shared),
        (2, "a.com", "NAV A\nreal content two"),
        (3, "b.com", "NAV B\nother content\n" + shared),
        (4, "b.com", "NAV B\nmore content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r["doc_id"]: r for r in host_boilerplate(df).collect()}
    # per-host nav removed everywhere
    assert all(out[i]["n_removed"] == 1 for i in (1, 2, 3, 4))
    # cross-host shared line SURVIVES (df=1 within each host)
    want1 = hashlib.sha256(
        ("real content one\n" + shared).encode()
    ).hexdigest()
    assert out[1]["cleaned_hash"] == want1
    assert out[1]["n_lines"] == 3
    # whitespace-variant lines count as the same template line
    df2 = spark.createDataFrame(
        [(1, "c.com", "  footer  \nx"), (2, "c.com", "footer\ny")],
        "doc_id long, host string, text string",
    )
    out2 = {r["doc_id"]: r for r in host_boilerplate(df2).collect()}
    assert out2[1]["n_removed"] == 1 and out2[2]["n_removed"] == 1
