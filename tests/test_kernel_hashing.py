"""Mirrors model/WebPageContentTest.java + util/CrawlerUtilsTest.java."""

import hashlib

from webcrawler_spark.kernel import (
    compute_hash,
    compute_hash_segments,
    content_length,
    host_hash,
)
from webcrawler_spark.kernel.extract import remove_html_tags


class TestComputeHash:
    # WebPageContentTest.java:11-23 — determinism
    def test_deterministic(self):
        a = compute_hash("http://a.com/", "hello")
        b = compute_hash("http://a.com/", "hello")
        assert a == b
        assert len(a) == 64
        assert a == a.lower()

    # null inputs treated as empty strings (WebPageContent.java:213-216)
    def test_null_equals_empty(self):
        assert compute_hash(None, None) == compute_hash("", "")
        assert compute_hash("u", None) == compute_hash("u", "")
        assert compute_hash(None, "c") == compute_hash("", "c")

    def test_url_content_separator(self):
        # '\0' separator avoids (url+content) ambiguity
        assert compute_hash("ab", "c") != compute_hash("a", "bc")

    def test_known_value(self):
        expected = hashlib.sha256("u\x00c".encode()).hexdigest()
        assert compute_hash("u", "c") == expected


class TestComputeHashSegments:
    # WebPageContentTest.java:289-298 — order & segmentation sensitivity
    def test_segment_order_sensitive(self):
        assert compute_hash_segments("u", ["a", "b"]) != compute_hash_segments("u", ["b", "a"])

    def test_separator_collision(self):
        assert compute_hash_segments("u", ["ab", "c"]) != compute_hash_segments("u", ["a", "bc"])

    def test_null_segments_as_empty(self):
        assert compute_hash_segments("u", ["a", None, "b"]) == compute_hash_segments("u", ["a", "", "b"])

    def test_empty_equals_none(self):
        assert compute_hash_segments("u", []) == compute_hash_segments("u", None)
        # and equals the single-string hash of empty content
        assert compute_hash_segments("u", None) == compute_hash("u", "")

    def test_known_value(self):
        expected = hashlib.sha256("u\x00a\x1fb".encode()).hexdigest()
        assert compute_hash_segments("u", ["a", "b"]) == expected


class TestContentLength:
    # WebPageContent.recomputeContentLength (:196-206)
    def test_sums_char_lengths(self):
        assert content_length(["ab", "cde"]) == 5

    def test_null_segments_count_zero(self):
        assert content_length(["ab", None, "c"]) == 3

    def test_empty_and_none(self):
        assert content_length([]) == 0
        assert content_length(None) == 0

    def test_unicode_chars_counted_not_bytes(self):
        assert content_length(["héllo"]) == 5


class TestHostHash:
    def test_deterministic_nonnegative_int64(self):
        h = host_hash("example.com")
        assert h == host_hash("example.com")
        assert 0 <= h < 2**60

    def test_matches_sha256_prefix(self):
        expected = int(hashlib.sha256(b"example.com").hexdigest()[:15], 16)
        assert host_hash("example.com") == expected

    def test_none_is_zero(self):
        assert host_hash(None) == 0


class TestRemoveHtmlTags:
    # CrawlerUtilsTest.java:12-95 — exact mirrors
    def test_with_html_tags(self):
        assert (
            remove_html_tags("<p>This is <b>bold</b> and <i>italic</i> text.</p>")
            == "This is bold and italic text."
        )

    def test_without_html_tags(self):
        assert remove_html_tags("This is plain text.") == "This is plain text."

    def test_empty_string(self):
        assert remove_html_tags("") == ""

    def test_null_input(self):
        assert remove_html_tags(None) is None

    def test_only_html_tags(self):
        assert remove_html_tags("<div><span></span></div>") == ""

    def test_nested_tags(self):
        assert remove_html_tags("<div><p>Nested <span>tag</span> example.</p></div>") == "Nested tag example."

    def test_entities_preserved(self):
        assert (
            remove_html_tags("<p>Special characters: &amp; &lt; &gt;</p>")
            == "Special characters: &amp; &lt; &gt;"
        )

    def test_broken_tags(self):
        assert (
            remove_html_tags("Text with <b>unclosed tags or <i>incorrect nesting</b>")
            == "Text with unclosed tags or incorrect nesting"
        )


def test_unpaired_surrogates_hash_like_java_getbytes():
    """Java String.getBytes(UTF_8) replaces an unpaired surrogate with '?'
    (verified on Java 17: "x\\ud800y" -> bytes 120 63 121); the kernel must
    hash the same bytes instead of raising (hypothesis-found)."""
    import hashlib

    from webcrawler_spark.kernel.hashing import compute_hash

    assert (
        compute_hash(None, "x\ud800y")
        == hashlib.sha256(b"\x00x?y").hexdigest()
    )
    assert compute_hash("\ud800", "") == hashlib.sha256(b"?\x00").hexdigest()
