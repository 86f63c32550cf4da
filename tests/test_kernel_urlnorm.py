"""Mirrors CrawlerService.normalizeUrl semantics (service/CrawlerService.java:222-264)
and the URL assertions in service/CrawlerServiceTest.java:183-250."""

import pytest

from webcrawler_spark.kernel import domain_of, normalize_url


class TestNormalizeUrl:
    def test_null_and_blank(self):
        assert normalize_url(None) is None
        assert normalize_url("") is None
        assert normalize_url("   ") is None

    def test_trim(self):
        assert normalize_url("  http://a.com/x  ") == "http://a.com/x"

    def test_scheme_lowercased(self):
        assert normalize_url("HTTP://a.com/") == "http://a.com/"
        assert normalize_url("HttpS://a.com/") == "https://a.com/"

    def test_host_lowercased_path_case_preserved(self):
        assert normalize_url("http://WWW.Example.COM/PaTh") == "http://www.example.com/PaTh"

    def test_non_http_schemes_rejected(self):
        # CrawlerServiceTest: mailto:/javascript: links never enqueued
        assert normalize_url("mailto:someone@example.com") is None
        assert normalize_url("javascript:void(0)") is None
        assert normalize_url("ftp://a.com/file") is None
        assert normalize_url("file:///etc/passwd") is None

    def test_no_scheme_rejected(self):
        assert normalize_url("www.example.com/x") is None
        assert normalize_url("//example.com/x") is None
        assert normalize_url("/relative/only") is None

    def test_fragment_stripped(self):
        assert normalize_url("http://a.com/x#sec") == "http://a.com/x"
        assert normalize_url("http://a.com/#top") == "http://a.com/"
        assert normalize_url("http://a.com#top") == "http://a.com/"

    def test_default_port_dropped(self):
        assert normalize_url("http://a.com:80/x") == "http://a.com/x"
        assert normalize_url("https://a.com:443/x") == "https://a.com/x"
        # cross-scheme defaults are kept
        assert normalize_url("http://a.com:443/x") == "http://a.com:443/x"
        assert normalize_url("https://a.com:80/x") == "https://a.com:80/x"

    def test_explicit_port_kept(self):
        assert normalize_url("http://a.com:8080/x") == "http://a.com:8080/x"

    def test_empty_path_becomes_slash(self):
        assert normalize_url("http://a.com") == "http://a.com/"
        assert normalize_url("http://a.com?q=1") == "http://a.com/?q=1"

    def test_query_kept_verbatim_blank_query_dropped(self):
        assert normalize_url("http://a.com/x?a=1&b=2") == "http://a.com/x?a=1&b=2"
        assert normalize_url("http://a.com/x?") == "http://a.com/x"
        # trailing spaces are trimmed first (raw.trim(), CrawlerService.java:225)
        assert normalize_url("http://a.com/x?  ") == "http://a.com/x"
        # but an interior space is an illegal URI char -> rejected
        assert normalize_url("http://a.com/x?a b") is None

    def test_userinfo_dropped(self):
        # CrawlerService.java:249-255 never re-appends userInfo
        assert normalize_url("http://user:pw@a.com/x") == "http://a.com/x"

    def test_invalid_uri_rejected(self):
        assert normalize_url("http://a.com/with space") is None
        assert normalize_url("http://a.com/x%zz") is None  # bad escape
        assert normalize_url("http://") is None

    def test_registry_based_authority_rejected(self):
        # java.net.URI: '_' makes the authority non-server-based -> host==null
        assert normalize_url("http://exa_mple.com/x") is None

    def test_percent_decoding_in_path_and_query(self):
        # Java URI getPath()/getQuery() decode escapes (see module docstring)
        assert normalize_url("http://a.com/b%20c?x=1%262") == "http://a.com/b c?x=1&2"

    def test_ipv4_and_ipv6(self):
        assert normalize_url("http://127.0.0.1:8080/x") == "http://127.0.0.1:8080/x"
        assert normalize_url("http://[::1]/x") == "http://[::1]/x"

    def test_idempotent(self):
        urls = [
            "http://a.com/",
            "https://b.org:8443/p?q=1",
            "http://www.example.com/PaTh",
        ]
        for u in urls:
            n = normalize_url(u)
            assert normalize_url(n) == n


class TestDomainOf:
    # WebPageProcessor.domainOf (:230-236)
    def test_basic(self):
        assert domain_of("https://sub.example.com:8080/a") == "sub.example.com"

    def test_null_safe(self):
        assert domain_of(None) is None
        assert domain_of("not a url") is None

    def test_no_host(self):
        assert domain_of("mailto:x@y.com") is None
