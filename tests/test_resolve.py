"""RFC3986 base-IRI resolution — the reference's own 306-case corpus.

The cases live as data inside /root/reference/spec/reader_spec.rb
("Base IRI resolution", run with host_language: :xhtml5 at
reader_spec.rb:2661). We load the fixture verbatim at test time and
run our parser end-to-end over the same HTML, comparing against the
expected N-Triples — both the pure resolver and the xml:base plumbing
get exercised.
"""

import os
import re

import pytest

from rdf_rdfa_spark.rdfa.resolve import resolve, remove_dot_segments
from rdf_rdfa_spark.rdfa.walk import parse_rdfa

SPEC = "/root/reference/spec/reader_spec.rb"


def _extract_block(src: str, name: str) -> str:
    m = re.search(r"let\(:%s\)\s*\{%%q\{(.*?)\}\}\n" % name, src, re.S)
    assert m, "fixture %s not found" % name
    return m.group(1)


@pytest.fixture(scope="module")
def corpus():
    if not os.path.exists(SPEC):
        pytest.skip("reference spec not available")
    src = open(SPEC, encoding="utf-8").read()
    idx = src.index('describe "Base IRI resolution"')
    tail = src[idx:]
    html = _extract_block(tail, "html")
    nt = _extract_block(tail, "nt")
    expected = {}
    for line in nt.splitlines():
        m = re.match(r"\s*<(urn:ex:s\d+)> <urn:ex:p> <([^>]*)>\.", line)
        if m:
            expected[m.group(1)] = m.group(2)
    assert len(expected) >= 300
    return html, expected


def test_rfc3986_corpus(corpus):
    html, expected = corpus
    out, _proc, _root = parse_rdfa(
        "<html><body>" + html + "</body></html>"
        if not html.lstrip().startswith("<html")
        else html,
        url="http://example.com/",
        host_language="xhtml5",
    )
    got = {}
    for (s, p, o) in out:
        if s[0] == "iri" and s[1].startswith("urn:ex:s") and o[0] == "iri":
            got[s[1]] = o[1]
    missing = {k: v for k, v in expected.items() if k not in got}
    wrong = {k: (got[k], v) for k, v in expected.items() if k in got and got[k] != v}
    assert not missing, "missing: %s" % sorted(missing)[:10]
    assert not wrong, "wrong: %s" % sorted(wrong.items())[:10]
    assert len(got) == len(expected)


# spot checks that fail on urllib.parse.urljoin (non-strict resolvers)
@pytest.mark.parametrize(
    "base,ref,out",
    [
        ("http://a/bb/ccc/d;p?q", "http:g", "http:g"),
        ("http://a/bb/ccc/d;p?q", "g:h", "g:h"),
        ("http://a/bb/ccc/d;p?q", "", "http://a/bb/ccc/d;p?q"),
        ("http://a/bb/ccc/d;p?q", "?y", "http://a/bb/ccc/d;p?y"),
        ("http://a/bb/ccc/d;p?q", "#s", "http://a/bb/ccc/d;p?q#s"),
        ("http://a/bb/ccc/d;p?q", "../../../g", "http://a/g"),
        ("http://abc/d:f/ghi", "xyz", "http://abc/d:f/xyz"),
        ("http://ab//de//ghi", "../xyz", "http://ab//de/xyz"),
    ],
)
def test_resolve_strict(base, ref, out):
    assert resolve(base, ref) == out


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
