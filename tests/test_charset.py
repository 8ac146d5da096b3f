"""Charset sniffing + decode on the ingest path (S2) — crawled pages
arrive as raw bytes in every encoding; meta-charset sniffing mirrors
nokogiri.rb:161-188's encoding selection."""

from __future__ import annotations

import pytest

from rdf_rdfa_spark.rdfa.dom import decode_html, sniff_charset
from rdf_rdfa_spark.rdfa.walk import parse_rdfa

TEXT = "Zoë Müller café"  # latin-1-representable on purpose
TMPL = ('<html><head><meta charset="%s"/></head><body>'
        '<div about="http://e/a"><span property="http://e/name">%s'
        "</span></div></body></html>")


@pytest.mark.parametrize("enc,decl", [
    ("utf-8", "utf-8"),
    ("iso-8859-1", "iso-8859-1"),
    ("windows-1252", "windows-1252"),
    ("utf-8", "UTF-8"),          # case-insensitive declaration
])
def test_meta_charset_roundtrip(enc, decl):
    raw = (TMPL % (decl, TEXT)).encode(enc)
    assert sniff_charset(raw) == decl.lower()
    assert TEXT in decode_html(raw)
    out, _, _ = parse_rdfa(raw, url="http://e/doc")
    lits = [o[1] for (_s, _p, o) in out if o[0] == "literal"]
    assert TEXT in lits, lits


def test_http_equiv_content_type_charset():
    tmpl = ('<html><head><meta http-equiv="content-type" '
            'content="text/html; charset=iso-8859-1"/></head><body>'
            '<span about="http://e/a" property="http://e/name">%s</span>'
            "</body></html>")
    raw = (tmpl % TEXT).encode("iso-8859-1")
    assert TEXT in decode_html(raw)


def test_unknown_charset_falls_back_to_utf8():
    raw = (TMPL % ("x-bogus-enc", "plain ascii")).encode("ascii")
    assert "plain ascii" in decode_html(raw)


def test_undeclared_defaults_to_utf8():
    raw = ("<html><body><span about='http://e/a' "
           "property='http://e/n'>%s</span></body></html>" % TEXT
           ).encode("utf-8")
    assert sniff_charset(raw) == "utf-8"
    assert TEXT in decode_html(raw)


def test_mojibake_never_crashes():
    # declared utf-8, actual latin-1 bytes: replacement chars, no crash
    raw = (TMPL % ("utf-8", TEXT)).encode("iso-8859-1")
    out, _, _ = parse_rdfa(raw, url="http://e/doc")
    assert isinstance(out, list)
