"""RDFa 1.0 path goldens: XMLLiteral auto-promotion with recursion
stop, host default term mappings, 1.0 content models
(reader.rb:860-893 step 5, 1238-1256 step 11, 357-363 terms)."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import I, L

DC = "http://purl.org/dc/elements/1.1/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XHV = "http://www.w3.org/1999/xhtml/vocab#"
BASE = "http://example.org/"

DOC10 = ('<?xml version="1.0"?>'
         '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML+RDFa 1.0//EN" '
         '"http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd">'
         '<html xmlns="http://www.w3.org/1999/xhtml" xmlns:dc="%s">'
         "<head><title>t</title></head><body>%s</body></html>")


def parse10(body, **kw):
    out, proc, _ = parse_rdfa(DOC10 % (DC, body), url=BASE, **kw)
    return set(out)


def test_version_sniffed_from_doctype():
    from rdf_rdfa_spark.rdfa.dom import detect_host_language_version

    hl, ver = detect_host_language_version(DOC10 % (DC, ""))
    assert ver == "rdfa1.0"
    assert hl == "xhtml1"


def test_plain_literal_10():
    got = parse10('<span about="foo" property="dc:title">Title</span>')
    assert (I(BASE + "foo"), I(DC + "title"), L("Title")) in got


def test_xmlliteral_auto_and_no_recursion():
    # mixed content with no @datatype → rdf:XMLLiteral; children are
    # NOT recursed (reader.rb:1246), so the inner @property is inert
    body = ('<div about="foo" property="dc:title">Some '
            '<b about="bar" property="dc:creator">bold</b> text</div>')
    got = parse10(body)
    lits = [t for t in got if t[0] == I(BASE + "foo")]
    assert len(lits) == 1
    _, _, obj = lits[0]
    assert obj[3] == RDF + "XMLLiteral"
    assert "<b" in obj[1] and "bold" in obj[1]
    assert not any(t[0] == I(BASE + "bar") for t in got)


def test_10_default_terms():
    got = parse10('<a about="" rel="next" href="page2">n</a>')
    assert (I(BASE), I(XHV + "next"), I(BASE + "page2")) in got


def test_10_no_absuri_for_undefined_prefix():
    # 1.1 resolves undef:curie as an absolute IRI; 1.0 has no absuri
    # content model → dropped
    got = parse10('<span about="" property="undef:curie">v</span>')
    assert not any("undef" in t[1][1] for t in got)


def test_10_xml_prefixed_value_ignored():
    got = parse10('<span about="" property="XMLthing">v</span>')
    assert got == set()


def test_10_typeof_bnode_subject():
    body = '<div typeof="dc:anything"><span property="dc:title">T</span></div>'
    got = parse10(body)
    assert any(t[0][0] == "bnode" and t[1] == I(DC + "title") for t in got)


def test_10_empty_datatype_plain():
    body = '<div about="foo" property="dc:title" datatype="">Some <b>bold</b></div>'
    got = parse10(body)
    assert (I(BASE + "foo"), I(DC + "title"), L("Some bold")) in got
