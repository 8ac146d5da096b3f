"""Third golden batch: the reference's 'problematic examples'
(reader_spec.rb:1411-1519) — real-world markup quirks."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import B, I, L, isomorphic

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFA = "http://www.w3.org/ns/rdfa#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SCHEMA = "http://schema.org/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DC = "http://purl.org/dc/terms/"
BASE = "http://example/"


def parse(html, **kw):
    out, _, _ = parse_rdfa(html, url=BASE, **kw)
    return set(out)


def test_jens_ice_cream():
    html = """<root><div vocab="#" typeof="">
      <p>Flavors in my favorite ice cream:</p>
      <div rel="flavor">
        <ul vocab="http://www.w3.org/1999/02/22-rdf-syntax-ns#" typeof="">
          <li property="first">Lemon sorbet</li>
          <li rel="rest">
            <span typeof="">
              <span property="first">Apricot sorbet</span>
            <span rel="rest" resource="rdf:nil"></span>
          </span>
          </li>
        </ul>
      </div>
    </div></root>"""
    got = parse(html)
    want = {
        # vocab="#" resolves against base (uri(attrs[:vocab]),
        # reader.rb:798)
        (I(BASE), I(RDFA + "usesVocabulary"), I(BASE + "#")),
        (I(BASE), I(RDFA + "usesVocabulary"), I(RDF)),
        (B("a"), I(BASE + "#flavor"), B("l1")),
        (B("l1"), I(RDF + "first"), L("Lemon sorbet")),
        (B("l1"), I(RDF + "rest"), B("l2")),
        (B("l2"), I(RDF + "first"), L("Apricot sorbet")),
        (B("l2"), I(RDF + "rest"), I(RDF + "nil")),
    }
    assert isomorphic(got, want), sorted(got)


def test_schema_event_property_url():
    html = """<div><div vocab="http://schema.org/" typeof="Event">
        <a property="url" href="nba-game3.html">
          <span property="description">NBA Tickets</span>
        </a></div></div>"""
    got = parse(html)
    want = {
        (I(BASE), I(RDFA + "usesVocabulary"), I(SCHEMA)),
        (B("e"), I(RDF + "type"), I(SCHEMA + "Event")),
        (B("e"), I(SCHEMA + "url"), I(BASE + "nba-game3.html")),
        (B("e"), I(SCHEMA + "description"), L("NBA Tickets")),
    }
    assert isomorphic(got, want), sorted(got)


def test_schema_event_property_typeof_chain():
    html = """<div><div vocab="http://schema.org/" typeof="Event">
        <div property="offers" typeof="AggregateOffer">
          Priced from: <span property="lowPrice">$35</span>
          <span property="offerCount">1,938</span> tickets left
        </div></div></div>"""
    got = parse(html)
    want = {
        (I(BASE), I(RDFA + "usesVocabulary"), I(SCHEMA)),
        (B("e"), I(RDF + "type"), I(SCHEMA + "Event")),
        (B("e"), I(SCHEMA + "offers"), B("o")),
        (B("o"), I(RDF + "type"), I(SCHEMA + "AggregateOffer")),
        (B("o"), I(SCHEMA + "lowPrice"), L("$35")),
        (B("o"), I(SCHEMA + "offerCount"), L("1,938")),
    }
    assert isomorphic(got, want), sorted(got)


def test_drupal_hanging_rel():
    html = """<li rel="dc:subject">
        <a property="rdfs:label skos:prefLabel" typeof="skos:Concept"
           href="/plain/?q=taxonomy/term/1">xy</a></li>"""
    got = parse(html)
    href = I("http://example/plain/?q=taxonomy/term/1")
    want = {
        (I(BASE), I(DC + "subject"), B("h")),
        (B("h"), I(RDFS + "label"), href),
        (B("h"), I(SKOS + "prefLabel"), href),
        (href, I(RDF + "type"), I(SKOS + "Concept")),
    }
    assert isomorphic(got, want), sorted(got)


def test_bbc_rel_role():
    html = """<dt rel="po:role" class="role" prefix="po: http://example/">
        <span typeof="po:Role" property="rdfs:label">Director</span></dt>"""
    got = parse(html)
    want = {
        (I(BASE), I("http://example/role"), B("r")),
        (B("r"), I(RDFS + "label"), B("t")),
        (B("t"), I(RDF + "type"), I("http://example/Role")),
    }
    assert isomorphic(got, want), sorted(got)


def test_svg_desc_property():
    svg = """<?xml version="1.0" encoding="UTF-8"?>
      <svg xmlns:dc="http://purl.org/dc/terms/" xml:base="http://example.net/"
           xmlns="http://www.w3.org/2000/svg" version="1.2">
        <desc property="dc:description">A yellow rectangle with sharp corners.</desc>
      </svg>"""
    got = parse(svg)
    assert (I("http://example.net/"), I(DC + "description"),
            L("A yellow rectangle with sharp corners.")) in got


GR = "http://purl.org/goodrelations/v1#"


def test_script_turtle_cdata():
    html = """<html><body><script type="text/turtle"><![CDATA[
      @prefix gr: <http://purl.org/goodrelations/v1#> .
      <#co> a gr:BusinessEntity .
    ]]></script></body></html>"""
    got = parse(html)
    assert (I(BASE + "#co"), I(RDF + "type"), I(GR + "BusinessEntity")) in got


def test_script_ntriples_mediatype():
    html = ('<html><body><script type="application/n-triples">'
            '<http://a.example/s> <http://a.example/p> "o"@en .'
            '</script></body></html>')
    got = parse(html)
    assert (I("http://a.example/s"), I("http://a.example/p"),
            L("o", lang="en")) in got


def test_script_turtle_relative_iris():
    html = """<html><body><script type="text/turtle">
      <relative> <alsorelative> "v" .
    </script></body></html>"""
    got = parse(html)
    assert (I(BASE + "relative"), I(BASE + "alsorelative"), L("v")) in got


def test_script_jsonld_now_processed():
    # round 1 closed this gap: ld+json scripts are READ (rdfa/jsonld.py);
    # a context-less relative @type is droppable, not a crash or warning
    html = ('<html><body><script type="application/ld+json">'
            '{"@id": "x", "@type": "t"}</script></body></html>')
    out, proc, _ = parse_rdfa(html, url=BASE, rdfagraph=("output", "processor"))
    assert not out  # no vocab to expand "t" against → nothing to emit
    html2 = ('<html><body><script type="application/ld+json">'
             '{"@context": "https://schema.org", "@id": "x", "@type": "Thing"}'
             '</script></body></html>')
    out2, _, _ = parse_rdfa(html2, url=BASE)
    assert (I(BASE + "x"),
            I("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
            I("http://schema.org/Thing")) in out2


XSD = "http://www.w3.org/2001/XMLSchema#"


def test_property_href_inlist():
    # reader_spec "@property with @href in a list"
    html = ('<div about="http://example">'
            '<a inlist="" property="rdf:value" href="http://example#foo"></a>'
            '<a inlist="" property="rdf:value" href="http://example#bar"></a>'
            '</div>')
    got = parse("<html><body>%s</body></html>" % html)
    firsts = {t[2] for t in got if t[1] == I(RDF + "first")}
    assert firsts == {I("http://example#foo"), I("http://example#bar")}, sorted(got)


def test_property_and_rel_href_inlist():
    html = ('<div about="http://example">'
            '<a inlist="" property="rdf:value" href="http://example#foo"></a>'
            '<a inlist="" rel="rdf:value" href="http://example#bar"></a>'
            '</div>')
    got = parse("<html><body>%s</body></html>" % html)
    firsts = {t[2] for t in got if t[1] == I(RDF + "first")}
    assert firsts == {I("http://example#foo"), I("http://example#bar")}, sorted(got)


def test_property_href_empty_datatype():
    # href becomes the SUBJECT (property+datatype → step-5 else branch)
    html = '<a href="http://example/" property="rdf:value" datatype="">value</a>'
    got = parse("<html><body>%s</body></html>" % html)
    assert (I("http://example/"), I(RDF + "value"), L("value")) in got, sorted(got)


def test_property_datatype_beats_language():
    html = ('<div about="http://example/">'
            '<span property="rdf:value" lang="en" datatype="xsd:date">value</span></div>')
    got = parse("<html><body>%s</body></html>" % html)
    assert (I("http://example/"), I(RDF + "value"),
            L("value", dt=XSD + "date")) in got


def test_content_beats_datetime():
    html = '<time property="rdf:value" content="c" datetime="2011-06-28">x</time>'
    got = parse("<html><body>%s</body></html>" % html)
    assert (I(BASE), I(RDF + "value"), L("c")) in got, sorted(got)


def test_processor_ptr_context():
    html = ('<html><body><div><span about="" property="unknownterm">x</span>'
            '</div></body></html>')
    out, proc, _ = parse_rdfa(html, url=BASE,
                              rdfagraph=("output", "processor"),
                              processor_ptr=True)
    PTR = "http://www.w3.org/2009/pointers#"
    exprs = [o[1] for (s, p, o) in proc if p == I(PTR + "expression")]
    assert exprs and exprs[0].endswith("/span[1]"), (exprs, proc)
    assert any(o == I(PTR + "XPathPointer") for (_, p, o) in proc)


FOAF = "http://xmlns.com/foaf/0.1/"


def test_vocab_expansion_in_parser():
    # reference reader option vocab_expansion: true (reader.rb:451)
    html = ('<html><body><div about="http://example/#me" '
            'vocab="http://example.org/vocab#" typeof="Person">'
            '<span property="name">Gregg</span></div></body></html>')
    out, _, _ = parse_rdfa(html, url=BASE, vocab_expansion=True)
    got = set(out)
    assert (I("http://example/#me"), I(RDF + "type"), I(FOAF + "Person")) in got
    assert (I("http://example/#me"), I(FOAF + "name"), L("Gregg")) in got


def test_vocab_expansion_unresolved_warns():
    html = ('<html><body><div vocab="http://unknown.example/ns#" '
            'typeof="Thing"></div></body></html>')
    out, proc, _ = parse_rdfa(html, url=BASE, vocab_expansion=True,
                              rdfagraph=("output", "processor"))
    assert any("Unresolved vocabulary" in o[1]
               for (_, p, o) in proc if o[0] == "literal")
