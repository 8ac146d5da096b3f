"""Embedded RDF/XML subset reader (SURVEY S8; reader.rb:429-434,
reader_spec.rb:1520-1552 "SVG metadata"). Cases cover the striped
grammar subset crawled pages actually use: SVG <metadata> islands,
Creative-Commons license blocks (typed nodes, rdf:resource), property
attributes, parseType Resource/Literal/Collection, rdf:nodeID,
rdf:datatype, rdf:li containers, and application/rdf+xml scripts."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import B, I, L, isomorphic

DC = "http://purl.org/dc/terms/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
CC = "http://creativecommons.org/ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def parse(doc, url="http://example.org/", **kw):
    out, proc, _ = parse_rdfa(doc, url=url, **kw)
    return set(out)


def test_svg_metadata_rdfxml():
    # exact reference fixture (reader_spec.rb:1521-1549): xml:base and
    # xmlns declared on <svg>, OUTSIDE the island, stay in scope
    svg = '''<?xml version="1.0" encoding="UTF-8"?>
<svg width="12cm" height="4cm"
  xmlns:dc="http://purl.org/dc/terms/"
  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xml:base="http://example.net/"
  xmlns="http://www.w3.org/2000/svg" version="1.2" baseProfile="tiny">
  <desc property="dc:description">A yellow rectangle with sharp corners.</desc>
  <metadata>
    <rdf:RDF>
      <rdf:Description rdf:about="">
        <dc:title>Test 0304</dc:title>
      </rdf:Description>
    </rdf:RDF>
  </metadata>
  <rect x="1" y="1" width="1198" height="398" fill="none"/>
</svg>'''
    got = parse(svg, url="http://example.com/doc")
    assert (I("http://example.net/"), I(DC + "title"), L("Test 0304")) in got
    assert (I("http://example.net/"), I(DC + "description"),
            L("A yellow rectangle with sharp corners.")) in got


def test_cc_license_block_typed_nodes():
    # the Creative-Commons idiom: typed node elements (case-sensitive
    # QNames!), rdf:resource objects, nested node elements
    html = '''<html><body>
<!-- visible content -->
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:cc="http://creativecommons.org/ns#"
         xmlns:dc="http://purl.org/dc/terms/">
  <cc:Work rdf:about="http://example.org/work">
    <cc:license rdf:resource="http://creativecommons.org/licenses/by/4.0/"/>
    <dc:creator>
      <cc:Agent rdf:nodeID="a1">
        <dc:title>Alice</dc:title>
      </cc:Agent>
    </dc:creator>
  </cc:Work>
</rdf:RDF></body></html>'''
    got = parse(html)
    want = {
        (I("http://example.org/work"), I(RDF + "type"), I(CC + "Work")),
        (I("http://example.org/work"), I(CC + "license"),
         I("http://creativecommons.org/licenses/by/4.0/")),
        (I("http://example.org/work"), I(DC + "creator"), B("a")),
        (B("a"), I(RDF + "type"), I(CC + "Agent")),
        (B("a"), I(DC + "title"), L("Alice")),
    }
    assert isomorphic(got, want), sorted(got)


def test_property_attrs_datatype_lang_id():
    doc = '''<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:dc="http://purl.org/dc/terms/" xml:lang="en"
      xml:base="http://example.org/base">
  <rdf:Description rdf:ID="thing" dc:title="Attr Title">
    <dc:extent rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</dc:extent>
  </rdf:Description>
</rdf:RDF>'''
    got = parse(doc, url="http://example.org/doc", host_language="xml")
    s = I("http://example.org/base#thing")
    assert (s, I(DC + "title"), L("Attr Title", lang="en")) in got, sorted(got)
    assert (s, I(DC + "extent"), L("42", dt=XSD + "integer")) in got


def test_parsetype_resource_and_li():
    doc = '''<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="http://example.org/ns#">
  <rdf:Description rdf:about="http://example.org/s">
    <ex:prop rdf:parseType="Resource">
      <ex:inner>v</ex:inner>
    </ex:prop>
    <ex:bag>
      <rdf:Bag>
        <rdf:li>one</rdf:li>
        <rdf:li>two</rdf:li>
      </rdf:Bag>
    </ex:bag>
  </rdf:Description>
</rdf:RDF>'''
    got = parse(doc, url="http://example.org/doc", host_language="xml")
    EX = "http://example.org/ns#"
    want = {
        (I("http://example.org/s"), I(EX + "prop"), B("r")),
        (B("r"), I(EX + "inner"), L("v")),
        (I("http://example.org/s"), I(EX + "bag"), B("g")),
        (B("g"), I(RDF + "type"), I(RDF + "Bag")),
        (B("g"), I(RDF + "_1"), L("one")),
        (B("g"), I(RDF + "_2"), L("two")),
    }
    assert isomorphic(got, want), sorted(got)


def test_parsetype_collection_and_literal():
    doc = '''<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:ex="http://example.org/ns#">
  <rdf:Description rdf:about="http://example.org/s">
    <ex:items rdf:parseType="Collection">
      <rdf:Description rdf:about="http://example.org/i1"/>
      <rdf:Description rdf:about="http://example.org/i2"/>
    </ex:items>
    <ex:markup rdf:parseType="Literal">x <b>bold</b> y</ex:markup>
  </rdf:Description>
</rdf:RDF>'''
    got = parse(doc, url="http://example.org/doc", host_language="xml")
    EX = "http://example.org/ns#"
    want = {
        (I("http://example.org/s"), I(EX + "items"), B("c1")),
        (B("c1"), I(RDF + "first"), I("http://example.org/i1")),
        (B("c1"), I(RDF + "rest"), B("c2")),
        (B("c2"), I(RDF + "first"), I("http://example.org/i2")),
        (B("c2"), I(RDF + "rest"), I(RDF + "nil")),
        (I("http://example.org/s"), I(EX + "markup"),
         L("x <b>bold</b> y", dt=RDF + "XMLLiteral")),
    }
    assert isomorphic(got, want), sorted(got)


def test_script_rdfxml_payload():
    html = '''<html><head>
<script type="application/rdf+xml">
  <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
           xmlns:dc="http://purl.org/dc/terms/">
    <rdf:Description rdf:about="http://example.org/doc">
      <dc:title>Scripted</dc:title>
    </rdf:Description>
  </rdf:RDF>
</script></head><body></body></html>'''
    got = parse(html)
    assert (I("http://example.org/doc"), I(DC + "title"),
            L("Scripted")) in got, sorted(got)


def test_rdfxml_never_crashes_on_garbage():
    for doc in (
        "<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'><rdf:unclosed",
        "<rdf:RDF xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'>"
        "<bad:Elem/><rdf:Description rdf:about='http://x/'><b:p>v</b:p>"
        "</rdf:Description></rdf:RDF>",
    ):
        out, proc, _ = parse_rdfa("<html><body>%s</body></html>" % doc,
                                  url="http://example.org/")
        assert isinstance(out, list)


def test_script_island_not_double_extracted():
    # a bnode-bearing island inside <script> must be read ONCE (via the
    # script handler), not again by the island scan — otherwise the
    # graph gains a duplicate structure under fresh bnodes
    html = '''<html><head>
<script type="application/rdf+xml">
  <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
           xmlns:dc="http://purl.org/dc/terms/">
    <rdf:Description rdf:about="http://example.org/doc">
      <dc:creator><rdf:Description><dc:title>A</dc:title></rdf:Description></dc:creator>
    </rdf:Description>
  </rdf:RDF>
</script></head><body></body></html>'''
    got = parse(html)
    creators = [t for t in got if t[1] == I(DC + "creator")]
    assert len(creators) == 1, sorted(got)
