"""Microdata → RDF (SURVEY S9; reader.rb:437-445 — the reference's
rdf-microdata handoff, implemented in-process per the W3C
microdata-to-RDF mapping)."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import B, I, L, isomorphic

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SCHEMA = "http://schema.org/"


def parse(doc, url="http://example.org/", **kw):
    out, proc, _ = parse_rdfa(doc, url=url, **kw)
    return set(out)


def test_basic_item_schema_org():
    html = '''<html><body>
<div itemscope itemtype="http://schema.org/Person" itemid="http://example.org/#me">
  <span itemprop="name">Alice</span>
  <a itemprop="url" href="/alice">home</a>
  <img itemprop="image" src="alice.jpg"/>
  <meta itemprop="height" content="170"/>
  <time itemprop="birthDate" datetime="1990-01-01">Jan 1 1990</time>
</div></body></html>'''
    got = parse(html)
    s = I("http://example.org/#me")
    want = {
        (s, I(RDF + "type"), I(SCHEMA + "Person")),
        (s, I(SCHEMA + "name"), L("Alice")),
        (s, I(SCHEMA + "url"), I("http://example.org/alice")),
        (s, I(SCHEMA + "image"), I("http://example.org/alice.jpg")),
        (s, I(SCHEMA + "height"), L("170")),
        (s, I(SCHEMA + "birthDate"), L("1990-01-01")),
    }
    assert want <= got, sorted(got)


def test_nested_items_and_bnodes():
    html = '''<html><body>
<div itemscope itemtype="http://schema.org/Person">
  <span itemprop="name">Bob</span>
  <div itemprop="address" itemscope itemtype="http://schema.org/PostalAddress">
    <span itemprop="addressLocality">Springfield</span>
  </div>
</div></body></html>'''
    got = parse(html)
    want = {
        (B("p"), I(RDF + "type"), I(SCHEMA + "Person")),
        (B("p"), I(SCHEMA + "name"), L("Bob")),
        (B("p"), I(SCHEMA + "address"), B("a")),
        (B("a"), I(RDF + "type"), I(SCHEMA + "PostalAddress")),
        (B("a"), I(SCHEMA + "addressLocality"), L("Springfield")),
    }
    assert isomorphic(got, want), sorted(got)


def test_itemref_and_multiple_props():
    html = '''<html><body>
<div id="extra"><span itemprop="jobTitle">Engineer</span></div>
<div itemscope itemtype="http://schema.org/Person" itemref="extra">
  <span itemprop="name additionalName">Carol</span>
</div></body></html>'''
    got = parse(html)
    want = {
        (B("p"), I(RDF + "type"), I(SCHEMA + "Person")),
        (B("p"), I(SCHEMA + "name"), L("Carol")),
        (B("p"), I(SCHEMA + "additionalName"), L("Carol")),
        (B("p"), I(SCHEMA + "jobTitle"), L("Engineer")),
    }
    assert isomorphic(got, want), sorted(got)


def test_hash_vocab_and_absolute_prop():
    html = '''<html><body>
<div itemscope itemtype="http://example.com/vocab#Thing">
  <span itemprop="label">X</span>
  <span itemprop="http://purl.org/dc/terms/title">T</span>
</div></body></html>'''
    got = parse(html)
    want = {
        (B("t"), I(RDF + "type"), I("http://example.com/vocab#Thing")),
        (B("t"), I("http://example.com/vocab#label"), L("X")),
        (B("t"), I("http://purl.org/dc/terms/title"), L("T")),
    }
    assert isomorphic(got, want), sorted(got)


def test_microdata_and_rdfa_coexist():
    # both syntaxes in one document merge into one output graph, like
    # the reference with rdf-microdata installed
    html = '''<html><body>
<p about="http://example.org/r" property="http://purl.org/dc/terms/title">RDFa</p>
<div itemscope itemtype="http://schema.org/Thing" itemid="http://example.org/m">
  <span itemprop="name">MD</span>
</div></body></html>'''
    got = parse(html)
    assert (I("http://example.org/r"), I("http://purl.org/dc/terms/title"),
            L("RDFa")) in got
    assert (I("http://example.org/m"), I(SCHEMA + "name"), L("MD")) in got


def test_untyped_item_plain_names_skipped():
    # documented deviation: untyped items' plain names produce nothing
    # (no md:item registry fallback) — but must not crash
    html = '''<html><body>
<div itemscope><span itemprop="name">Nope</span>
<span itemprop="http://purl.org/dc/terms/title">Yes</span></div>
</body></html>'''
    got = parse(html)
    preds = {t[1][1] for t in got}
    assert SCHEMA + "name" not in preds
    assert "http://purl.org/dc/terms/title" in preds


def test_itemref_cycle_safe():
    html = '''<html><body>
<div id="a" itemscope itemtype="http://schema.org/Thing" itemref="a">
  <span itemprop="name">Loop</span>
</div></body></html>'''
    got = parse(html)
    assert (B("x"), I(SCHEMA + "name"), L("Loop")) in {
        (("bnode", "x") if t[0][0] == "bnode" else t[0], t[1], t[2])
        for t in got
    }


def test_microdata_flag_off_matches_stock_reference():
    # microdata=False mirrors a stock reference install (rdf-microdata
    # not present): only RDFa triples, plus a visible processor warning
    html = '''<html><body>
<div itemscope itemtype="http://schema.org/Thing"><span itemprop="name">MD</span></div>
</body></html>'''
    out, proc, _ = parse_rdfa(html, url="http://example.org/",
                              microdata=False, rdfagraph=("output", "processor"))
    assert out == []
    assert any("microdata" in str(t) for t in proc)
