"""Second batch of reference golden pairs: base handling, empty
CURIEs, malformed datatypes, term validation, rel/rev host-language
matrix, @role variants (reader_spec.rb:431-713, 1299-1410)."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import B, I, L, isomorphic

DC11 = "http://purl.org/dc/elements/1.1/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
FOAF = "http://xmlns.com/foaf/0.1/"
XHV = "http://www.w3.org/1999/xhtml/vocab#"
XSD = "http://www.w3.org/2001/XMLSchema#"
CC = "http://creativecommons.org/ns#"
RDFA = "http://www.w3.org/ns/rdfa#"


def parse(html, url="http://example.org/", **kw):
    out, proc, _ = parse_rdfa(html, url=url, **kw)
    return set(out)


# --- html>head>base (reader_spec.rb:431-484) ---------------------------
def test_absolute_base():
    html = ('<html><head><base href="http://example/"></base></head>'
            '<body><p about="faq"><span property="dc11:title">Example FAQ</span></p></body></html>')
    got = parse(html, url="http://example.org/")
    assert (I("http://example/faq"), I("http://purl.org/dc/terms/title"),
            L("Example FAQ")) in got or (
        I("http://example/faq"), I(DC11 + "title"), L("Example FAQ")) in got


def test_relative_base_joined():
    html = ('<html><head><base href="foo/"></base></head>'
            '<body><p about="faq"><span property="dc:title">Example FAQ</span></p></body></html>')
    got = parse(html, url="http://example.org/")
    assert (I("http://example.org/foo/faq"),
            I("http://purl.org/dc/terms/title"), L("Example FAQ")) in got


# --- xml:base host-language matrix (reader_spec.rb:486-543) -------------
def test_xml_base_matrix():
    # exactly the reference fixture: the <div> is the document (for
    # xml/svg hosts it IS the root; HTML hosts wrap it)
    html = '<div xml:base="http://example/"><span property="rdf:value">Value</span></div>'
    for hl, honored in [("xml", True), ("xhtml1", False), ("html4", False),
                        ("html5", False), ("xhtml5", True), ("svg", True)]:
        got = parse(html, url="http://example/doc_base", host_language=hl)
        subj = "http://example/" if honored else "http://example/doc_base"
        assert (I(subj), I(RDF + "value"), L("Value")) in got, (hl, sorted(got))


# --- empty CURIE (reader_spec.rb:544-584) --------------------------------
def test_empty_curie_about_typeof():
    got = parse('<html><body><div about="[]" typeof="foaf:Person" '
                'property="foaf:name">Alex Milowski</div></body></html>',
                url="http://example.org/")
    want = {
        (I("http://example.org/"), I(FOAF + "name"), L("Alex Milowski")),
        (B("b"), I(RDF + "type"), I(FOAF + "Person")),
    }
    assert isomorphic(got, want), sorted(got)


def test_empty_curie_about_chaining():
    got = parse('<html><body><div about="[]" typeof="foaf:Person">'
                '<span property="foaf:name">Alex Milowski</span></div></body></html>')
    want = {
        (B("b"), I(RDF + "type"), I(FOAF + "Person")),
        (B("b"), I(FOAF + "name"), L("Alex Milowski")),
    }
    assert isomorphic(got, want), sorted(got)


def test_empty_curie_resource_with_href_rel():
    got = parse('<html><body><a href="license.xhtml" rel="license" '
                'resource="[]">The Foo Document</a></body></html>',
                url="http://example.org/")
    assert (I("http://example.org/"), I(XHV + "license"),
            I("http://example.org/license.xhtml")) in got


# --- malformed datatypes accepted when not validating (586-617) ----------
def test_malformed_datatype_passthrough():
    got = parse('<html><body><span about="" property="rdf:value" '
                'datatype="xsd:date" content="2010-1-1"></span></body></html>',
                url="http://example.org/")
    assert (I("http://example.org/"), I(RDF + "value"),
            L("2010-1-1", dt=XSD + "date")) in got


# --- CURIE with colon in local part (618-633) ------------------------------
def test_curie_colon_local_part():
    got = parse('<html prefix="foo: http://example/"><body>'
                '<div property="foo:due:to:facebook:interpretation:of:CURIE">Value</div>'
                '</body></html>', url="http://example.org/")
    assert (I("http://example.org/"),
            I("http://example/due:to:facebook:interpretation:of:CURIE"),
            L("Value")) in got


# --- vocab term accept/reject (667-712) --------------------------------------
def test_vocab_term_accepts():
    for term in ["term", "A/B", "a09b", "a_b", "a.b"]:
        got = parse('<html><body><span vocab="http://example/" '
                    'property="%s">Foo</span></body></html>' % term,
                    url="http://example/")
        assert (I("http://example/"), I("http://example/" + term),
                L("Foo")) in got, term


def test_vocab_term_rejects():
    # prefix:suffix goes through CURIE/absuri instead; /path and
    # 1leading_numeric are not terms and not absolute IRIs
    for term in ["/path", "1leading_numeric"]:
        got = parse('<html><body><span vocab="http://example/" '
                    'property="%s">Foo</span></body></html>' % term,
                    url="http://example/")
        assert not any(t[1] == I("http://example/" + term) for t in got), term


# --- rel/rev host matrix (1299-1338) -------------------------------------------
def test_rel_term_xhtml1_kept_with_property():
    # xhtml1 (not an HTML5 host): @rel terms survive alongside @property
    got = parse('<html><body><a about="" property="rdf:value" rel="license" '
                'href="http://example/">Foo</a></body></html>',
                url="http://ex.org/", host_language="xhtml1")
    assert (I("http://ex.org/"), I(RDF + "value"), L("Foo")) in got
    assert (I("http://ex.org/"), I(XHV + "license"), I("http://example/")) in got


def test_rel_term_xhtml5_filtered_with_property():
    got = parse('<html><body><a about="" property="rdf:value" rel="license" '
                'href="http://example/">Foo</a></body></html>',
                url="http://ex.org/", host_language="xhtml5")
    assert (I("http://ex.org/"), I(RDF + "value"), I("http://example/")) in got
    assert not any(t[1] == I(XHV + "license") for t in got)


def test_rel_term_and_curie_xhtml5():
    got = parse('<html><body><a about="" property="rdf:value" '
                'rel="license cc:license" href="http://example/">Foo</a></body></html>',
                url="http://ex.org/", host_language="xhtml5")
    assert (I("http://ex.org/"), I(RDF + "value"), L("Foo")) in got
    assert (I("http://ex.org/"), I(CC + "license"), I("http://example/")) in got
    assert not any(t[1] == I(XHV + "license") for t in got)


# --- @role variants (1339-1410) ---------------------------------------------
def test_role_iri_object():
    got = parse('<html><body><div id="therole" '
                'role="http://example/roles/somerole"><p>x</p></div></body></html>',
                url="http://ex.org/")
    assert (I("http://ex.org/#therole"), I(XHV + "role"),
            I("http://example/roles/somerole")) in got


def test_role_multiple_values():
    got = parse('<html><body><div prefix="ex: http://example/roles/" id="therole" '
                'role="ex:somerole someOtherRole http://example/alternate/role noprefix:final">'
                '<p>x</p></div></body></html>', url="http://ex.org/")
    s = I("http://ex.org/#therole")
    for obj in ["http://example/roles/somerole", XHV + "someOtherRole",
                "http://example/alternate/role", "noprefix:final"]:
        assert (s, I(XHV + "role"), I(obj)) in got, obj


# --- HTML / XML literals (reader_spec.rb:189-237) ------------------------
def test_rdf_html_literal():
    # reader_spec "HTML Literal > rdf:HTML": inner markup serialized
    # verbatim into the literal, datatype rdf:HTML
    html = ('<!DOCTYPE html><html><head><base href=""/></head><body>'
            '<div about="http://example/">'
            '<h2 property="dc:title" datatype="rdf:HTML">E = mc<sup>2</sup>'
            ': The Most Urgent Problem of Our Time</h2></div></body></html>')
    got = parse(html, url="http://example/")
    assert (I("http://example/"), I("http://purl.org/dc/terms/title"),
            L("E = mc<sup>2</sup>: The Most Urgent Problem of Our Time",
              dt=RDF + "HTML")) in got, sorted(got)


def test_rdf_xmlliteral_namespace_injection():
    # reader_spec "XML Literal > rdf:XMLLiteral" (the spec skips the
    # assertion for matcher reasons but documents the expected form):
    # in-scope xhtml namespace is declared on the serialized element
    html = ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            '<head><base href=""/></head><body>'
            '<div about="http://example/">'
            '<h2 property="dc:title" datatype="rdf:XMLLiteral">E = mc<sup>2</sup>'
            ': The Most Urgent Problem of Our Time</h2></div></body></html>')
    got = parse(html, url="http://example/", host_language="xhtml1")
    assert (I("http://example/"), I("http://purl.org/dc/terms/title"),
            L('E = mc<sup xmlns="http://www.w3.org/1999/xhtml">2</sup>'
              ': The Most Urgent Problem of Our Time',
              dt=RDF + "XMLLiteral")) in got, sorted(got)


def test_processor_callback_fires_without_processor_graph():
    """reader.rb:294,534-541: the per-statement callback receives every
    processor-graph row even when rdfagraph excludes 'processor', and
    those rows stay OUT of the returned graphs."""
    from rdf_rdfa_spark.rdfa.walk import parse_rdfa

    html = '<div property="noterm">x</div>'  # undefined TERM → warning
    seen = []
    out, proc, _ = parse_rdfa(html, url="http://cb.example/",
                              processor_callback=seen.append)
    assert seen, "callback never fired for the undefined-term warning"
    assert proc == []          # processor graph not requested → not returned
    # every callback row is a well-formed term-tuple triple
    assert all(len(t) == 3 and t[1][0] == "iri" for t in seen)
    # with the processor graph requested, the same rows are BOTH
    # returned and called back
    seen2 = []
    out2, proc2, _ = parse_rdfa(html, url="http://cb.example/",
                                rdfagraph=("output", "processor"),
                                processor_callback=seen2.append)
    assert seen2 == proc2 and proc2


def test_parse_cli_ntriples(tmp_path):
    import subprocess
    import sys as _sys

    page = tmp_path / "p.html"
    page.write_text('<div about="#x" property="dc:title" lang="en">T&amp;T</div>')
    out = subprocess.run(
        [_sys.executable, "scripts/parse.py", str(page),
         "--uri", "http://cli.example/"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == (
        '<http://cli.example/#x> <http://purl.org/dc/terms/title> '
        '"T&T"@en .')
