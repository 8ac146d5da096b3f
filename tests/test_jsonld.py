"""Embedded JSON-LD scripts (reader.rb:380-408 — the reference's
json-ld gem handoff, implemented in-process for the expansion subset
that dominates crawled pages: schema.org string contexts)."""

import json

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

from test_walk_goldens import B, I, L, isomorphic

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = "http://schema.org/"


def parse_script(payload, url="http://example.org/"):
    html = ('<html><head><script type="application/ld+json">%s</script>'
            '</head><body></body></html>' % payload)
    out, proc, _ = parse_rdfa(html, url=url, rdfagraph=("output", "processor"))
    return set(out), proc


def test_schema_org_article():
    # THE dominant crawl idiom: string @context, @type, nested object
    payload = json.dumps({
        "@context": "https://schema.org",
        "@type": "Article",
        "@id": "http://example.org/a1",
        "headline": "Hello",
        "wordCount": 120,
        "author": {"@type": "Person", "name": "Alice"},
    })
    got, _ = parse_script(payload)
    want = {
        (I("http://example.org/a1"), I(RDF + "type"), I(SCHEMA + "Article")),
        (I("http://example.org/a1"), I(SCHEMA + "headline"), L("Hello")),
        (I("http://example.org/a1"), I(SCHEMA + "wordCount"),
         L("120", dt=XSD + "integer")),
        (I("http://example.org/a1"), I(SCHEMA + "author"), B("a")),
        (B("a"), I(RDF + "type"), I(SCHEMA + "Person")),
        (B("a"), I(SCHEMA + "name"), L("Alice")),
    }
    assert isomorphic(got, want), sorted(got)


def test_context_dict_curies_value_objects():
    payload = json.dumps({
        "@context": {"dc": "http://purl.org/dc/terms/",
                     "name": "http://xmlns.com/foaf/0.1/name",
                     "@language": "en"},
        "@id": "http://example.org/x",
        "dc:title": {"@value": "Der Titel", "@language": "de"},
        "name": "Bob",
        "dc:extent": {"@value": "42", "@type": "xsd:integer"},
        "dc:relation": {"@id": "http://example.org/y"},
    })
    got, _ = parse_script(payload)
    s = I("http://example.org/x")
    assert (s, I("http://purl.org/dc/terms/title"),
            L("Der Titel", lang="de")) in got
    assert (s, I("http://xmlns.com/foaf/0.1/name"), L("Bob", lang="en")) in got
    assert (s, I("http://purl.org/dc/terms/relation"),
            I("http://example.org/y")) in got


def test_graph_wrapper_arrays_and_natives():
    payload = json.dumps({
        "@context": "https://schema.org",
        "@graph": [
            {"@id": "http://example.org/p", "@type": "Person",
             "knowsAbout": ["rdf", "spark"],
             "height": 1.75, "alumni": True},
        ],
    })
    got, _ = parse_script(payload)
    s = I("http://example.org/p")
    assert (s, I(SCHEMA + "knowsAbout"), L("rdf")) in got
    assert (s, I(SCHEMA + "knowsAbout"), L("spark")) in got
    assert (s, I(SCHEMA + "height"), L("1.75E0", dt=XSD + "double")) in got
    assert (s, I(SCHEMA + "alumni"), L("true", dt=XSD + "boolean")) in got


def test_list_and_bnode_ids():
    payload = json.dumps({
        "@context": {"ex": "http://example.org/ns#"},
        "@id": "_:n1",
        "ex:items": {"@list": ["a", "b"]},
    })
    got, _ = parse_script(payload)
    EX = "http://example.org/ns#"
    want = {
        (B("n"), I(EX + "items"), B("c1")),
        (B("c1"), I(RDF + "first"), L("a")),
        (B("c1"), I(RDF + "rest"), B("c2")),
        (B("c2"), I(RDF + "first"), L("b")),
        (B("c2"), I(RDF + "rest"), I(RDF + "nil")),
    }
    assert isomorphic(got, want), sorted(got)


def test_bad_json_is_processor_error_not_crash():
    got, proc = parse_script("{not json")
    assert got == set()
    assert any("ld+json" in str(t) for t in proc)


def test_relative_id_resolves_against_page():
    payload = json.dumps({
        "@context": "https://schema.org",
        "@id": "article/7", "@type": "Article",
    })
    got, _ = parse_script(payload, url="http://example.org/dir/page")
    assert (I("http://example.org/dir/article/7"), I(RDF + "type"),
            I(SCHEMA + "Article")) in got, sorted(got)
