"""Embedded application/csvm+json (CSVW metadata) script handoff —
closes the reference's optional rdf-tabular path (reader.rb:380-408)
with a metadata-side mapping; CSV row data stays an observable
offline warning."""

from rdf_rdfa_spark.rdfa.walk import parse_rdfa

CSVW = "http://www.w3.org/ns/csvw#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _page(script: str) -> bytes:
    return ("<html><head><script type=\"application/csvm+json\">"
            + script + "</script></head><body></body></html>").encode()


def test_csvw_single_table_metadata():
    out, proc, _ = parse_rdfa(_page(
        '{"@context": "http://www.w3.org/ns/csvw",'
        ' "url": "countries.csv", "dc:title": "Countries",'
        ' "tableSchema": {"columns": ['
        '   {"name": "code", "titles": "Code"},'
        '   {"name": "name", "titles": ["Name", "Label"]}]}}'
    ), url="http://x.example/dir/page.html")
    got = set(out)
    table = ("bnode", "b0")
    assert (table, ("iri", RDF_TYPE), ("iri", CSVW + "Table")) in got
    # url resolves against the document base
    assert (table, ("iri", CSVW + "url"),
            ("iri", "http://x.example/dir/countries.csv")) in got
    # common property through the RDFa initial context (dc:)
    assert (table, ("iri", "http://purl.org/dc/terms/title"),
            ("literal", "Countries", None, None)) in got
    names = {t[2][1] for t in got if t[1] == ("iri", CSVW + "name")}
    assert names == {"code", "name"}
    titles = {t[2][1] for t in got if t[1] == ("iri", CSVW + "title")}
    assert titles == {"Code", "Name", "Label"}


def test_csvw_table_group_and_ids():
    out, _, _ = parse_rdfa(_page(
        '{"@id": "#group", "tables": ['
        ' {"@id": "#t1", "url": "a.csv"},'
        ' {"url": "b.csv"}]}'
    ), url="http://x.example/p")
    got = set(out)
    g = ("iri", "http://x.example/p#group")
    assert (g, ("iri", RDF_TYPE), ("iri", CSVW + "TableGroup")) in got
    assert (g, ("iri", CSVW + "table"),
            ("iri", "http://x.example/p#t1")) in got
    urls = {t[2][1] for t in got if t[1] == ("iri", CSVW + "url")}
    assert urls == {"http://x.example/a.csv", "http://x.example/b.csv"}


def test_csvw_row_data_warning_is_observable():
    _, proc, _ = parse_rdfa(
        _page('{"url": "data.csv"}'),
        url="http://x.example/", rdfagraph="all")
    msgs = [t[2][1] for t in proc if "description" in t[1][1]]
    assert any("row data not fetched" in m for m in msgs), msgs


def test_csvw_malformed_is_error_not_crash():
    for bad in ('{not json', '"a string"', '{"no": "url-or-tables"}'):
        out, proc, _ = parse_rdfa(_page(bad), url="http://x.example/",
                                  rdfagraph="all")
        assert out == []
        msgs = [t[2][1] for t in proc if "description" in t[1][1]]
        assert any("parse error" in m for m in msgs), (bad, proc)
