"""Initial contexts + host-language defaults, fully offline.

Transcribed from the reference's interned context constants — the
reference never fetches these at runtime either (Rakefile:26-38):

  - rdfa-1.1 core prefixes/terms:  /root/reference/lib/rdf/rdfa/context/xml.rb:8-61
  - xhtml-rdfa-1.1 terms:          /root/reference/lib/rdf/rdfa/context/xhtml.rb:8-35
  - html-rdfa-1.1 (empty):         /root/reference/lib/rdf/rdfa/context/html.rb:5-12
  - host default selection:        /root/reference/lib/rdf/rdfa/reader.rb:348-372
  - rdfa1.0 default terms:         reader.rb:357-363

On the Spark side these frozen dicts ride to executors inside the UDF
closure (tiny, automatically serialized; no runtime network fetch).
"""

from __future__ import annotations

from .terms import XHV_NS

# http://www.w3.org/2011/rdfa-context/rdfa-1.1 (context/xml.rb:8-61)
RDFA_CORE_PREFIXES = {
    "as": "https://www.w3.org/ns/activitystreams#",
    "cc": "http://creativecommons.org/ns#",
    "csvw": "http://www.w3.org/ns/csvw#",
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dcterms": "http://purl.org/dc/terms/",
    "dqv": "http://www.w3.org/ns/dqv#",
    "duv": "https://www.w3.org/ns/duv#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "jsonld": "http://www.w3.org/ns/json-ld#",
    "ldp": "http://www.w3.org/ns/ldp#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "oa": "http://www.w3.org/ns/oa#",
    "odrl": "http://www.w3.org/ns/odrl/2/",
    "og": "http://ogp.me/ns#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
    "qb": "http://purl.org/linked-data/cube#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rev": "http://purl.org/stuff/rev#",
    "rif": "http://www.w3.org/2007/rif#",
    "rr": "http://www.w3.org/ns/r2rml#",
    "schema": "http://schema.org/",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "sosa": "http://www.w3.org/ns/sosa/",
    "ssn": "http://www.w3.org/ns/ssn/",
    "time": "http://www.w3.org/2006/time#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "void": "http://rdfs.org/ns/void#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

RDFA_CORE_TERMS = {
    "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
    "license": "http://www.w3.org/1999/xhtml/vocab#license",
    "role": "http://www.w3.org/1999/xhtml/vocab#role",
}

# http://www.w3.org/2011/rdfa-context/xhtml-rdfa-1.1 (context/xhtml.rb:8-35)
XHTML_TERMS = {
    t: XHV_NS + t
    for t in (
        "alternate appendix bookmark chapter cite contents copyright first "
        "glossary help icon index last license meta next p3pv1 prev previous "
        "section start stylesheet subsection top up"
    ).split()
}

# rdfa1.0 default term mappings (reader.rb:357-363)
RDFA10_TERMS = {
    t: XHV_NS + t
    for t in (
        "alternate appendix bookmark cite chapter contents copyright first "
        "glossary help icon index last license meta next p3pv1 prev role "
        "section stylesheet subsection start top up"
    ).split()
}

_HTML_HOSTS = ("xhtml1", "xhtml5", "html4", "html5")


def initial_context(host_language: str, version: str):
    """Return (uri_mappings, term_mappings, default_vocabulary) for the
    root evaluation context (reader.rb:365-372 + 588-600)."""
    if version == "rdfa1.0":
        # 1.0 skips initial-context loading (reader.rb:590);
        # only the host default term mappings apply.
        terms = dict(RDFA10_TERMS) if host_language in _HTML_HOSTS else {}
        return {}, terms, None
    prefixes = dict(RDFA_CORE_PREFIXES)
    terms = dict(RDFA_CORE_TERMS)
    if host_language == "xhtml1":
        terms.update(XHTML_TERMS)
    # xml/svg: core only; xhtml5/html4/html5: core + (empty) html context
    return prefixes, terms, None
