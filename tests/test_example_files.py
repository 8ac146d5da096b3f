"""End-to-end regression net over the reference's real-world RDFa
pages (/root/reference/example-files/ — GoodRelations product pages,
the RDFa Core spec itself, schema.org, FOAF/WebID...).  Pins triple
count + a hash of the full deterministic graph per file; any parser
change that shifts real-page output trips this even when the
synthetic corpus doesn't.

core.ttl is a reference-generated golden for core.html from a
slightly different document revision — grounded-triple recall ≥ 0.99
is the parity bar there (206/207 at pin time)."""

from __future__ import annotations

import hashlib
import os

import pytest

from rdf_rdfa_spark.rdfa.ntriples import parse_turtle
from rdf_rdfa_spark.rdfa.walk import parse_rdfa

DIR = "/root/reference/example-files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DIR), reason="reference example files not available")

# (file, triples, sha256[:16] of the sorted triple reprs) — bnode
# labels are deterministic (per-doc counter), so the full graph hash
# is stable.
PINS = [
    ("0265.xhtml", 1, "81a0965ca0ed1e22"),
    ("0316-out.html", 3, "42ddda9cf6a22e00"),
    ("apassant.html", 7, "f19719f29d5e867b"),
    ("best-buy.html", 543, "98646df75c94283f"),
    ("core.html", 261, "c5ad449c597b2a83"),
    ("data-view.xhtml", 3, "4e87ddb6b65ac0ff"),
    ("franz.com.html", 133, "9d16c27be6877a50"),
    ("iri-resolution.xhtml", 306, "04094f3b011c3e17"),
    ("jeni-ice-cream.html", 9, "087ce88ac820cc24"),
    ("no-resource-about-typeof-5-1.xhtml", 2, "d35abc7801b5a53d"),
    ("no-resource-about-typeof-5-2.xhtml", 2, "76996230038b659c"),
    ("no-resource-href-11.xhtml", 1, "7437d72a987b946f"),
    ("no-resource-href-6.xhtml", 1, "97a62a256841a12a"),
    ("openlinksw-pricing.html", 1994, "5a96cb88c9f60669"),
    ("payswarm.html", 48, "acd7898433215342"),
    ("property-copying.html", 15, "3e10d72070555436"),
    ("reece-dunn.html", 1, "0e02a9bbd1c72a10"),
    ("schema-person.html", 24, "12a55d4a77232ef1"),
    ("stain-validation.html", 4, "a1d455f40452a716"),
    ("typed-property.xhtml", 4, "6f3eca55a937d13a"),
    ("webid.html", 8, "f6f61ee2e0ac576e"),
]


@pytest.mark.parametrize("fname,n,digest", PINS,
                         ids=[p[0] for p in PINS])
def test_example_file_graph_pinned(fname, n, digest):
    raw = open(os.path.join(DIR, fname), "rb").read()
    out, _proc, _ = parse_rdfa(raw, url="http://example.com/" + fname)
    h = hashlib.sha256(
        "\n".join(sorted(repr(t) for t in out)).encode()).hexdigest()[:16]
    assert (len(out), h) == (n, digest), \
        "graph drift on %s: %d triples, %s" % (fname, len(out), h)


def test_core_ttl_grounded_recall():
    raw = open(os.path.join(DIR, "core.html"), "rb").read()
    out, _, _ = parse_rdfa(raw, url="http://example.com")
    got = {t for t in out if all(x[0] != "bnode" for x in t)}
    ttl = open(os.path.join(DIR, "core.ttl")).read()
    want = [t for t in parse_turtle(ttl, base="http://example.com")
            if all(x[0] != "bnode" for x in t)]
    hit = sum(1 for t in want if t in got)
    assert hit / len(want) >= 0.99, "recall %d/%d" % (hit, len(want))
