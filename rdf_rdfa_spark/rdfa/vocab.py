"""Offline vocabulary registry + driver-side T-box closure (pure
Python — usable both inside the per-document UDF walker and by the
distributed pipeline stage).

The reference resolves vocabularies through RDF::Vocabulary.find or a
network fetch (/root/reference/lib/rdf/rdfa/expansion.rb:21-33); at
corpus scale vocabularies must be packaged offline. The test
vocabulary mirrors /root/reference/spec/expansion_spec.rb:3-8.
"""

from __future__ import annotations

from .terms import (
    OWL_EQUIVCLASS,
    OWL_EQUIVPROP,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
)

FOAF = "http://xmlns.com/foaf/0.1/"
_EXP = "http://example.org/vocab#"

VOCAB_REGISTRY: dict[str, list] = {
    _EXP: [
        (_EXP + "name", RDFS_SUBPROPERTYOF, FOAF + "name"),
        (_EXP + "namee", OWL_EQUIVPROP, FOAF + "name"),
        (_EXP + "Person", RDFS_SUBCLASSOF, FOAF + "Person"),
        (_EXP + "Persone", OWL_EQUIVCLASS, FOAF + "Person"),
    ],
}


def _closure(pairs: set) -> set:
    out = set(pairs)
    while True:
        new = {(a, d) for (a, b) in out for (c, d) in out if b == c} - out
        if not new:
            return out
        out |= new


def tbox_closures(tbox_rows):
    """(sub, rel, sup) rows → (prop_pairs, class_pairs), transitively
    closed, reflexive edges excluded. Equivalence adds both directions."""
    prop, cls = set(), set()
    for sub, rel, sup in tbox_rows:
        if rel == RDFS_SUBPROPERTYOF:
            prop.add((sub, sup))
        elif rel == OWL_EQUIVPROP:
            prop.add((sub, sup))
            prop.add((sup, sub))
        elif rel == RDFS_SUBCLASSOF:
            cls.add((sub, sup))
        elif rel == OWL_EQUIVCLASS:
            cls.add((sub, sup))
            cls.add((sup, sub))
    prop, cls = _closure(prop), _closure(cls)
    return (
        [(a, b) for (a, b) in prop if a != b],
        [(a, b) for (a, b) in cls if a != b],
    )


_AXIOM_RELS = {RDFS_SUBPROPERTYOF, RDFS_SUBCLASSOF,
               OWL_EQUIVPROP, OWL_EQUIVCLASS}


def register_vocabulary(url: str, source) -> int:
    """Register a vocabulary for offline expansion, mirroring the
    reference's vocab_repository/Vocabulary.find resolution
    (expansion.rb:21-33) without the network fetch: at corpus scale
    vocabularies are packaged with the job, not fetched per document.

    ``source`` is either an iterable of (sub, rel, sup) string rows or
    a Turtle document string (parsed with the embedded-script Turtle
    reader; only the four schema-axiom predicates are kept).  Returns
    the number of axioms registered.  Call on the DRIVER before
    building the extraction/expansion plan — the registry travels to
    executors inside the UDF closure; late registrations on a live
    cluster won't reach already-pickled plans."""
    if isinstance(source, str):
        from .ntriples import parse_turtle

        rows = [
            (s[1], p[1], o[1])
            for (s, p, o) in parse_turtle(source)
            if p[1] in _AXIOM_RELS and s[0] == "iri" and o[0] == "iri"
        ]
    else:
        rows = [(str(s), str(r), str(o)) for (s, r, o) in source
                if str(r) in _AXIOM_RELS]
    VOCAB_REGISTRY[str(url)] = rows
    return len(rows)
