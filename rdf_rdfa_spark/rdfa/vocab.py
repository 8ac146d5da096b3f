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
