"""Embedded JSON-LD subset reader (reader.rb:380-408 extract_script —
the reference feeds ``application/ld+json`` scripts to the json-ld gem
when installed).

Implements the expansion subset that covers real-world usage — the
overwhelming majority of crawled JSON-LD is schema.org markup with a
string ``@context``:

  - @context: a vocabulary URL string (known-vocab normalization:
    "https://schema.org" → http://schema.org/), a dict of prefix/term
    → IRI mappings plus @vocab/@language, or a list of those. Remote
    context FETCHING is out of scope (no network in the pipeline) —
    unknown remote contexts fall back to treating the URL+'/' as
    @vocab, which is exactly right for the vocab-style contexts that
    dominate crawls.
  - node objects: @id (IRI or bnode label), @type (term/IRI, listed),
    nested node objects, arrays (one triple each), @graph wrappers.
  - value objects: @value with @language or @type.
  - JSON natives: string → plain literal; int → xsd:integer; float →
    xsd:double (canonical exponent form per JSON-LD); bool →
    xsd:boolean.
  - @list → rdf:first/rest/nil chain.

Reification-free, no @reverse/@index/@container remapping (documented;
these are rare in crawl data).
"""

from __future__ import annotations

import json
import re

from .resolve import resolve
from .terms import RDF_NS, XSD_NS, iri, literal

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

# vocab-style remote contexts seen in crawls → their term base
_KNOWN_VOCABS = {
    "http://schema.org": "http://schema.org/",
    "https://schema.org": "http://schema.org/",
    "http://schema.org/": "http://schema.org/",
    "https://schema.org/": "http://schema.org/",
    "https://w3id.org/security/v1": "https://w3id.org/security#",
}

_ABS_IRI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class _Context:
    __slots__ = ("terms", "vocab", "language")

    def __init__(self):
        self.terms = {}
        self.vocab = None
        self.language = None

    def merged(self, ctx_value):
        out = _Context()
        out.terms = dict(self.terms)
        out.vocab = self.vocab
        out.language = self.language
        for part in (ctx_value if isinstance(ctx_value, list) else [ctx_value]):
            if isinstance(part, str):
                out.vocab = _KNOWN_VOCABS.get(
                    part.rstrip("/") if part.rstrip("/") in _KNOWN_VOCABS
                    else part, _KNOWN_VOCABS.get(part))
                if out.vocab is None:
                    # vocab-style fallback: the URL itself is the base
                    out.vocab = part if part.endswith(("/", "#")) else part + "/"
            elif isinstance(part, dict):
                for k, v in part.items():
                    if k == "@vocab" and isinstance(v, str):
                        out.vocab = v
                    elif k == "@language":
                        out.language = v
                    elif isinstance(v, str) and not k.startswith("@"):
                        out.terms[k] = v
                    elif (isinstance(v, dict) and
                          isinstance(v.get("@id"), str) and
                          not k.startswith("@")):
                        out.terms[k] = v["@id"]
        return out

    def expand(self, name: str):
        """term/CURIE/IRI → absolute IRI (None = drop)."""
        if name.startswith("@"):
            return None
        if name in self.terms:
            mapped = self.terms[name]
            return mapped if _ABS_IRI_RE.match(mapped) else (
                (self.vocab + mapped) if self.vocab else None)
        if ":" in name:
            prefix, local = name.split(":", 1)
            if prefix in self.terms and not local.startswith("//"):
                return self.terms[prefix] + local
            if _ABS_IRI_RE.match(name):
                return name
        if self.vocab:
            return self.vocab + name
        return None


class _Reader:
    def __init__(self, base, bnode_factory):
        self.base = base
        self.bnode = bnode_factory
        self.triples = []

    def _subject(self, node: dict, ctx: _Context):
        nid = node.get("@id")
        if isinstance(nid, str):
            if nid.startswith("_:"):
                return self.bnode(nid)
            # CURIE via a context prefix mapping takes precedence over
            # scheme-lookalike absolute IRIs (compact IRI expansion);
            # otherwise @id is base-relative (NEVER @vocab-expanded)
            if ":" in nid:
                prefix, local = nid.split(":", 1)
                if prefix in ctx.terms and not local.startswith("//"):
                    return iri(ctx.terms[prefix] + local)
            if _ABS_IRI_RE.match(nid):
                return iri(nid)
            return iri(resolve(self.base, nid))
        return self.bnode()

    def node(self, node: dict, ctx: _Context):
        if "@context" in node:
            ctx = ctx.merged(node["@context"])
        if "@graph" in node:
            subj = None
            for g in _as_list(node["@graph"]):
                if isinstance(g, dict):
                    subj = self.node(g, ctx)
            # properties alongside @graph (rare) intentionally dropped
            return subj
        subj = self._subject(node, ctx)

        for t in _as_list(node.get("@type")):
            if isinstance(t, str):
                ti = ctx.expand(t) or (t if _ABS_IRI_RE.match(t) else None)
                if ti:
                    self.triples.append((subj, iri(RDF_TYPE), iri(ti)))

        for key, value in node.items():
            if key.startswith("@"):
                continue
            pred = ctx.expand(key)
            if pred is None:
                continue
            for v in _as_list(value):
                obj = self.value(v, ctx)
                if obj is not None:
                    self.triples.append((subj, iri(pred), obj))
        return subj

    def value(self, v, ctx: _Context):
        if isinstance(v, dict):
            if "@list" in v:
                items = [self.value(x, ctx) for x in _as_list(v["@list"])]
                items = [x for x in items if x is not None]
                head = iri(RDF_NIL)
                cells = [self.bnode() for _ in items]
                for i, (cell, item) in enumerate(zip(cells, items)):
                    self.triples.append((cell, iri(RDF_FIRST), item))
                    nxt = cells[i + 1] if i + 1 < len(cells) else iri(RDF_NIL)
                    self.triples.append((cell, iri(RDF_REST), nxt))
                return cells[0] if cells else head
            if "@value" in v:
                val = v["@value"]
                dt = v.get("@type")
                lang = v.get("@language", ctx.language if isinstance(val, str)
                             else None)
                if dt:
                    dt = ctx.expand(dt) or dt
                    return literal(_lex(val), None, dt)
                if isinstance(val, bool):
                    return literal("true" if val else "false", None,
                                   XSD_NS + "boolean")
                if isinstance(val, int):
                    return literal(str(val), None, XSD_NS + "integer")
                if isinstance(val, float):
                    return literal(_canon_double(val), None, XSD_NS + "double")
                return literal(str(val), lang)
            if "@id" in v and len([k for k in v if not k.startswith("@")]) == 0 \
                    and "@type" not in v:
                return self._subject(v, ctx)
            return self.node(v, ctx)
        if isinstance(v, bool):
            return literal("true" if v else "false", None, XSD_NS + "boolean")
        if isinstance(v, int):
            return literal(str(v), None, XSD_NS + "integer")
        if isinstance(v, float):
            return literal(_canon_double(v), None, XSD_NS + "double")
        if isinstance(v, str):
            return literal(v, ctx.language)
        return None


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _lex(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon_double(f: float) -> str:
    """JSON-LD canonical double form (1.1E1 for 11.0)."""
    m, _, e = repr(float(f)).partition("e")
    if e:
        mantissa, exp = float(m), int(e)
    else:
        mantissa, exp = float(f), 0
    while abs(mantissa) >= 10:
        mantissa /= 10
        exp += 1
    while 0 < abs(mantissa) < 1:
        mantissa *= 10
        exp -= 1
    ms = ("%g" % mantissa)
    if "." not in ms:
        ms += ".0"
    return "%sE%d" % (ms, exp)


def parse_jsonld(text: str, base: str | None, bnode_factory):
    """A ``<script type="application/ld+json">`` payload → triples.
    Raises ValueError on unparseable JSON (callers emit a processor
    error row, matching the reference's script handling)."""
    try:
        data = json.loads(text)
    except ValueError:
        # real-world scripts carry //-comment junk (reader_spec.rb
        # "application/ld+json with junk"); drop comment-only lines
        # and retry once
        stripped = "\n".join(
            ln for ln in text.splitlines() if not ln.lstrip().startswith("//"))
        data = json.loads(stripped)
    reader = _Reader(base, bnode_factory)
    ctx = _Context()
    for node in _as_list(data):
        if isinstance(node, dict):
            reader.node(node, ctx)
    return reader.triples
