"""Minimal Turtle / N-Triples parser for embedded ``<script>`` RDF.

The reference delegates ``<script type="text/turtle|text/ntriples">``
content to the rdf-turtle / rdf-ntriples gems
(/root/reference/lib/rdf/rdfa/reader.rb:380-408, invoked at 818-824;
README.md:194 names Turtle + N-Triples). This implements full
N-Triples plus the practical Turtle subset those embedded blocks use:
@prefix/@base (and SPARQL PREFIX/BASE), `a`, `;`/`,` predicate/object
lists, anonymous bnodes `[ ... ]`, collections `( ... )`, numeric /
boolean / string literals with @lang / ^^datatype.

Returns term tuples (terms.py). Raises TurtleParseError on bad input —
the caller turns that into a processor-graph warning row.
"""

from __future__ import annotations

import re

from .resolve import resolve
from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_NS,
    bnode,
    iri,
    literal,
)


class TurtleParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\s]*>)
  | (?P<string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*'''|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<prefix_decl>@prefix\b|@base\b|PREFIX\b|BASE\b)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+))
  | (?P<decimal>[+-]?(?:\d*\.\d+))
  | (?P<integer>[+-]?\d+)
  | (?P<punct>\^\^|[;,.\[\]()])
  | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*(?<!\.))
  | (?P<pname>[A-Za-z0-9_\-]*:(?:[A-Za-z0-9_\-.%:/#]*[A-Za-z0-9_\-%:/#])?)
  | (?P<kw>a|true|false)
    """,
    re.X,
)

_STR_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESC_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\])")


def _unescape(s: str) -> str:
    def sub(m):
        g = m.group(1)
        if g[0] == "u":
            return chr(int(g[1:], 16))
        if g[0] == "U":
            return chr(int(g[1:], 16))
        return _STR_ESCAPES[g]

    return _ESC_RE.sub(sub, s)


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind, value):
        self.kind = kind
        self.value = value

    def __repr__(self):  # pragma: no cover
        return "%s(%r)" % (self.kind, self.value)


def _tokenize(text: str):
    pos, n = 0, len(text)
    out = []
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            raise TurtleParseError("bad token at offset %d: %r" % (pos, text[pos : pos + 20]))
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(_Tok(kind, m.group()))
    return out


class TurtleParser:
    def __init__(self, text: str, base: str | None = None, bnode_factory=None):
        self.toks = _tokenize(text)
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self._bn = 0
        self._bnode_map: dict[str, tuple] = {}
        self.bnode_factory = bnode_factory or self._default_bnode

    def _default_bnode(self, label=None):
        self._bn += 1
        return bnode("t%d" % self._bn)

    # --- token helpers ---
    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise TurtleParseError("unexpected EOF")
        self.i += 1
        return t

    def _expect(self, value):
        t = self._next()
        if t.value != value:
            raise TurtleParseError("expected %r got %r" % (value, t.value))

    # --- productions ---
    def parse(self):
        triples = []
        while self._peek() is not None:
            t = self._peek()
            if t.kind == "prefix_decl":
                self._directive()
            else:
                self._triples(triples)
                tt = self._peek()
                if tt is not None and tt.value == ".":
                    self._next()
                elif tt is not None:
                    raise TurtleParseError("expected '.' got %r" % tt.value)
        return triples

    def _directive(self):
        t = self._next()
        kw = t.value
        if kw in ("@prefix", "PREFIX"):
            pname = self._next()
            if pname.kind != "pname" or not pname.value.endswith(":"):
                raise TurtleParseError("bad prefix name %r" % pname.value)
            iriref = self._next()
            if iriref.kind != "iriref":
                raise TurtleParseError("bad prefix IRI %r" % iriref.value)
            self.prefixes[pname.value[:-1]] = self._iri_value(iriref.value)
            if kw == "@prefix":
                self._expect(".")
        else:  # @base / BASE
            iriref = self._next()
            if iriref.kind != "iriref":
                raise TurtleParseError("bad base IRI %r" % iriref.value)
            self.base = self._iri_value(iriref.value)
            if kw == "@base":
                self._expect(".")

    def _iri_value(self, raw: str) -> str:
        v = _unescape(raw[1:-1])
        if self.base:
            return resolve(self.base, v)
        return v

    def _triples(self, out):
        t = self._peek()
        if t.value == "[":
            subj = self._bnode_property_list(out)
            if self._peek() is not None and self._peek().value not in (".",):
                self._predicate_object_list(subj, out)
        else:
            subj = self._term(out, position="subject")
            self._predicate_object_list(subj, out)

    def _predicate_object_list(self, subj, out):
        while True:
            t = self._peek()
            if t is None or t.value in (".", "]"):
                return
            pred = self._verb(out)
            while True:
                obj = self._term(out, position="object")
                out.append((subj, pred, obj))
                t = self._peek()
                if t is not None and t.value == ",":
                    self._next()
                    continue
                break
            t = self._peek()
            if t is not None and t.value == ";":
                self._next()
                continue
            return

    def _verb(self, out):
        t = self._next()
        if t.kind == "kw" and t.value == "a":
            return iri(RDF_TYPE)
        return self._term_from_tok(t, out, position="predicate")

    def _bnode_property_list(self, out):
        self._expect("[")
        node = self.bnode_factory(None)
        if self._peek() is not None and self._peek().value != "]":
            self._predicate_object_list(node, out)
        self._expect("]")
        return node

    def _collection(self, out):
        self._expect("(")
        items = []
        while self._peek() is not None and self._peek().value != ")":
            items.append(self._term(out, position="object"))
        self._expect(")")
        if not items:
            return iri(RDF_NIL)
        head = None
        prev = None
        for it in items:
            cell = self.bnode_factory(None)
            if head is None:
                head = cell
            if prev is not None:
                out.append((prev, iri(RDF_REST), cell))
            out.append((cell, iri(RDF_FIRST), it))
            prev = cell
        out.append((prev, iri(RDF_REST), iri(RDF_NIL)))
        return head

    def _term(self, out, position):
        t = self._peek()
        if t is None:
            raise TurtleParseError("unexpected EOF in %s" % position)
        if t.value == "[":
            return self._bnode_property_list(out)
        if t.value == "(":
            return self._collection(out)
        return self._term_from_tok(self._next(), out, position)

    def _term_from_tok(self, t, out, position):
        if t.kind == "iriref":
            return iri(self._iri_value(t.value))
        if t.kind == "pname":
            prefix, _, local = t.value.partition(":")
            if prefix not in self.prefixes:
                raise TurtleParseError("undefined prefix %r" % prefix)
            return iri(self.prefixes[prefix] + local)
        if t.kind == "bnode":
            label = t.value[2:]
            if label not in self._bnode_map:
                self._bnode_map[label] = self.bnode_factory(label)
            return self._bnode_map[label]
        if t.kind == "string":
            raw = t.value
            if raw.startswith(('"""', "'''")):
                lex = _unescape(raw[3:-3])
            else:
                lex = _unescape(raw[1:-1])
            nxt = self._peek()
            if nxt is not None and nxt.kind == "langtag":
                self._next()
                return literal(lex, lang=nxt.value[1:].lower())
            if nxt is not None and nxt.value == "^^":
                self._next()
                dt = self._next()
                dtt = self._term_from_tok(dt, out, "datatype")
                return literal(lex, datatype=dtt[1])
            return literal(lex)
        if t.kind == "integer":
            return literal(t.value, datatype=XSD_NS + "integer")
        if t.kind == "decimal":
            return literal(t.value, datatype=XSD_NS + "decimal")
        if t.kind == "double":
            return literal(t.value, datatype=XSD_NS + "double")
        if t.kind == "kw" and t.value in ("true", "false"):
            return literal(t.value, datatype=XSD_NS + "boolean")
        raise TurtleParseError("unexpected %r in %s" % (t.value, position))


def parse_turtle(text: str, base: str | None = None, bnode_factory=None):
    """Parse Turtle/N-Triples text → list[(subj, pred, obj)] term tuples."""
    return TurtleParser(text, base=base, bnode_factory=bnode_factory).parse()
