"""HTML microdata → RDF (SURVEY S9; reader.rb:437-445).

The reference delegates to the rdf-microdata gem when installed
(``@repository << RDF::Microdata::Reader.new(@doc)``); this implements
the same mapping (W3C microdata-to-RDF note) directly over our DOM:

  - top-level items: elements with @itemscope and no @itemprop
  - subject: @itemid (resolved) else a fresh bnode
  - one rdf:type per absolute-IRI token in @itemtype
  - property names: absolute IRIs pass through; plain names resolve
    against the item's vocabulary — the first @itemtype stripped back
    to its last '/' or '#' (schema.org/Person + "name" →
    schema.org/name)
  - values by element kind: meta→@content, img/audio/video/embed/
    iframe/source/track→@src, a/area/link→@href, object→@data,
    data/meter→@value, time→@datetime|text, nested @itemscope→item,
    else text content
  - @itemref: referenced subtrees crawled as if children (cycle-safe)

Untyped items with non-IRI property names are skipped (the note's
md:item registry fallback is out of scope — documented deviation).
"""

from __future__ import annotations

from .dom import Element
from .resolve import resolve
from .terms import RDF_NS, iri, literal

RDF_TYPE = RDF_NS + "type"

_SRC_ELEMENTS = ("audio", "embed", "iframe", "img", "source", "track", "video")
_HREF_ELEMENTS = ("a", "area", "link")


def _lang_of(el: Element):
    """DOM-inherited language (the mapping uses the value element's
    effective language, not just its own attribute)."""
    cur = el
    while cur is not None:
        v = cur.attrs.get("xml:lang")
        if v is None:
            v = cur.attrs.get("lang")
        if v is not None:
            return v or None
        cur = cur.parent
    return None


def _is_absolute(name: str) -> bool:
    return ":" in name and name.split(":", 1)[0].isalpha() and (
        "//" in name or name.startswith(("urn:", "mailto:", "tel:")))


def _vocab_of(itemtype: str) -> str:
    for sep in ("#", "/"):
        cut = itemtype.rfind(sep)
        if cut > len("https://"):
            return itemtype[: cut + 1]
    return itemtype


def _collect_ids(root: Element) -> dict:
    ids = {}
    stack = [root]
    while stack:
        el = stack.pop()
        v = el.attrs.get("id")
        if v is not None and v not in ids:
            ids[v] = el
        stack.extend(c for c in el.element_children())
    return ids


class _MicrodataReader:
    def __init__(self, root: Element, base: str | None, bnode_factory):
        self.root = root
        self.base = base
        self.bnode = bnode_factory
        self.triples = []
        self._ids = None
        self._seen_items = {}

    def read(self):
        stack = [self.root]
        while stack:
            el = stack.pop()
            if "itemscope" in el.attrs and "itemprop" not in el.attrs:
                self.item(el)
                # nested items are reached through property crawling
                continue
            stack.extend(reversed(el.element_children()))
        return self.triples

    def item(self, el: Element):
        got = self._seen_items.get(id(el))
        if got is not None:
            return got
        itemid = (el.attrs.get("itemid") or "").strip()
        subj = iri(resolve(self.base, itemid)) if itemid else self.bnode()
        self._seen_items[id(el)] = subj

        types = [t for t in (el.attrs.get("itemtype") or "").split()
                 if _is_absolute(t)]
        for t in types:
            self.triples.append((subj, iri(RDF_TYPE), iri(t)))
        vocab = _vocab_of(types[0]) if types else None

        for prop_el in self._prop_elements(el):
            self.property(prop_el, subj, vocab)
        return subj

    def _prop_elements(self, scope: Element):
        """Descendants carrying @itemprop, not crossing into nested
        itemscopes' own subtrees; @itemref subtrees included."""
        out = []
        roots = [scope]
        refs = (scope.attrs.get("itemref") or "").split()
        if refs:
            if self._ids is None:
                self._ids = _collect_ids(self.root)
            seen_ref = {id(scope)}
            for r in refs:
                ref_el = self._ids.get(r)
                if ref_el is not None and id(ref_el) not in seen_ref:
                    seen_ref.add(id(ref_el))
                    roots.append(ref_el)
        for root in roots:
            stack = list(reversed(root.element_children()))
            if root is not scope and "itemprop" in root.attrs:
                out.append(root)  # an itemref target may itself carry one
            while stack:
                el = stack.pop()
                if "itemprop" in el.attrs:
                    out.append(el)
                if "itemscope" not in el.attrs:
                    stack.extend(reversed(el.element_children()))
        return out

    def property(self, el: Element, subj, vocab):
        value = self._value(el, vocab)
        if value is None:
            return
        for name in (el.attrs.get("itemprop") or "").split():
            if _is_absolute(name):
                pred = name
            elif vocab:
                pred = vocab + name
            else:
                continue  # untyped item, plain name: out of scope
            self.triples.append((subj, iri(pred), value))

    def _value(self, el: Element, vocab):
        a = el.attrs
        if "itemscope" in a:
            return self.item(el)
        name = el.name
        if name == "meta":
            return literal(a.get("content", ""), _lang_of(el))
        if name in _SRC_ELEMENTS:
            return iri(resolve(self.base, a.get("src", "")))
        if name in _HREF_ELEMENTS:
            return iri(resolve(self.base, a.get("href", "")))
        if name == "object":
            return iri(resolve(self.base, a.get("data", "")))
        if name in ("data", "meter"):
            return literal(a.get("value", ""), _lang_of(el))
        if name == "time":
            return literal(a.get("datetime") or el.inner_text, _lang_of(el))
        return literal(el.inner_text, _lang_of(el))


def extract_microdata(root: Element, base: str | None, bnode_factory):
    """All microdata items in ``root`` → list of term-tuple triples."""
    return _MicrodataReader(root, base, bnode_factory).read()
