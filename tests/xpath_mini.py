"""Tiny XPath-subset evaluator over our own DOM — just enough for the
assertions the reference's writer_spec.rb makes with have_xpath
(spec/matchers.rb:3-38): child/descendant steps, [@attr], [@attr='v'],
[@class='v'], positional [n], terminal @attr / text() /
contains(text()|@attr, 'lit'), element results serialized for regex
matching."""

from __future__ import annotations

import re

from rdf_rdfa_spark.rdfa.dom import Element, parse_html, serialize_node

_STEP_RE = re.compile(r"(/{1,2})([^/]+)")
_PRED_RE = re.compile(r"\[([^\]]*)\]")


def _parse_steps(path: str):
    # contains(...) literals may hold '/': split the terminal off first
    terminal = None
    m = re.search(r"/(contains\(.*\))$", path)
    if m:
        terminal = m.group(1)
        path = path[: m.start()]
    steps = []
    for m in _STEP_RE.finditer(path):
        descend = m.group(1) == "//"
        token = m.group(2)
        name = token.split("[", 1)[0]
        preds = _PRED_RE.findall(token)
        steps.append((descend, name, preds))
    if terminal:
        steps.append((False, terminal, []))
    return steps


def _descendants(el):
    for c in el.children:
        if isinstance(c, Element):
            yield c
            yield from _descendants(c)


def _children(el):
    return [c for c in el.children if isinstance(c, Element)]


def _own_text(el) -> str:
    return "".join(c for c in el.children if isinstance(c, str))


def _match_preds(el, preds, pos=None) -> bool:
    for p in preds:
        if p.isdigit():
            if pos != int(p):
                return False
        elif "=" in p:
            attr, _, val = p.partition("=")
            attr = attr.strip().lstrip("@")
            val = val.strip().strip("'\"")
            if el.attrs.get(attr) != val:
                return False
        else:
            if p.lstrip("@") not in el.attrs:
                return False
    return True


def xpath(html_text: str, path: str):
    """Evaluate the subset → list of strings (attr/text/element
    serializations) or a single bool for contains(...)."""
    root, _doctype, _errs = parse_html(html_text)
    steps = _parse_steps(path)
    nodes = [root]
    is_root_step = True
    for i, (descend, name, preds) in enumerate(steps):
        terminal = name.startswith("@") or name.endswith(")")
        if terminal:
            if name.startswith("@"):
                attr = name[1:]
                return [n.attrs[attr] for n in nodes if attr in n.attrs]
            if name == "text()":
                return [_own_text(n) for n in nodes if _own_text(n)]
            m = re.match(r"contains\((text\(\)|@\w+),\s*'([^']*)'\)", name)
            if m:
                src, lit = m.groups()
                for n in nodes:
                    hay = (_own_text(n) if src == "text()"
                           else n.attrs.get(src[1:], ""))
                    if lit in hay:
                        return True
                return False
            raise ValueError("unsupported terminal %r" % name)
        nxt = []
        for n in nodes:
            if descend:
                cands = [c for c in _descendants(n) if c.name == name]
                for c in cands:
                    # positional predicates count among same-named
                    # siblings of the candidate's parent
                    sibs = [s for s in _children(c.parent) if s.name == name] \
                        if c.parent is not None else [c]
                    if _match_preds(c, preds, sibs.index(c) + 1):
                        nxt.append(c)
            else:
                if is_root_step and i == 0:
                    cands = [n] if n.name == name else []
                else:
                    cands = [c for c in _children(n) if c.name == name]
                for pos, c in enumerate(cands, 1):
                    if _match_preds(c, preds, pos):
                        nxt.append(c)
        nodes = nxt
        is_root_step = False
    return [serialize_node(n, xmlish=True) for n in nodes]


def assert_xpath(html: str, path: str, expected):
    """have_xpath semantics: expected may be a string (some result
    equals it), a compiled regex (some result matches), True/False
    (contains() result or any-result), or False meaning no match."""
    got = xpath(html, path)
    if expected is False:
        assert got in ([], False), "expected no match for %s, got %r" % (
            path, got)
    elif expected is True:
        assert got is True or got, "expected a match for %s" % path
    elif hasattr(expected, "search"):
        assert isinstance(got, list) and any(
            expected.search(g) for g in got), \
            "no result of %s matches %s: %r" % (path, expected.pattern, got)
    else:
        assert isinstance(got, list) and expected in got, \
            "%s: expected %r in %r" % (path, expected, got)
