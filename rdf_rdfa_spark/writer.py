"""Minimal XHTML+RDFa serializer (SURVEY.md S11).

The reference Writer is an 824-line Haml-template engine
(/root/reference/lib/rdf/rdfa/writer.rb) — a single-node debug tool,
not a distributed stage. This keeps its contract (graph → XHTML+RDFa
whose re-parse is isomorphic to the input) in the smallest possible
form: subjects ordered (IRIs first, bnodes last — writer.rb:397-427's
spirit), predicates sorted (writer.rb:434-450), one <div> per subject
with <link rel> for resources and <span property> for literals.
Round-trip is tested through OUR OWN reader (writer_spec.rb does the
same, writer_spec.rb:546).

Driver-side only by design: serialize small graphs (debug, goldens,
samples), never the corpus.
"""

from __future__ import annotations

from collections import defaultdict

_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def to_rdfa_html(rows, title: str = "RDFa export") -> str:
    """rows: iterables of (subj, pred, obj, obj_kind, lang, datatype)
    — e.g. ``df.select(...).collect()`` on a small triples DataFrame.
    Returns an XHTML+RDFa 1.1 document string."""
    by_subj: dict[str, list] = defaultdict(list)
    for r in rows:
        subj, pred, obj, obj_kind, lang, datatype = r[:6]
        by_subj[subj].append((pred, obj, obj_kind, lang, datatype))

    # IRIs first then bnodes, lexicographic within (writer.rb:397-427)
    subjects = sorted(by_subj, key=lambda s: (s.startswith("_:"), s))

    parts = [
        "<!DOCTYPE html>",
        '<html xmlns="http://www.w3.org/1999/xhtml">',
        "<head><title>%s</title></head>" % _esc(title),
        "<body>",
    ]
    for subj in subjects:
        parts.append('<div about="%s">' % _esc(subj))
        for pred, obj, obj_kind, lang, datatype in sorted(by_subj[subj]):
            if obj_kind == "iri":
                parts.append('<link rel="%s" href="%s"/>' % (_esc(pred), _esc(obj)))
            elif obj_kind == "bnode":
                parts.append('<link rel="%s" resource="%s"/>' % (_esc(pred), _esc(obj)))
            elif datatype:
                parts.append(
                    '<span property="%s" datatype="%s" content="%s"></span>'
                    % (_esc(pred), _esc(datatype), _esc(obj)))
            elif lang:
                parts.append(
                    '<span property="%s" lang="%s" content="%s"></span>'
                    % (_esc(pred), _esc(lang), _esc(obj)))
            else:
                # empty @datatype forces a plain literal even for
                # text that looks like something else
                parts.append(
                    '<span property="%s" datatype="" content="%s"></span>'
                    % (_esc(pred), _esc(obj)))
        parts.append("</div>")
    parts.append("</body></html>")
    return "\n".join(parts)


def df_to_rdfa_html(triples_df, limit: int = 10000, **kw) -> str:
    rows = (
        triples_df.select("subj", "pred", "obj", "obj_kind", "lang", "datatype")
        .limit(limit)
        .collect()
    )
    return to_rdfa_html(rows, **kw)
