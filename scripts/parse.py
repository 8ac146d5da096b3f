#!/usr/bin/env python3
"""Single-document RDFa → N-Triples CLI, mirroring the reference's
script/parse surface (/root/reference/script/parse): parse one file,
URI path, or stdin and print N-Triples (default) or per-statement
inspect lines. The distributed pipeline lives in run_pipeline.py; this
is the developer tool for poking at one page.

    python scripts/parse.py page.html --uri http://example.com/
    cat page.html | python scripts/parse.py - --rdfagraph output,processor
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_rdfa_spark.rdfa.walk import parse_rdfa  # noqa: E402

_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _lit_escape(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def term_to_ntriples(t) -> str:
    kind = t[0]
    if kind == "iri":
        return "<%s>" % t[1]
    if kind == "bnode":
        return "_:%s" % t[1]
    lex, lang, dt = t[1], t[2], t[3]
    out = '"%s"' % _lit_escape(lex)
    if lang:
        out += "@%s" % lang
    elif dt:
        out += "^^<%s>" % dt
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="HTML file path, or - for stdin")
    ap.add_argument("--uri", help="base URI (defaults to file path)")
    ap.add_argument("--host-language", dest="host_language",
                    choices=["xml", "xhtml1", "xhtml5", "html4", "html5", "svg"])
    ap.add_argument("--version", choices=["rdfa1.0", "rdfa1.1"])
    ap.add_argument("--rdfagraph", default="output",
                    help="output, processor, output,processor or all")
    ap.add_argument("--vocab-expansion", action="store_true",
                    help="OWL2-subset expansion via rdfa:usesVocabulary")
    ap.add_argument("--no-reference-folding", action="store_true",
                    help="disable rdfa:copy property copying")
    ap.add_argument("--no-microdata", action="store_true",
                    help="stock-install behavior: warn on microdata")
    ap.add_argument("--format", default="ntriples",
                    choices=["ntriples", "inspect"])
    ap.add_argument("--quiet", action="store_true",
                    help="exit status only")
    args = ap.parse_args()

    if args.input == "-":
        raw = sys.stdin.buffer.read()
        base = args.uri or "http://example.com/stdin"
    else:
        with open(args.input, "rb") as fh:
            raw = fh.read()
        base = args.uri or "file://" + os.path.abspath(args.input)

    out, proc, _ = parse_rdfa(
        raw, url=base,
        host_language=args.host_language, version=args.version,
        rdfagraph=args.rdfagraph,
        reference_folding=not args.no_reference_folding,
        vocab_expansion=args.vocab_expansion,
        microdata=not args.no_microdata,
    )
    if args.quiet:
        return 0 if out or proc else 1
    for name, triples in (("output", out), ("processor", proc)):
        for s, p, o in triples:
            if args.format == "inspect":
                print("[%s] %r %r %r" % (name, s, p, o))
            else:
                print("%s %s %s ." % (term_to_ntriples(s),
                                      term_to_ntriples(p),
                                      term_to_ntriples(o)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
