"""Minimal CSVW (CSV on the Web) metadata → RDF mapping for embedded
``application/csvm+json`` scripts.

The reference delegates this media type to the optional rdf-tabular
gem (reader.rb:380-408); without the gem it silently skips the
script.  This module closes that gap for the metadata side: the
table-group / table structure and declared annotations become triples
in the ``csvw:`` vocabulary (standard-mode shape per the W3C csv2rdf
REC §4), while the ROW data — which lives in an external CSV the
metadata points at — is not fetched (the same deliberate offline
posture as vocabulary expansion: a crawl-scale job must not do
per-document network I/O).  Callers surface that as a processor
warning so the skip is observable.

Supported metadata surface (csvw-metadata REC §5): a top-level Table
or TableGroup, ``url``, ``@id``, ``tableSchema.columns[*].name`` /
``titles``, and common properties in compact ``prefix:name`` form
resolved against the caller-supplied prefix map (the RDFa initial
context)."""

from __future__ import annotations

import json

from .resolve import resolve
from .terms import iri, literal

CSVW = "http://www.w3.org/ns/csvw#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class CsvwParseError(ValueError):
    pass


def _plain(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def _node(obj: dict, base: str, bnode_factory):
    nid = obj.get("@id")
    if isinstance(nid, str) and nid:
        return iri(resolve(base, nid))
    return bnode_factory()


def _common_properties(obj: dict, subject, base, emit, prefixes):
    """Common properties (csvw-metadata §5.8): any 'prefix:name' key
    whose prefix is in the supplied map."""
    for key, val in obj.items():
        if ":" not in key or key.startswith("@"):
            continue
        pfx, local = key.split(":", 1)
        if pfx not in prefixes or "//" in local:
            continue
        pred = iri(prefixes[pfx] + local)
        for v in val if isinstance(val, list) else [val]:
            if isinstance(v, dict):
                if "@id" in v:
                    emit(subject, pred, iri(resolve(base, v["@id"])))
                elif "@value" in v:
                    emit(subject, pred,
                         literal(str(v["@value"]), v.get("@language"),
                                 v.get("@type")))
            elif isinstance(v, (str, int, float, bool)):
                emit(subject, pred, literal(_plain(v)))


def parse_csvw_metadata(text: str, base: str, bnode_factory,
                        prefixes: dict | None = None):
    """CSVW metadata JSON → (triples, warnings) in the same term shape
    the other embedded-script readers emit."""
    try:
        meta = json.loads(text)
    except (ValueError, TypeError) as e:
        raise CsvwParseError("invalid csvm+json: %s" % e)
    if not isinstance(meta, dict):
        raise CsvwParseError("csvm+json root must be an object")
    prefixes = prefixes or {}
    triples: list = []
    warnings: list[str] = []

    def emit(s, p, o):
        triples.append((s, p, o))

    tables = meta.get("tables")
    if isinstance(tables, list):
        group, members = meta, tables
    elif "url" in meta:
        group, members = None, [meta]
    else:
        raise CsvwParseError(
            "csvm+json metadata has neither 'tables' nor 'url'")

    gnode = None
    if group is not None:
        gnode = _node(group, base, bnode_factory)
        emit(gnode, iri(RDF_TYPE), iri(CSVW + "TableGroup"))
        _common_properties(group, gnode, base, emit, prefixes)

    for table in members:
        if not isinstance(table, dict) or not isinstance(
                table.get("url"), str):
            warnings.append("csvm+json table entry without a url skipped")
            continue
        tnode = _node(table, base, bnode_factory)
        if gnode is not None:
            emit(gnode, iri(CSVW + "table"), tnode)
        emit(tnode, iri(RDF_TYPE), iri(CSVW + "Table"))
        csv_url = resolve(base, table["url"])
        emit(tnode, iri(CSVW + "url"), iri(csv_url))
        _common_properties(table, tnode, base, emit, prefixes)
        schema = table.get("tableSchema")
        if isinstance(schema, dict):
            for col in schema.get("columns") or []:
                if not isinstance(col, dict):
                    continue
                cnode = bnode_factory()
                emit(tnode, iri(CSVW + "column"), cnode)
                emit(cnode, iri(RDF_TYPE), iri(CSVW + "Column"))
                if isinstance(col.get("name"), str):
                    emit(cnode, iri(CSVW + "name"), literal(col["name"]))
                titles = col.get("titles")
                for t in titles if isinstance(titles, list) else (
                        [titles] if isinstance(titles, str) else []):
                    emit(cnode, iri(CSVW + "title"), literal(str(t)))
        warnings.append(
            "csvm+json row data not fetched (offline: %s)" % csv_url)
    return triples, warnings
