"""Distributed basic-graph-pattern queries over the triple store —
the "query the constructed KG" surface (the in-memory ASK evaluator
in rdfa/bgp.py is its per-document little sibling).

A BGP compiles to relational algebra: each triple pattern is a
filtered projection of the triples table with its variables as
columns; patterns join on shared variables (Catalyst then reorders /
broadcasts as stats dictate — the plan is fully declarative). That is
exactly how SPARQL engines over columnar stores execute (property
tables aside), and on the subject-bucketed store a subject-variable
join prunes to co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_POSITIONS = ("subj", "pred", "obj")


def var(name: str):
    """A pattern variable (mirrors rdfa.bgp.v)."""
    return ("var", name)


def _pattern_df(triples: DataFrame, s_p_o) -> DataFrame:
    proj, filters, seen = [], [], {}
    for pos, term in zip(_POSITIONS, s_p_o):
        col = F.col(pos)
        if isinstance(term, tuple) and term[0] == "var":
            name = term[1]
            if name in seen:
                # same variable twice in one pattern → equality
                filters.append(col == F.col(seen[name]))
            else:
                seen[name] = pos
                proj.append(col.alias(name))
        else:
            filters.append(col == F.lit(term))
    part = triples
    for f in filters:
        part = part.filter(f)
    return part.select(*proj).distinct()


def _join_patterns(triples: DataFrame, patterns) -> DataFrame:
    out = None
    for s_p_o in patterns:
        part = _pattern_df(triples, s_p_o)
        if out is None:
            out = part
        else:
            shared = [c for c in part.columns if c in out.columns]
            out = out.join(part, shared) if shared else out.crossJoin(part)
    return out


def bgp_union(triples: DataFrame, groups, select=None) -> DataFrame:
    """SPARQL UNION: solutions of several pattern groups combined.
    Groups must bind the same variables (or pass ``select`` to project
    the common subset); result is DISTINCT across groups."""
    outs = [bgp_select(triples, g, select=select) for g in groups]
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.distinct()


def bgp_select(triples: DataFrame, patterns, select=None,
               filters=None, optional=None, minus=None,
               not_exists=None, order_by=None, limit=None) -> DataFrame:
    """patterns: [(s, p, o)] where each position is a concrete string
    or var('name'). → one column per variable (or ``select``'s subset),
    one row per solution (DISTINCT — set semantics like SPARQL
    SELECT DISTINCT).

    ``filters``: SPARQL FILTER — Column predicates (or SQL strings)
    over the variable columns, applied to the joined solutions.
    ``optional``: SPARQL OPTIONAL — a list of pattern GROUPS; each
    group left-joins the solution set on its shared variables, so its
    variables come back NULL where the group has no match.  Groups may
    only share variables bound by the REQUIRED patterns: a variable
    bound by an earlier OPTIONAL can be NULL, and a NULL join key never
    matches in SQL while SPARQL treats unbound as compatible — rather
    than silently diverge, such a group raises.
    ``minus``: SPARQL MINUS — pattern groups whose solutions REMOVE
    compatible rows (left-anti join on the shared variables).  A group
    sharing no variable is a no-op, per the SPARQL spec (disjoint
    domains are never compatible, so MINUS removes nothing).
    ``not_exists``: SPARQL FILTER NOT EXISTS — like MINUS but a group
    with no shared variable removes EVERY solution when the group has
    any match at all (the spec's divergence between the two negation
    forms).
    ``order_by`` / ``limit``: solution modifiers.  ``order_by`` takes
    column names or Column expressions; with ``limit`` set, Catalyst
    compiles the pair to TakeOrderedAndProject — a per-partition top-k
    plus a driver merge of k·P rows, never a global sort of the
    solution set."""
    if not patterns:
        raise ValueError("empty BGP")
    out = _join_patterns(triples, patterns)
    required_vars = set(out.columns)
    for flt in (filters or ()):
        out = out.filter(flt)
    for group in (optional or ()):
        opt = _join_patterns(triples, group)
        shared = [c for c in opt.columns if c in required_vars]
        extra = [c for c in opt.columns
                 if c in out.columns and c not in required_vars]
        if extra:
            raise ValueError(
                "OPTIONAL group shares variables %s bound only by an "
                "earlier OPTIONAL: NULL keys never match in SQL, which "
                "diverges from SPARQL's unbound-is-compatible semantics"
                % extra)
        if not shared:
            raise ValueError("OPTIONAL group shares no variable "
                             "with the required patterns")
        out = out.join(opt, shared, "left")
    for group in (minus or ()):
        neg = _join_patterns(triples, group)
        shared = [c for c in neg.columns if c in out.columns]
        if shared:
            out = out.join(neg.select(*shared), shared, "left_anti")
        # no shared variables → MINUS removes nothing (SPARQL spec)
    for group in (not_exists or ()):
        neg = _join_patterns(triples, group)
        shared = [c for c in neg.columns if c in out.columns]
        if shared:
            out = out.join(neg.select(*shared), shared, "left_anti")
        else:
            # NOT EXISTS with a disjoint group: any match at all
            # empties the solution set (anti join on a TRUE condition)
            out = out.join(neg.limit(1), F.lit(True), "left_anti")
    if select:
        out = out.select(*select)
    out = out.distinct()
    if order_by:
        out = out.orderBy(*order_by)
    if limit is not None:
        out = out.limit(limit)
    return out


def bgp_ask(triples: DataFrame, patterns, **kwargs) -> bool:
    """SPARQL ASK over the distributed store: does at least one
    solution exist?  LIMIT 1 keeps the scan short-circuiting."""
    return bool(bgp_select(triples, patterns, **kwargs).limit(1).take(1))
