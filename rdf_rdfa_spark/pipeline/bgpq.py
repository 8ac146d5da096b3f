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


def lit(value: str, lang: str | None = None,
        datatype: str | None = None):
    """A TAGGED literal constant for object position: matches the
    lexical form AND the store's lang/datatype metadata columns
    ("chat"@fr / "5"^^xsd:integer).  Plain strings keep matching
    lexically only."""
    return ("lit", value, lang, datatype)


# --- property paths (SPARQL 1.1 §9) -------------------------------------
# A path expression evaluates to a DISTINCT (s, o) edge relation; a
# triple pattern whose predicate position is a Path joins against that
# relation instead of a pred-filtered scan.  Closures (p+ / p*) run as
# iterative DOUBLING — log(diameter) rounds, one shuffle per round,
# lineage truncated per round with a lazy localCheckpoint — the same
# distributed-fixpoint shape as connected_components/entail.

class Path:
    __slots__ = ("op", "parts")

    def __init__(self, op: str, parts):
        self.op = op
        self.parts = parts


def seq(*parts) -> Path:
    """p1/p2/... — sequence path."""
    return Path("seq", parts)


def alt(*parts) -> Path:
    """p1|p2|... — alternative path."""
    return Path("alt", parts)


def inv(part) -> Path:
    """^p — inverse path."""
    return Path("inv", (part,))


def one_or_more(part) -> Path:
    """p+ — transitive closure."""
    return Path("plus", (part,))


def zero_or_more(part) -> Path:
    """p* — reflexive-transitive closure.  The zero-length component
    relates every graph node (distinct subj/obj term) to itself."""
    return Path("star", (part,))


def zero_or_one(part) -> Path:
    """p? — optional single step."""
    return Path("opt", (part,))


def _closure(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    cur = edges.distinct().localCheckpoint(eager=False)
    n = cur.count()
    if n == 0:
        return cur
    for _ in range(max_iters):
        left = cur
        right = (cur.withColumnRenamed("s", "_m")
                 .withColumnRenamed("o", "_o2"))
        step = (left.join(right, left["o"] == right["_m"])
                .select(left["s"], F.col("_o2").alias("o")))
        nxt = cur.unionByName(step).distinct().localCheckpoint(eager=False)
        m = nxt.count()
        if m == n:
            return nxt
        cur, n = nxt, m
    return cur


def _graph_nodes(triples: DataFrame) -> DataFrame:
    return (triples.select(F.col("subj").alias("n"))
            .unionByName(triples.select(F.col("obj").alias("n")))
            .distinct())


def path_edges(triples: DataFrame, path) -> DataFrame:
    """Path expression → DISTINCT (s, o) DataFrame."""
    if isinstance(path, str):
        return (triples.filter(F.col("pred") == path)
                .select(F.col("subj").alias("s"), F.col("obj").alias("o"))
                .distinct())
    if not isinstance(path, Path):
        raise TypeError("not a path: %r" % (path,))
    if path.op == "seq":
        out = None
        for i, part in enumerate(path.parts):
            nxt = path_edges(triples, part)
            if out is None:
                out = nxt
            else:
                mid = (nxt.withColumnRenamed("s", "_m")
                       .withColumnRenamed("o", "_o2"))
                out = (out.join(mid, out["o"] == mid["_m"])
                       .select(out["s"], F.col("_o2").alias("o"))
                       .distinct())
        if out is None:
            raise ValueError("empty seq path")
        return out
    if path.op == "alt":
        outs = [path_edges(triples, p) for p in path.parts]
        out = outs[0]
        for nxt in outs[1:]:
            out = out.unionByName(nxt)
        return out.distinct()
    if path.op == "inv":
        e = path_edges(triples, path.parts[0])
        return e.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if path.op == "plus":
        return _closure(path_edges(triples, path.parts[0]))
    if path.op == "star":
        nodes = _graph_nodes(triples).select(
            F.col("n").alias("s"), F.col("n").alias("o"))
        return (_closure(path_edges(triples, path.parts[0]))
                .unionByName(nodes).distinct())
    if path.op == "opt":
        nodes = _graph_nodes(triples).select(
            F.col("n").alias("s"), F.col("n").alias("o"))
        return path_edges(triples, path.parts[0]).unionByName(
            nodes).distinct()
    raise ValueError("unknown path op %r" % path.op)


# object-term metadata columns (present in the extraction/store
# schema): a variable bound in OBJECT position carries them along as
# <var>__lang / <var>__dt / <var>__kind, so FILTERs can test
# LANG()/DATATYPE()/isIRI().  Metadata never joins (term equality in
# this engine is lexical) and is stripped from final output.
_META_SRC = (("lang", "__lang"), ("datatype", "__dt"),
             ("obj_kind", "__kind"))


def _pattern_df(triples: DataFrame, s_p_o) -> DataFrame:
    s_term, p_term, o_term = s_p_o
    if isinstance(p_term, Path):
        # predicate is a property path: bind the pattern against the
        # path's (s, o) edge relation instead of a pred-filtered scan
        part = path_edges(triples, p_term)
        proj, filters, seen = [], [], {}
        for pos, term in zip(("s", "o"), (s_term, o_term)):
            col = F.col(pos)
            if isinstance(term, tuple) and term[0] == "var":
                name = term[1]
                if name in seen:
                    filters.append(col == F.col(seen[name]))
                else:
                    seen[name] = pos
                    proj.append(col.alias(name))
            else:
                filters.append(col == F.lit(term))
        for f in filters:
            part = part.filter(f)
        return part.select(*proj).distinct()
    proj, filters, seen = [], [], {}
    have_meta = all(src in triples.columns for src, _sfx in _META_SRC)
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
                if pos == "obj" and have_meta:
                    for src, sfx in _META_SRC:
                        proj.append(F.col(src).alias(name + sfx))
        elif isinstance(term, tuple) and term[0] == "lit":
            _tag, value, lang, datatype = term
            if pos != "obj":
                raise ValueError("tagged literal only valid as object")
            if not have_meta:
                raise ValueError(
                    "tagged-literal match needs lang/datatype columns")
            filters.append(col == F.lit(value))
            if lang is not None:
                filters.append(F.col("lang") == lang)
            if datatype is not None:
                filters.append(F.col("datatype") == datatype)
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
            # metadata columns never act as join keys, and the first
            # binding's metadata wins on re-binds
            dup_meta = [c for c in part.columns
                        if "__" in c and c in out.columns]
            if dup_meta:
                part = part.drop(*dup_meta)
            shared = [c for c in part.columns
                      if c in out.columns and "__" not in c]
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
               not_exists=None, exists=None, order_by=None, limit=None,
               values=None, bind=None) -> DataFrame:
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
    solution set.
    ``values``: SPARQL VALUES — ``(var_names, rows)``: an inline
    binding table (broadcast — it is literal data) inner-joined on its
    variables.  ``bind``: SPARQL BIND — dict of new variable name →
    Column expression over the solution columns, applied before
    ``filters`` so FILTER can reference bound variables."""
    if not patterns:
        raise ValueError("empty BGP")
    out = _join_patterns(triples, patterns)
    required_vars = set(out.columns)
    if values is not None:
        names, rows = values
        vdf = triples.sparkSession.createDataFrame(
            [tuple(r) for r in rows], list(names))
        shared = [c for c in vdf.columns if c in out.columns]
        if not shared:
            raise ValueError("VALUES shares no variable with the patterns")
        out = out.join(F.broadcast(vdf), shared)
        required_vars |= set(vdf.columns)
    for name, expr in (bind or {}).items():
        out = out.withColumn(name, expr)
        required_vars.add(name)
    for flt in (filters or ()):
        out = out.filter(flt)
    for group in (optional or ()):
        opt = _join_patterns(triples, group)
        dup_meta = [c for c in opt.columns
                    if "__" in c and c in out.columns]
        if dup_meta:
            opt = opt.drop(*dup_meta)
        shared = [c for c in opt.columns
                  if c in required_vars and "__" not in c]
        extra = [c for c in opt.columns
                 if c in out.columns and c not in required_vars
                 and "__" not in c]
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
        shared = [c for c in neg.columns
                  if c in out.columns and "__" not in c]
        if shared:
            out = out.join(neg.select(*shared), shared, "left_anti")
        # no shared variables → MINUS removes nothing (SPARQL spec)
    for group in (not_exists or ()):
        neg = _join_patterns(triples, group)
        shared = [c for c in neg.columns
                  if c in out.columns and "__" not in c]
        if shared:
            out = out.join(neg.select(*shared), shared, "left_anti")
        else:
            # NOT EXISTS with a disjoint group: any match at all
            # empties the solution set (anti join on a TRUE condition)
            out = out.join(neg.limit(1), F.lit(True), "left_anti")
    for group in (exists or ()):
        pos = _join_patterns(triples, group)
        shared = [c for c in pos.columns
                  if c in out.columns and "__" not in c]
        if shared:
            # FILTER EXISTS: keep solutions with a compatible match
            out = out.join(pos.select(*shared), shared, "left_semi")
        else:
            out = out.join(pos.limit(1), F.lit(True), "left_semi")
    if select:
        out = out.select(*select)
    else:
        # metadata rides along for FILTER/BIND only — never part of
        # the solution (set semantics are over the lexical bindings)
        meta = [c for c in out.columns if "__" in c]
        if meta:
            out = out.drop(*meta)
    out = out.distinct()
    if order_by:
        out = out.orderBy(*order_by)
    if limit is not None:
        out = out.limit(limit)
    return out


def bgp_aggregate(triples: DataFrame, patterns, group_by, aggs,
                  **kwargs) -> DataFrame:
    """SPARQL GROUP BY + aggregates over BGP solutions.  ``group_by``
    is a list of variable names; ``aggs`` maps output column name →
    aggregate Column (e.g. ``{"n": F.count("*")}``).  Aggregates run
    over the DISTINCT solution set (this engine's SELECT DISTINCT
    contract), i.e. SPARQL's ``SELECT (COUNT(DISTINCT ...) ...)``
    family.  The groupBy partial-aggregates map-side, so the shuffle
    carries one row per (group, mapper), not the solutions."""
    sol = bgp_select(triples, patterns, **kwargs)
    return sol.groupBy(*group_by).agg(
        *[expr.alias(name) for name, expr in aggs.items()])


def bgp_construct(triples: DataFrame, patterns, template,
                  **kwargs) -> DataFrame:
    """SPARQL CONSTRUCT: each solution instantiates every template
    triple (s, p, o) — var('name') positions take the solution's
    binding, strings stay constant.  Output is a DISTINCT
    (subj, pred, obj) DataFrame ready for write_triples /
    entailment — KG derivation rules as one declarative plan."""
    sol = bgp_select(triples, patterns, **kwargs)
    outs = []
    for s, p, o in template:
        cols = []
        for pos, term in zip(_POSITIONS, (s, p, o)):
            if isinstance(term, tuple) and term[0] == "var":
                cols.append(F.col(term[1]).alias(pos))
            else:
                cols.append(F.lit(term).alias(pos))
        outs.append(sol.select(*cols))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    # drop solutions with unbound (NULL) template vars, per SPARQL
    for pos in _POSITIONS:
        out = out.filter(F.col(pos).isNotNull())
    return out.distinct()


def bgp_ask(triples: DataFrame, patterns, **kwargs) -> bool:
    """SPARQL ASK over the distributed store: does at least one
    solution exist?  LIMIT 1 keeps the scan short-circuiting."""
    return bool(bgp_select(triples, patterns, **kwargs).limit(1).take(1))
