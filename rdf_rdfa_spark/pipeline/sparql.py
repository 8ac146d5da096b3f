"""Textual SPARQL front end for the distributed KG query engine.

Parses a practical SPARQL 1.1 subset and compiles it onto the
declarative operators in :mod:`bgpq` (everything executes as Catalyst
plans — this module only builds ASTs):

  - SELECT [DISTINCT] ?vars|* / ASK / CONSTRUCT {template} (and the
    CONSTRUCT WHERE { } shorthand) /
    DESCRIBE <iri>|?var [WHERE { }] (subject-scoped description)
  - PREFIX declarations, ``a`` → rdf:type
  - basic graph patterns with ``;`` predicate and ``,`` object lists
  - property paths: ``p1/p2``, ``p1|p2``, ``^p``, ``p?``, ``p+``,
    ``p*``, ``!(p1|p2|^q)`` negated property sets (incl. inverse
    members), parentheses
  - ``[ p o ; ... ]`` blank-node property lists (fresh existential
    variables, stripped from SELECT * output)
  - OPTIONAL { }, MINUS { }, FILTER [NOT] EXISTS { },
    ``{ } UNION { }`` (of plain pattern groups)
  - GRAPH <iri> { } / GRAPH ?g { }: scopes patterns to the store's
    ``graph`` column (output vs processor diagnostics, mirroring the
    reference's rdfagraph routing, reader.rb:311-317,459-466)
  - FILTER expressions over bound variables (comparisons, &&/||/!,
    REGEX → RLIKE, STRLEN/CONTAINS/STRSTARTS/STRENDS/UCASE/LCASE/STR,
    BOUND/IF/COALESCE/CONCAT/SUBSTR/REPLACE)
  - BIND(expr AS ?v), VALUES ?v { ... } / VALUES (?a ?b) { (..) .. }
    with UNDEF cells (per-row defined-column mask join semantics)
  - GROUP BY + COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT aggregates
    (DISTINCT inside the call; GROUP_CONCAT(?v; SEPARATOR="...");
    expression arguments like SUM(STRLEN(?l))) in the SELECT clause,
    HAVING over aggregate expressions
  - subqueries: { SELECT ... } groups, compiled bottom-up and joined
    with the enclosing group on shared variables
  - ORDER BY ?v / ASC|DESC(expression), LIMIT n, OFFSET n (either
    order)
  - UPDATE (separate entry point :func:`sparql_update`, functional —
    returns the updated DataFrame): INSERT DATA / DELETE DATA /
    DELETE WHERE / DELETE {} INSERT {} WHERE {}

Deliberate scope notes: untagged literals match the store's obj
column on LEXICAL form; "lit"@lang / "lit"^^dt constants and the
LANG()/DATATYPE()/isIRI() FILTER functions additionally match the
store's lang/datatype/obj_kind columns.  Solution semantics
are SELECT DISTINCT (the engine's set-semantics contract).  The
reference ecosystem evaluates full SPARQL through the sparql gem
(suite_spec.rb:51-53); this subset covers the query shapes its own
harness exercises (BGP + negation + paths + modifiers + ASK).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .bgpq import (
    Path,
    alt,
    negated,
    bgp_aggregate,
    bgp_construct,
    bgp_select,
    bgp_union,
    inv,
    lit,
    one_or_more,
    seq,
    var,
    zero_or_more,
    zero_or_one,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><[^<>\s]*>)
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<langdt>@[A-Za-z][A-Za-z0-9-]*|\^\^)
  | (?P<number>[+-]?\d+(?:\.\d+)?)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*)?:(?P<plocal>[A-Za-z0-9_.-]*)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|!=|&&|\|\||[{}().;,|/^+*?=<>!\[\]])
""", re.X)


_ECHARS = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f"}


def _echar(m: re.Match) -> str:
    """SPARQL ECHAR unescape: \\n is a newline (not the letter n);
    \\\\ / \\" / \\' map to themselves."""
    return _ECHARS.get(m.group(1), m.group(1))


def _sql_str(val: str) -> str:
    """Embed a literal string into Spark SQL text: backslashes must be
    doubled BEFORE quote-escaping (Spark interprets backslash escapes
    in string literals — an unescaped trailing backslash would eat the
    closing quote)."""
    return "'%s'" % val.replace("\\", "\\\\").replace("'", "\\'")


def _tokenize(text: str):
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SparqlSyntaxError(
                "cannot tokenize at %r" % text[pos:pos + 24])
        pos = m.end()
        if m.group("ws"):
            continue
        if m.group("iri"):
            out.append(("iri", m.group("iri")[1:-1]))
        elif m.group("var"):
            out.append(("var", m.group("var")[1:]))
        elif m.group("string"):
            raw = m.group("string")[1:-1]
            out.append(("string", re.sub(r"\\(.)", _echar, raw)))
        elif m.group("langdt"):
            out.append(("langdt", m.group("langdt")))
        elif m.group("number"):
            out.append(("number", m.group("number")))
        elif m.group("plocal") is not None and m.group("word") is None \
                and m.group("op") is None and m.group("number") is None:
            out.append(("pname", ((m.group("pname") or ""),
                                  m.group("plocal"))))
        elif m.group("word"):
            out.append(("word", m.group("word")))
        elif m.group("op"):
            out.append(("op", m.group("op")))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._anon = 0  # fresh [] blank-node variable counter
        # non-None while parsing a HAVING expression: collects the
        # aggregate calls it mentions as (placeholder, (fn, arg))
        self._having_aggs: list | None = None

    # -- token helpers ----------------------------------------------
    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_word(self, *words):
        t = self.peek()
        return t[0] == "word" and t[1].upper() in words

    def eat_word(self, *words):
        if not self.at_word(*words):
            raise SparqlSyntaxError(
                "expected %s, got %r" % ("/".join(words), self.peek()[1]))
        return self.next()[1].upper()

    def at_op(self, op):
        t = self.peek()
        return t[0] == "op" and t[1] == op

    def eat_op(self, op):
        if not self.at_op(op):
            raise SparqlSyntaxError(
                "expected %r, got %r" % (op, self.peek()[1]))
        self.next()

    # -- prologue ----------------------------------------------------
    def parse_prologue(self):
        while self.at_word("PREFIX"):
            self.next()
            kind, val = self.next()
            if kind != "pname" or val[1]:
                raise SparqlSyntaxError("bad PREFIX declaration")
            kind2, iri_v = self.next()
            if kind2 != "iri":
                raise SparqlSyntaxError("PREFIX needs an <iri>")
            self.prefixes[val[0]] = iri_v

    # -- terms -------------------------------------------------------
    def _pname_iri(self, pfx_local):
        pfx, local = pfx_local
        if pfx not in self.prefixes:
            raise SparqlSyntaxError("undeclared prefix %r" % pfx)
        return self.prefixes[pfx] + local

    def parse_term(self):
        kind, val = self.peek()
        if kind == "var":
            self.next()
            return var(val)
        if kind == "iri":
            self.next()
            return val
        if kind == "pname":
            self.next()
            return self._pname_iri(val)
        if kind == "string":
            self.next()
            # tagged literals match lexical form + the store's
            # lang/datatype metadata columns (bgpq.lit)
            if self.peek()[0] == "langdt":
                t = self.next()
                if t[1] == "^^":
                    dk, dv = self.next()
                    if dk == "iri":
                        dt = dv
                    elif dk == "pname":
                        dt = self._pname_iri(dv)
                    else:
                        raise SparqlSyntaxError("^^ needs a datatype iri")
                    return lit(val, None, dt)
                return lit(val, t[1][1:], None)  # @lang
            return val
        if kind == "number":
            self.next()
            return val
        if kind == "word" and val == "a":
            self.next()
            return RDF_TYPE
        if kind == "word" and val.lower() in ("true", "false"):
            self.next()
            return val.lower()
        raise SparqlSyntaxError("expected term, got %r" % val)

    # -- property paths ---------------------------------------------
    def parse_path(self):
        left = self._path_seq()
        parts = [left]
        while self.at_op("|"):
            self.next()
            parts.append(self._path_seq())
        return alt(*parts) if len(parts) > 1 else left

    def _path_seq(self):
        parts = [self._path_unary()]
        while self.at_op("/"):
            self.next()
            parts.append(self._path_unary())
        return seq(*parts) if len(parts) > 1 else parts[0]

    def _path_unary(self):
        if self.at_op("^"):
            self.next()
            return inv(self._path_unary())
        if self.at_op("!"):
            self.next()
            return self._path_negated()
        p = self._path_primary()
        if self.at_op("+"):
            self.next()
            return one_or_more(p)
        if self.at_op("*"):
            self.next()
            return zero_or_more(p)
        if self.at_op("?"):
            self.next()
            return zero_or_one(p)
        return p

    def _path_negated(self):
        members = []
        if self.at_op("("):
            self.next()
            while True:
                members.append(self._neg_member())
                if self.at_op("|"):
                    self.next()
                    continue
                break
            self.eat_op(")")
        else:
            members.append(self._neg_member())
        fwd = [m for m, is_inv in members if not is_inv]
        invs = [m for m, is_inv in members if is_inv]
        return negated(*fwd, inverse=tuple(invs))

    def _neg_member(self):
        is_inv = False
        if self.at_op("^"):
            self.next()
            is_inv = True
        k, v = self.peek()
        if k == "iri":
            self.next()
            return v, is_inv
        if k == "pname":
            self.next()
            return self._pname_iri(v), is_inv
        if k == "word" and v == "a":
            self.next()
            return RDF_TYPE, is_inv
        raise SparqlSyntaxError(
            "negated property set member must be a (possibly "
            "^-inverted) predicate IRI")

    def _path_primary(self):
        kind, val = self.peek()
        if kind == "op" and val == "(":
            self.next()
            p = self.parse_path()
            self.eat_op(")")
            return p
        if kind == "iri":
            self.next()
            return val
        if kind == "pname":
            self.next()
            return self._pname_iri(val)
        if kind == "word" and val == "a":
            self.next()
            return RDF_TYPE
        raise SparqlSyntaxError("expected path, got %r" % val)

    def _parse_predicate(self):
        # a var predicate is a term; anything else parses as a path
        if self.peek()[0] == "var":
            return self.parse_term()
        return self.parse_path()

    # -- triples block ----------------------------------------------
    def _bnode_pattern(self, patterns):
        """[ p o ; ... ] → a fresh anonymous variable (existential;
        stripped from SELECT * output) plus its nested patterns."""
        self.eat_op("[")
        self._anon += 1
        v = var("_anon%d" % self._anon)
        if not self.at_op("]"):
            while True:
                pr = self._parse_predicate()
                while True:
                    o = self._parse_object(patterns)
                    patterns.append((v, pr, o))
                    if self.at_op(","):
                        self.next()
                        continue
                    break
                if self.at_op(";"):
                    self.next()
                    if self.at_op("]"):
                        break
                    continue
                break
        self.eat_op("]")
        return v

    def _parse_object(self, patterns):
        if self.at_op("["):
            return self._bnode_pattern(patterns)
        return self.parse_term()

    def parse_triples(self, patterns):
        if self.at_op("["):
            s = self._bnode_pattern(patterns)
            # a bare [ p o ] . statement carries no outer predicates
            if self.at_op("."):
                self.next()
                return
            if self.at_op("}"):
                return
        else:
            s = self.parse_term()
        while True:
            p = self._parse_predicate()
            while True:
                o = self._parse_object(patterns)
                patterns.append((s, p, o))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.at_op("}"):  # dangling ;
                    break
                continue
            break
        if self.at_op("."):
            self.next()

    # -- group -------------------------------------------------------
    def parse_group(self):
        """→ dict(patterns, optional, minus, not_exists, exists,
        filters, bind, values, union)"""
        self.eat_op("{")
        g = {"patterns": [], "optional": [], "minus": [],
             "not_exists": [], "exists": [], "filters": [],
             "bind": {}, "values": None, "union": None,
             "subqueries": []}
        while not self.at_op("}"):
            if self.at_op("{") and self.peek(1)[0] == "word" \
                    and self.peek(1)[1].upper() == "SELECT":
                # subquery: { SELECT ... } — compiled bottom-up and
                # joined with the enclosing group on shared variables
                self.next()
                g["subqueries"].append(self._parse_select(top=False))
                self.eat_op("}")
            elif self.at_op("{"):
                # UNION of plain groups
                sub = [self.parse_group()]
                while self.at_word("UNION"):
                    self.next()
                    sub.append(self.parse_group())
                if len(sub) < 2:
                    raise SparqlSyntaxError("bare nested group "
                                            "(only UNION supported)")
                for s_ in sub:
                    if any(s_[k] for k in
                           ("optional", "minus", "not_exists", "exists",
                            "filters", "bind", "subqueries")) \
                            or s_["values"]:
                        raise SparqlSyntaxError(
                            "UNION arms must be plain pattern groups")
                g["union"] = [s_["patterns"] for s_ in sub]
            elif self.at_word("GRAPH"):
                self.next()
                kind, val = self.peek()
                if kind == "var":
                    self.next()
                    gterm = var(val)
                elif kind == "iri":
                    self.next()
                    gterm = val
                elif kind == "pname":
                    self.next()
                    gterm = self._pname_iri(val)
                else:
                    raise SparqlSyntaxError(
                        "GRAPH needs an <iri>, prefixed name, or ?var")
                sub = self.parse_group()
                if (sub["union"] is not None or sub["bind"]
                        or sub["values"] or sub["subqueries"]
                        or any(sub[k] for k in
                               ("optional", "minus", "not_exists",
                                "exists"))):
                    raise SparqlSyntaxError(
                        "GRAPH group supports only triple patterns "
                        "and FILTER expressions")
                if sub["filters"]:
                    # graph-group patterns hoist into the outer group
                    # (conjunctive), so a filter over THEIR variables
                    # hoists equivalently; the GRAPH ?var itself is in
                    # scope too (it's attached to the patterns below,
                    # after this validation runs)
                    gvars = ([gterm[1]]
                             if isinstance(gterm, tuple) else ())
                    _validate_filter_scope(sub["filters"],
                                           sub["patterns"], "GRAPH",
                                           extra_vars=gvars)
                    g["filters"].extend(sub["filters"])
                for pat in sub["patterns"]:
                    if len(pat) == 4:
                        raise SparqlSyntaxError(
                            "nested GRAPH groups are not supported")
                    g["patterns"].append((pat[0], pat[1], pat[2], gterm))
            elif self.at_word("OPTIONAL"):
                self.next()
                g["optional"].append(self._sub_group("OPTIONAL"))
            elif self.at_word("MINUS"):
                self.next()
                g["minus"].append(self._sub_group("MINUS"))
            elif self.at_word("FILTER"):
                self.next()
                if self.at_word("NOT"):
                    self.next()
                    self.eat_word("EXISTS")
                    g["not_exists"].append(
                        self._sub_group("FILTER NOT EXISTS"))
                elif self.at_word("EXISTS"):
                    self.next()
                    g["exists"].append(self._sub_group("FILTER EXISTS"))
                else:
                    g["filters"].append(self.parse_expr_sql())
            elif self.at_word("BIND"):
                self.next()
                self.eat_op("(")
                expr = self.parse_expr_sql(stop_at_as=True)
                self.eat_word("AS")
                kind, name = self.next()
                if kind != "var":
                    raise SparqlSyntaxError("BIND needs AS ?var")
                self.eat_op(")")
                g["bind"][name] = expr
            elif self.at_word("VALUES"):
                self.next()
                g["values"] = self._parse_values()
            else:
                self.parse_triples(g["patterns"])
        self.eat_op("}")
        return g

    def _sub_group(self, kw: str):
        """An OPTIONAL / MINUS / FILTER [NOT] EXISTS operand group:
        triple patterns plus group-scoped FILTER expressions.  Any
        other feature nested inside (BIND, VALUES, UNION, nested
        OPTIONAL/MINUS/EXISTS) raises rather than being silently
        dropped.  Group filters may reference only the group's OWN
        variables — filtering the group before it joins the outer
        solutions is only equivalent under that scope, so references
        to outer variables raise too."""
        sub = self.parse_group()
        if (sub["union"] is not None or sub["bind"] or sub["values"]
                or sub["subqueries"]
                or any(sub[k] for k in
                       ("optional", "minus", "not_exists", "exists"))):
            raise SparqlSyntaxError(
                "%s group supports only triple patterns and FILTER "
                "expressions over the group's own variables" % kw)
        if not sub["filters"]:
            return sub["patterns"]
        _validate_filter_scope(sub["filters"], sub["patterns"], kw)
        return {"patterns": sub["patterns"], "filters": sub["filters"]}

    def _parse_values(self):
        names = []
        if self.at_op("("):
            self.next()
            while self.peek()[0] == "var":
                names.append(self.next()[1])
            self.eat_op(")")
        else:
            kind, name = self.next()
            if kind != "var":
                raise SparqlSyntaxError("VALUES needs ?vars")
            names = [name]
        rows = []
        self.eat_op("{")
        while not self.at_op("}"):
            if self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    if self.at_word("UNDEF"):
                        self.next()
                        row.append(None)
                    else:
                        row.append(self.parse_term())
                self.eat_op(")")
                rows.append(tuple(row))
            elif self.at_word("UNDEF"):
                self.next()
                rows.append((None,))
            else:
                rows.append((self.parse_term(),))
        self.eat_op("}")
        return (names, rows)

    # -- FILTER / BIND expressions → Spark SQL ----------------------
    _FN_MAP = {"STRLEN": "length", "CONTAINS": "contains",
               "STRSTARTS": "startswith", "STRENDS": "endswith",
               "UCASE": "upper", "LCASE": "lower", "ABS": "abs",
               "ROUND": "round", "CEIL": "ceil", "FLOOR": "floor",
               "COALESCE": "coalesce", "CONCAT": "concat",
               "SUBSTR": "substring", "IF": "if",
               # SPARQL REPLACE is regex-based (flags unsupported)
               "REPLACE": "regexp_replace"}

    def parse_expr_sql(self, stop_at_as: bool = False,
                       stop_at_semi: bool = False) -> str:
        """Translate a parenthesized-or-simple SPARQL expression to a
        Spark SQL string, token by token.  Balanced-paren scan; stops
        at the enclosing ')' (or the AS keyword inside BIND, or a
        depth-0 ';' inside an aggregate argument list)."""
        parts = []
        depth = 0
        outer = False
        if not stop_at_as and not stop_at_semi and self.at_op("("):
            self.next()
            outer = True
        while True:
            kind, val = self.peek()
            if kind == "eof":
                raise SparqlSyntaxError("unterminated expression")
            if stop_at_as and depth == 0 and kind == "word" \
                    and val.upper() == "AS":
                break
            if stop_at_semi and depth == 0 and kind == "op" \
                    and val == ";":
                break
            if kind == "op" and val == "(":
                depth += 1
                parts.append("(")
                self.next()
                continue
            if kind == "op" and val == ")":
                if depth == 0:
                    if outer:
                        self.next()  # the FILTER's own closing paren
                    break
                depth -= 1
                parts.append(")")
                self.next()
                continue
            self.next()
            if kind == "var":
                parts.append("`%s`" % val)
            elif kind == "string":
                parts.append(_sql_str(val))
            elif kind == "number":
                parts.append(val)
            elif kind == "iri":
                parts.append(_sql_str(val))
            elif kind == "pname":
                parts.append(_sql_str(self._pname_iri(val)))
            elif kind == "op":
                parts.append({"&&": "AND", "||": "OR", "!": "NOT ",
                              "=": "="}.get(val, val))
            elif kind == "word":
                up = val.upper()
                if up == "REGEX":
                    # REGEX(x, pat[, flags]) → x RLIKE pat (flags: i)
                    self.eat_op("(")
                    target = self.parse_expr_sql(stop_at_as=False) \
                        if self.at_op("(") else self._simple_operand()
                    self.eat_op(",")
                    pk, pv = self.next()
                    if pk != "string":
                        raise SparqlSyntaxError("REGEX needs a pattern")
                    flags = ""
                    if self.at_op(","):
                        self.next()
                        fk, fv = self.next()
                        if fk == "string" and "i" in fv:
                            flags = "(?i)"
                    self.eat_op(")")
                    parts.append("%s RLIKE %s" % (
                        target, _sql_str(flags + pv)))
                elif up == "STR":
                    self.eat_op("(")
                    parts.append(self._simple_operand())
                    self.eat_op(")")
                elif up == "BOUND":
                    self.eat_op("(")
                    kb, vb = self.next()
                    if kb != "var":
                        raise SparqlSyntaxError("BOUND needs a ?var")
                    self.eat_op(")")
                    parts.append("(`%s` IS NOT NULL)" % vb)
                elif up in ("LANG", "DATATYPE", "ISIRI", "ISURI",
                            "ISLITERAL", "ISBLANK"):
                    # term metadata: the engine threads the store's
                    # lang/datatype/obj_kind columns alongside
                    # object-bound variables (bgpq._META_SRC)
                    self.eat_op("(")
                    kind2, v2 = self.next()
                    if kind2 != "var":
                        raise SparqlSyntaxError("%s needs a ?var" % up)
                    self.eat_op(")")
                    if up == "LANG":
                        parts.append("COALESCE(`%s__lang`, '')" % v2)
                    elif up == "DATATYPE":
                        parts.append(
                            "COALESCE(`%s__dt`, 'http://www.w3.org/"
                            "2001/XMLSchema#string')" % v2)
                    else:
                        kindval = {"ISIRI": "iri", "ISURI": "iri",
                                   "ISLITERAL": "literal",
                                   "ISBLANK": "bnode"}[up]
                        parts.append("(`%s__kind` = '%s')" % (v2, kindval))
                elif up in _AGG_WORDS and self._having_aggs is not None:
                    # aggregate call inside HAVING: lower to a
                    # placeholder column the compiler computes (or
                    # aliases to the matching SELECT aggregate)
                    self.eat_op("(")
                    if self.at_op("*"):
                        self.next()
                        arg = "*"
                    else:
                        k2, arg = self.next()
                        if k2 != "var":
                            raise SparqlSyntaxError(
                                "aggregate needs ?var or *")
                    self.eat_op(")")
                    ph = "__h%d" % len(self._having_aggs)
                    self._having_aggs.append((ph, (up, arg)))
                    parts.append("`%s`" % ph)
                elif up in self._FN_MAP:
                    parts.append(self._FN_MAP[up])
                elif up in ("TRUE", "FALSE", "AND", "OR", "NOT", "IN"):
                    parts.append(up)
                else:
                    raise SparqlSyntaxError(
                        "unsupported function %r" % val)
        return " ".join(parts)

    def _simple_operand(self) -> str:
        kind, val = self.next()
        if kind == "var":
            return "`%s`" % val
        if kind == "string":
            return _sql_str(val)
        if kind == "number":
            return val
        raise SparqlSyntaxError("expected simple operand, got %r" % val)

    # -- query forms -------------------------------------------------
    def parse_query(self):
        self.parse_prologue()
        if self.at_word("SELECT"):
            return self._parse_select()
        if self.at_word("ASK"):
            self.next()
            q = {"form": "ask", "group": self.parse_group()}
            if self.peek()[0] != "eof":
                raise SparqlSyntaxError(
                    "trailing tokens after ASK group at %r"
                    % (self.peek()[1],))
            return q
        if self.at_word("DESCRIBE"):
            self.next()
            targets = []
            while True:
                k, v = self.peek()
                if k == "var":
                    self.next()
                    targets.append(var(v))
                elif k == "iri":
                    self.next()
                    targets.append(v)
                elif k == "pname":
                    self.next()
                    targets.append(self._pname_iri(v))
                else:
                    break
            if not targets:
                raise SparqlSyntaxError("DESCRIBE needs ?vars or <iri>s")
            q = {"form": "describe", "targets": targets, "group": None}
            if self.at_word("WHERE"):
                self.next()
                q["group"] = self.parse_group()
            if self.peek()[0] != "eof":
                raise SparqlSyntaxError(
                    "trailing tokens after DESCRIBE at %r"
                    % (self.peek()[1],))
            return q
        if self.at_word("CONSTRUCT"):
            self.next()
            if self.at_word("WHERE"):
                # CONSTRUCT WHERE { ... } shorthand: the pattern group
                # doubles as the template (plain triple patterns only)
                self.next()
                g = self.parse_group()
                for pat in g["patterns"]:
                    if len(pat) == 4 or isinstance(pat[1], Path):
                        raise SparqlSyntaxError(
                            "CONSTRUCT WHERE supports plain triple "
                            "patterns (no GRAPH scoping or paths)")
                q = {"form": "construct", "template": g["patterns"],
                     "group": g}
                self._parse_modifiers(q)
                return q
            tmpl_group: list = []
            self.eat_op("{")
            while not self.at_op("}"):
                self.parse_triples(tmpl_group)
            self.eat_op("}")
            self.eat_word("WHERE")
            q = {"form": "construct", "template": tmpl_group,
                 "group": self.parse_group()}
            self._parse_modifiers(q)
            return q
        raise SparqlSyntaxError("expected SELECT/ASK/CONSTRUCT")

    def _parse_select(self, top: bool = True):
        self.eat_word("SELECT")
        q = {"form": "select", "distinct": False, "vars": None,
             "aggs": {}, "group_by": []}
        if self.at_word("DISTINCT"):
            self.next()
            q["distinct"] = True
        if self.at_op("*"):
            self.next()
        else:
            names = []
            while True:
                if self.peek()[0] == "var":
                    names.append(self.next()[1])
                elif self.at_op("("):
                    self.next()
                    fn = self.eat_word("COUNT", "SUM", "MIN", "MAX",
                                       "AVG", "SAMPLE", "GROUP_CONCAT")
                    self.eat_op("(")
                    distinct = False
                    if self.at_word("DISTINCT"):
                        self.next()
                        distinct = True
                    if self.at_op("*"):
                        self.next()
                        arg = "*"
                    elif (self.peek()[0] == "var"
                          and self.peek(1) in (("op", ")"),
                                               ("op", ";"))):
                        arg = self.next()[1]
                    else:
                        # full expression argument: SUM(?x * 2) etc.
                        arg = ("expr", self.parse_expr_sql(
                            stop_at_semi=True))
                    sep = " "
                    if self.at_op(";"):  # GROUP_CONCAT(?v; SEPARATOR="-")
                        self.next()
                        self.eat_word("SEPARATOR")
                        self.eat_op("=")
                        kind, sep = self.next()
                        if kind != "string":
                            raise SparqlSyntaxError(
                                "SEPARATOR needs a string")
                    self.eat_op(")")
                    self.eat_word("AS")
                    kind, out = self.next()
                    if kind != "var":
                        raise SparqlSyntaxError("aggregate needs AS ?var")
                    self.eat_op(")")
                    q["aggs"][out] = (fn, arg, distinct,
                                      sep if fn == "GROUP_CONCAT" else None)
                else:
                    break
            q["vars"] = names or None
        self.eat_word("WHERE")
        q["group"] = self.parse_group()
        self._parse_modifiers(q, expect_eof=top)
        return q

    def _parse_modifiers(self, q, expect_eof: bool = True):
        q.setdefault("group_by", [])
        q.setdefault("having", None)
        if self.at_word("GROUP"):
            self.next()
            self.eat_word("BY")
            while self.peek()[0] == "var":
                q["group_by"].append(self.next()[1])
        if self.at_word("HAVING"):
            self.next()
            self._having_aggs = []
            try:
                expr = self.parse_expr_sql()
            finally:
                aggs, self._having_aggs = self._having_aggs, None
            q["having"] = (expr, aggs)
        order = []
        if self.at_word("ORDER"):
            self.next()
            self.eat_word("BY")
            while True:
                if self.at_word("ASC", "DESC"):
                    d = self.next()[1].upper()
                    # full expression key: ASC(STRLEN(?l)) etc.
                    expr = self.parse_expr_sql()
                    order.append((expr, d == "DESC"))
                elif self.peek()[0] == "var":
                    order.append(("`%s`" % self.next()[1], False))
                else:
                    break
        q["order"] = order
        q["limit"] = None
        q["offset"] = 0
        # LimitOffsetClauses: either order, each at most once
        seen_mods = set()
        while self.at_word("LIMIT", "OFFSET"):
            word = self.next()[1].upper()
            if word in seen_mods:
                raise SparqlSyntaxError("duplicate %s clause" % word)
            seen_mods.add(word)
            kind, n = self.next()
            if kind != "number":
                raise SparqlSyntaxError("%s needs a number" % word)
            q["limit" if word == "LIMIT" else "offset"] = int(n)
        if expect_eof and self.peek()[0] != "eof":
            raise SparqlSyntaxError(
                "trailing tokens at %r" % (self.peek()[1],))


_AGG_FNS = {"COUNT": F.count, "SUM": F.sum, "MIN": F.min,
            "MAX": F.max, "AVG": F.avg}
_AGG_WORDS = tuple(_AGG_FNS)


def _agg_col(fn: str, arg, distinct: bool = False,
             sep: str | None = None):
    """A parsed SPARQL aggregate → Spark Column.  ``arg`` is "*", a
    bare variable name, or ("expr", sql) for an expression argument.
    Aggregates run over the engine's DISTINCT solution set; DISTINCT
    inside the call additionally dedups the argument's bindings."""
    if arg == "*":
        if fn != "COUNT":
            raise SparqlSyntaxError("%s(*) is not valid SPARQL" % fn)
        return F.count("*")
    arg_sql = (arg[1] if isinstance(arg, tuple) else "`%s`" % arg)
    d = "DISTINCT " if distinct else ""
    if fn == "SAMPLE":
        # the spec allows ANY binding; the minimum makes the choice
        # deterministic (reproducible runs, value-oracle friendly)
        return F.expr("min(%s)" % arg_sql)
    if fn == "GROUP_CONCAT":
        coll = "collect_set" if distinct else "collect_list"
        # sorted join: SPARQL leaves the order implementation-defined,
        # a canonical order keeps results partitioning-independent
        return F.expr("array_join(sort_array(%s(%s)), %s)"
                      % (coll, arg_sql,
                         _sql_str(sep if sep is not None else " ")))
    return F.expr("%s(%s%s)" % (fn.lower(), d, arg_sql))

# backticked identifiers as parse_expr_sql emits them — the compiled
# SQL is scanned (rather than the parser threading state) to validate
# variable scope before Spark would raise an opaque unresolved-column
# AnalysisException
_IDENT_RE = re.compile(r"`([^`]+)`")
# single-quoted SQL string literals as _sql_str emits them (backslash
# escapes active) — stripped before the identifier scan so a backtick
# INSIDE a string constant is never misread as a variable reference
_SQL_STR_RE = re.compile(r"'(?:[^'\\]|\\.)*'")
_META_SFX = ("__lang", "__dt", "__kind")


def _idents(sql: str):
    return _IDENT_RE.findall(_SQL_STR_RE.sub("''", sql))


def _pattern_var_info(patterns):
    """→ (all_vars, meta_vars): every variable the patterns bind, and
    the subset bound in OBJECT position by a plain (non-path) triple
    pattern — only those carry the lang/datatype/obj_kind term
    metadata that LANG()/DATATYPE()/isIRI() read."""
    all_vars: set = set()
    meta_vars: set = set()
    for pat in patterns:
        p = pat[1]
        for pos, t in zip("spog", pat):
            if isinstance(t, tuple) and t[0] == "var":
                all_vars.add(t[1])
                if pos == "o" and not isinstance(p, Path):
                    meta_vars.add(t[1])
    return all_vars, meta_vars


def _validate_filter_scope(filters, patterns, where, extra_vars=(),
                           have_meta=True):
    """Raise SparqlSyntaxError when a compiled FILTER/BIND expression
    references a variable the given patterns don't bind, or a term-
    metadata function on a variable without metadata (bound by a
    property path, in subject/predicate position, or over a store
    without lang/datatype/obj_kind columns)."""
    all_vars, meta_vars = _pattern_var_info(patterns)
    all_vars |= set(extra_vars)
    for sql in filters:
        for ident in _idents(sql):
            base = None
            for sfx in _META_SFX:
                if ident.endswith(sfx):
                    base = ident[: -len(sfx)]
                    break
            if base is not None:
                if not have_meta:
                    raise SparqlSyntaxError(
                        "LANG()/DATATYPE()/isIRI()/isLiteral()/"
                        "isBlank() in %s: the store has no lang/"
                        "datatype/obj_kind metadata columns" % where)
                if base not in meta_vars:
                    raise SparqlSyntaxError(
                        "LANG()/DATATYPE()/isIRI()/isLiteral()/"
                        "isBlank() on ?%s in %s: the variable is not "
                        "bound in object position by a plain triple "
                        "pattern (property-path and subject/predicate "
                        "bindings carry no term metadata)"
                        % (base, where))
            elif ident not in all_vars:
                raise SparqlSyntaxError(
                    "expression in %s references ?%s, which is not "
                    "bound by the group's own patterns" % (where, ident))


def _subq_vars(q) -> set:
    """Best-effort set of variables a subquery projects (for scope
    validation of outer FILTERs)."""
    if q["aggs"] or q["group_by"]:
        return set(q["group_by"]) | set(q["aggs"])
    if q.get("vars"):
        return set(q["vars"])
    all_vars, _ = _pattern_var_info(q["group"]["patterns"])
    return all_vars


def _apply_modifiers(out: DataFrame, q) -> DataFrame:
    order = q.get("order") or ()
    if order:
        out = out.orderBy(*[F.expr(v).desc() if d else F.expr(v)
                            for v, d in order])
    if q.get("offset"):
        out = out.offset(q["offset"])
    if q.get("limit") is not None:
        out = out.limit(q["limit"])
    return out


def _group_kwargs(triples: DataFrame, g, store_meta: bool,
                  buckets=None) -> dict:
    """A parsed group dict → bgp_select keyword arguments (subqueries
    compiled recursively, filter/bind scope validated)."""
    subs = [_compile_select(triples, sq, store_meta, buckets=buckets)
            for sq in g["subqueries"]]
    extra = set(g["bind"]) | (set(g["values"][0]) if g["values"]
                              else set())
    for sq in g["subqueries"]:
        extra |= _subq_vars(sq)
    # group-level FILTERs run after the OPTIONAL joins, so optional-
    # bound variables are in scope (BOUND(?m) over OPTIONAL works);
    # BINDs run before them, so only required/VALUES vars for those
    scope = list(g["patterns"])
    for og in g["optional"]:
        scope += og["patterns"] if isinstance(og, dict) else og
    _validate_filter_scope(list(g["filters"]), scope, "WHERE",
                           extra_vars=extra, have_meta=store_meta)
    _validate_filter_scope(list(g["bind"].values()), g["patterns"],
                           "WHERE", extra_vars=extra,
                           have_meta=store_meta)
    return dict(
        filters=[F.expr(e) for e in g["filters"]],
        optional=g["optional"], minus=g["minus"],
        not_exists=g["not_exists"], exists=g["exists"],
        values=g["values"],
        bind={k: F.expr(v) for k, v in g["bind"].items()},
        subselects=subs or None,
        buckets=buckets,
    )


def _compile_select(triples: DataFrame, q, store_meta: bool,
                    buckets=None) -> DataFrame:
    """A SELECT-form query dict (top level or subquery) → DataFrame
    with its own solution modifiers applied."""
    g = q["group"]
    if g["union"] is not None:
        # raise rather than silently drop (same convention as
        # _sub_group): group-level clauses alongside a UNION are not
        # compiled into the union branches
        dropped = [name for name, val in (
            ("patterns", g["patterns"]), ("subqueries", g["subqueries"]),
            ("FILTER", g["filters"]), ("OPTIONAL", g["optional"]),
            ("MINUS", g["minus"]), ("FILTER NOT EXISTS", g["not_exists"]),
            ("FILTER EXISTS", g["exists"]), ("BIND", g["bind"]),
            ("VALUES", g["values"]),
        ) if val]
        if dropped:
            raise SparqlSyntaxError(
                "UNION is supported as the entire SELECT body (group "
                "also carries: %s)" % ", ".join(dropped))
        return _apply_modifiers(
            bgp_union(triples, g["union"], select=q.get("vars")), q)
    kwargs = _group_kwargs(triples, g, store_meta, buckets=buckets)
    order_cols = [F.expr(v).desc() if d else F.expr(v)
                  for v, d in q.get("order", [])]
    if q["aggs"] or q["group_by"] or q.get("having"):
        aggs = {}
        for out_name, spec in q["aggs"].items():
            aggs[out_name] = _agg_col(*spec)
        if not aggs and not q.get("having"):
            # GROUP BY with no aggregates ≡ DISTINCT projection of the
            # grouped variables (the engine is set-semantics already).
            # The SELECT projection still applies: it must be a subset
            # of the GROUP BY variables, and a strict subset needs its
            # own distinct.
            sel = q.get("vars") or q["group_by"]
            bad = [v for v in sel if v not in q["group_by"]]
            if bad:
                raise SparqlSyntaxError(
                    "SELECT ?%s is neither a GROUP BY variable nor an "
                    "aggregate" % bad[0])
            out = bgp_select(triples, g["patterns"],
                             select=q["group_by"], **kwargs)
            if list(sel) != list(q["group_by"]):
                out = out.select(*sel).distinct()
            return _apply_modifiers(out, q)
        hexpr, hidden = None, []
        if q.get("having"):
            hexpr, haggs = q["having"]
            for ph, (fn, arg) in haggs:
                # reuse the SELECT alias when the same PLAIN aggregate
                # is already projected; otherwise a hidden column
                alias = next((n for n, fa in q["aggs"].items()
                              if fa[:2] == (fn, arg) and not fa[2]),
                             None)
                if alias is not None:
                    hexpr = hexpr.replace("`%s`" % ph, "`%s`" % alias)
                else:
                    aggs[ph] = _agg_col(fn, arg)
                    hidden.append(ph)
            for ident in _idents(hexpr):
                if (not ident.startswith("__h")
                        and ident not in q["group_by"]
                        and ident not in q["aggs"]):
                    raise SparqlSyntaxError(
                        "HAVING references ?%s, which is neither a "
                        "GROUP BY variable nor an aggregate" % ident)
        out = bgp_aggregate(triples, g["patterns"],
                            group_by=q["group_by"], aggs=aggs, **kwargs)
        if hexpr:
            out = out.filter(F.expr(hexpr))
        if hidden:
            out = out.drop(*hidden)
        return _apply_modifiers(out, q)
    anons = ()
    if q.get("vars") is None:
        # anon existentials from [] in the required patterns AND in
        # OPTIONAL groups (whose columns join the solution set)
        scope = list(g["patterns"])
        for og in g["optional"]:
            scope += og["patterns"] if isinstance(og, dict) else og
        all_vars, _ = _pattern_var_info(scope)
        anons = sorted(v for v in all_vars if v.startswith("_anon"))
    if anons:
        # [] blank nodes are existentials: strip them from SELECT *
        # output (and re-dedup) BEFORE the solution modifiers apply
        out = bgp_select(triples, g["patterns"], **kwargs)
        out = out.drop(*anons).distinct()
        return _apply_modifiers(out, q)
    if q.get("offset"):
        out = bgp_select(triples, g["patterns"], select=q.get("vars"),
                         order_by=order_cols or None, **kwargs)
        out = out.offset(q["offset"])
        if q.get("limit") is not None:
            out = out.limit(q["limit"])
        return out
    return bgp_select(
        triples, g["patterns"], select=q.get("vars"),
        order_by=order_cols or None, limit=q.get("limit"), **kwargs)


def sparql(triples: DataFrame, query: str, buckets: int | None = None):
    """Execute a SPARQL query (see module docstring for the subset)
    over a (subj, pred, obj) triples DataFrame.  Returns a DataFrame
    for SELECT/CONSTRUCT, bool for ASK.

    ``buckets``: the materialized store's subject-bucketing modulus
    (``materialize.store_buckets(root)``) — constant-subject patterns
    then prune the scan to one bucket PARTITION directory."""
    p = _Parser(query)
    q = p.parse_query()
    g = q["group"]
    store_meta = all(c in triples.columns
                     for c in ("lang", "datatype", "obj_kind"))
    if q["form"] == "select":
        return _compile_select(triples, q, store_meta, buckets=buckets)
    if q["form"] == "describe":
        from .bgpq import bgp_describe

        if g is None:
            return bgp_describe(triples, q["targets"])
        kwargs = _group_kwargs(triples, g, store_meta, buckets=buckets)
        return bgp_describe(triples, q["targets"], g["patterns"],
                            **kwargs)
    if g["union"] is not None:
        raise SparqlSyntaxError(
            "UNION is supported as the entire SELECT body")
    kwargs = _group_kwargs(triples, g, store_meta, buckets=buckets)
    if q["form"] == "ask":
        from .bgpq import bgp_ask

        return bgp_ask(triples, g["patterns"], **kwargs)
    # construct
    return _apply_modifiers(
        bgp_construct(triples, g["patterns"], q["template"], **kwargs), q)


# --- SPARQL 1.1 UPDATE (functional) --------------------------------------
# The store is immutable (snapshot manifests); an update therefore
# RETURNS the updated triples DataFrame — pair with write_triples /
# materialize to commit it as a new snapshot.  Supported forms:
# INSERT DATA { ... } / DELETE DATA { ... } (ground triples),
# DELETE WHERE { patterns }, and [DELETE {tmpl}] [INSERT {tmpl}]
# WHERE { group }.  Deletion matches on lexical (subj, pred, obj)
# across all graphs/urls; inserted rows land in the output graph with
# obj_kind derived from the template term (var-bound objects: NULL).

def _parse_kinded_term(p: _Parser):
    k, v = p.peek()
    if k == "var":
        p.next()
        return var(v), "var"
    if k == "iri":
        p.next()
        return v, "iri"
    if k == "pname":
        p.next()
        return p._pname_iri(v), "iri"
    if k == "word" and v == "a":
        p.next()
        return RDF_TYPE, "iri"
    if k == "string":
        return p.parse_term(), "literal"  # handles @lang/^^dt tags
    if k == "number":
        p.next()
        return v, "literal"
    raise SparqlSyntaxError("expected term in update block, got %r" % (v,))


def _parse_update_block(p: _Parser, allow_vars: bool):
    """{ s p o ; p2 o2 , o3 . ... } → [(term, kind) triples]."""
    out = []
    p.eat_op("{")
    while not p.at_op("}"):
        s, sk = _parse_kinded_term(p)
        if sk == "literal":
            raise SparqlSyntaxError("literal subject in update block")
        while True:
            pr, pk = _parse_kinded_term(p)
            if pk == "literal":
                raise SparqlSyntaxError("literal predicate in update block")
            while True:
                o, ok = _parse_kinded_term(p)
                if not allow_vars and "var" in (sk, pk, ok):
                    raise SparqlSyntaxError(
                        "INSERT DATA / DELETE DATA must be ground")
                out.append(((s, sk), (pr, pk), (o, ok)))
                if p.at_op(","):
                    p.next()
                    continue
                break
            if p.at_op(";"):
                p.next()
                if p.at_op(".") or p.at_op("}"):
                    break
                continue
            break
        if p.at_op("."):
            p.next()
    p.eat_op("}")
    return out


def _kinded_df(triples: DataFrame, kinded, sol: DataFrame | None) -> DataFrame:
    """Instantiate a kinded template into the STORE's schema: one
    select per template triple over the solutions (or a literal row
    for ground data), unioned.  Extra store columns get defaults:
    obj_kind from the template term, tag metadata from tagged
    literals, graph='output', url NULL."""
    cols = triples.columns
    outs = []
    for (s, sk), (pr, pk), (o, ok) in kinded:
        lang = dt = None
        if isinstance(o, tuple) and o and o[0] == "lit":
            _t, o_val, lang, dt = o
            o = o_val
        sel = []
        for col_name in cols:
            if col_name == "subj":
                c = F.col(s[1]) if sk == "var" else F.lit(s)
            elif col_name == "pred":
                c = F.col(pr[1]) if pk == "var" else F.lit(pr)
            elif col_name == "obj":
                c = F.col(o[1]) if ok == "var" else F.lit(o)
            elif col_name == "obj_kind":
                c = (F.lit(None) if ok == "var"
                     else F.lit("literal" if ok == "literal" else "iri"))
            elif col_name == "lang":
                c = F.lit(lang)
            elif col_name == "datatype":
                c = F.lit(dt)
            elif col_name == "graph":
                c = F.lit("output")
            else:  # url and any other provenance column
                c = F.lit(None)
            sel.append(c.cast(triples.schema[col_name].dataType)
                       .alias(col_name))
        base = sol if sol is not None else (
            triples.sparkSession.range(1))
        outs.append(base.select(*sel))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    # unbound (NULL) template vars drop the instantiation, per spec
    for pos in ("subj", "pred", "obj"):
        out = out.filter(F.col(pos).isNotNull())
    return out.distinct()


def sparql_update(triples: DataFrame, update: str,
                  buckets: int | None = None) -> DataFrame:
    """Execute one SPARQL UPDATE operation; returns the updated
    triples DataFrame (functional — commit via materialize).
    ``buckets`` prunes constant-subject WHERE patterns exactly as in
    :func:`sparql` (the deletion anti-join still scans the store)."""
    p = _Parser(update)
    p.parse_prologue()
    ins_kinded = del_kinded = group = None
    if p.at_word("INSERT"):
        p.next()
        if p.at_word("DATA"):
            p.next()
            ins_kinded = _parse_update_block(p, allow_vars=False)
        else:
            ins_kinded = _parse_update_block(p, allow_vars=True)
            p.eat_word("WHERE")
            group = p.parse_group()
    elif p.at_word("DELETE"):
        p.next()
        if p.at_word("DATA"):
            p.next()
            del_kinded = _parse_update_block(p, allow_vars=False)
        elif p.at_word("WHERE"):
            # DELETE WHERE { ... }: the pattern group doubles as the
            # deletion template
            p.next()
            group = p.parse_group()
            del_kinded = []
            for pat in group["patterns"]:
                if len(pat) == 4 or isinstance(pat[1], Path):
                    raise SparqlSyntaxError(
                        "DELETE WHERE supports plain triple patterns")
                del_kinded.append(tuple(
                    (t, "var" if isinstance(t, tuple) and t[0] == "var"
                     else "iri") for t in pat))
        else:
            del_kinded = _parse_update_block(p, allow_vars=True)
            if p.at_word("INSERT"):
                p.next()
                ins_kinded = _parse_update_block(p, allow_vars=True)
            p.eat_word("WHERE")
            group = p.parse_group()
    else:
        raise SparqlSyntaxError("expected INSERT or DELETE")
    if p.peek()[0] != "eof":
        raise SparqlSyntaxError(
            "trailing tokens after update at %r" % (p.peek()[1],))
    store_meta = all(c in triples.columns
                     for c in ("lang", "datatype", "obj_kind"))
    sol = None
    if group is not None:
        kwargs = _group_kwargs(triples, group, store_meta,
                               buckets=buckets)
        sol = bgp_select(triples, group["patterns"], **kwargs)
        if ins_kinded and del_kinded:
            # both templates instantiate from the SAME solution set —
            # materialize it once (lazy barrier, lineage truncated)
            sol = sol.localCheckpoint(eager=False)
    out = triples
    if del_kinded:
        del_df = _kinded_df(triples, del_kinded, sol).select(
            "subj", "pred", "obj")
        out = out.join(del_df, ["subj", "pred", "obj"], "left_anti")
    if ins_kinded:
        ins_df = _kinded_df(triples, ins_kinded, sol)
        # insert only genuinely new (subj, pred, obj): existing rows
        # (with their provenance) stay untouched
        ins_df = ins_df.join(out.select("subj", "pred", "obj"),
                             ["subj", "pred", "obj"], "left_anti")
        out = out.unionByName(ins_df)
    return out
