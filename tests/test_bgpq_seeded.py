"""Seed-restricted property-path evaluation (pipeline/bgpq.py):
a closure path with a CONSTANT endpoint iterates a frontier from the
seed instead of materializing the full closure — work proportional to
the reachable component, never the whole edge relation.  Reference
semantics: SPARQL 1.1 §9.3 (ALP evaluation is defined seed-first);
the reference gem delegates paths to the sparql gem
(suite_spec.rb:51-53)."""

import pytest
from pyspark.sql import functions as F

from rdf_rdfa_spark.pipeline import bgpq
from rdf_rdfa_spark.pipeline.bgpq import (
    alt, bgp_ask, bgp_select, inv, one_or_more, seq, var,
    zero_or_more, zero_or_one)


@pytest.fixture(scope="module")
def two_components(spark):
    """One 3-node chain (a→b→c via p) plus a 60-node dense component
    on the SAME predicate — a seeded query from the chain must never
    touch the dense side."""
    rows = [("a", "p", "b"), ("b", "p", "c")]
    # dense: complete-ish digraph on h0..h59 (i → (i+k) mod 60)
    for i in range(60):
        for k in (1, 2, 3, 7, 11):
            rows.append(("h%d" % i, "p", "h%d" % ((i + k) % 60)))
    rows += [("a", "q", "x"), ("x", "r", "y"), ("c", "q", "z")]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_seeded_plus_bound_subject(spark, two_components):
    got = {r["y"] for r in bgp_select(
        two_components,
        [("a", one_or_more("p"), var("y"))]).collect()}
    assert got == {"b", "c"}
    # the BFS never left the 3-node chain: 2 reachable nodes, and one
    # extra empty round to detect the fixpoint
    assert bgpq.last_seeded_stats["visited_rows"] == 2
    assert bgpq.last_seeded_stats["rounds"] <= 3


def test_seeded_plus_bound_object(spark, two_components):
    # bound OBJECT seeds the inverted path: who reaches c via p+?
    got = {r["x"] for r in bgp_select(
        two_components,
        [(var("x"), one_or_more("p"), "c")]).collect()}
    assert got == {"a", "b"}
    assert bgpq.last_seeded_stats["visited_rows"] == 2


def test_seeded_star_includes_seed_identity(spark, two_components):
    got = {r["y"] for r in bgp_select(
        two_components,
        [("a", zero_or_more("p"), var("y"))]).collect()}
    assert got == {"a", "b", "c"}
    # a term with NO edges still relates to itself over p* (SPARQL
    # zero-length-path semantics for a bound term)
    got = {r["y"] for r in bgp_select(
        two_components,
        [("nowhere", zero_or_more("p"), var("y"))]).collect()}
    assert got == {"nowhere"}


def test_seeded_zero_or_one(spark, two_components):
    got = {r["y"] for r in bgp_select(
        two_components, [("a", zero_or_one("q"), var("y"))]).collect()}
    assert got == {"a", "x"}


def test_seeded_seq_and_alt_and_inv(spark, two_components):
    # seq from a bound subject composes frontier joins step by step
    got = {r["y"] for r in bgp_select(
        two_components, [("a", seq("q", "r"), var("y"))]).collect()}
    assert got == {"y"}
    # alt unions the frontier steps
    got = {r["y"] for r in bgp_select(
        two_components, [("a", alt("p", "q"), var("y"))]).collect()}
    assert got == {"b", "x"}
    # inverse with bound subject: ^p from b = predecessors of b
    got = {r["y"] for r in bgp_select(
        two_components, [("b", inv("p"), var("y"))]).collect()}
    assert got == {"a"}
    # inverse pushed through a closure: b (^p)+ ?y walks backwards
    got = {r["y"] for r in bgp_select(
        two_components,
        [("c", one_or_more(inv("p")), var("y"))]).collect()}
    assert got == {"a", "b"}


def test_seeded_seq_of_closures(spark, two_components):
    # p+ then q: reach {b, c} then q-edges from there → {z}
    got = {r["y"] for r in bgp_select(
        two_components,
        [("a", seq(one_or_more("p"), "q"), var("y"))]).collect()}
    assert got == {"z"}


def test_seeded_both_endpoints_constant_ask(spark, two_components):
    assert bgp_ask(two_components, [("a", one_or_more("p"), "c")])
    assert not bgp_ask(two_components, [("a", one_or_more("p"), "h0")])
    # x p* x is always true for a bound term
    assert bgp_ask(two_components,
                   [("nowhere", zero_or_more("p"), "nowhere")])


def test_seeded_matches_unseeded(spark, two_components):
    """The seeded evaluation agrees with filtering the full closure
    on every constant endpoint of the dense component."""
    full = {(r["x"], r["y"]) for r in bgp_select(
        two_components,
        [(var("x"), one_or_more("p"), var("y"))]).collect()}
    for seed_node in ("a", "h0"):
        seeded = {r["y"] for r in bgp_select(
            two_components,
            [(seed_node, one_or_more("p"), var("y"))]).collect()}
        assert seeded == {o for s, o in full if s == seed_node}


def test_path_rejects_tagged_literal_endpoint(spark, two_components):
    from rdf_rdfa_spark.pipeline.bgpq import lit

    with pytest.raises(ValueError, match="tagged-literal"):
        bgp_select(two_components,
                   [(var("x"), one_or_more("p"), lit("b", "en", None))])


def test_user_var_with_double_underscore(spark, two_components):
    # ?a__b is an ordinary variable (only the reserved suffixes are
    # metadata); reserved-suffix names raise
    got = {r["a__b"] for r in bgp_select(
        two_components, [("a", "p", var("a__b"))]).collect()}
    assert got == {"b"}
    with pytest.raises(ValueError, match="reserved metadata suffix"):
        bgp_select(two_components, [("a", "p", var("x__lang"))])


def test_group_level_filters(spark, two_components):
    # dict-shaped sub-groups carry group-scoped filters (the SPARQL
    # front end compiles OPTIONAL { ... FILTER ... } to this)
    rows = bgp_select(
        two_components,
        [(var("s"), "q", var("o"))],
        optional=[{"patterns": [(var("o"), "r", var("m"))],
                   "filters": [F.col("m") != "y"]}],
    ).collect()
    by_s = {r["s"]: r["m"] for r in rows}
    assert by_s["a"] is None  # x r y filtered away inside the group
    assert by_s["c"] is None  # z has no r edge at all
    # MINUS with a group filter that matches nothing removes nothing
    rows = bgp_select(
        two_components,
        [(var("s"), "q", var("o"))],
        minus=[{"patterns": [(var("s"), "p", var("t"))],
                "filters": ["t = 'never'"]}],
    ).collect()
    assert {r["s"] for r in rows} == {"a", "c"}


def test_values_seeded_closure(spark, two_components):
    """VALUES fixing one endpoint of a closure path seeds the frontier
    from the literal set — the constant-endpoint optimization
    generalized to bound sets; the BFS never explores the dense
    component."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    rows = bgp_select(
        two_components,
        [(var("x"), one_or_more("p"), var("y"))],
        values=(["x"], [("a",)]),
    ).collect()
    assert {(r["x"], r["y"]) for r in rows} == {("a", "b"), ("a", "c")}
    assert bgpq.last_seeded_stats["visited_rows"] == 2
    # object-side VALUES runs the inverted path
    rows = bgp_select(
        two_components,
        [(var("x"), one_or_more("p"), var("y"))],
        values=(["y"], [("c",)]),
    ).collect()
    assert {(r["x"], r["y"]) for r in rows} == {("a", "c"), ("b", "c")}
    assert bgpq.last_seeded_stats["visited_rows"] == 2
    # multi-value seed set
    rows = bgp_select(
        two_components,
        [(var("x"), one_or_more("p"), var("y"))],
        values=(["x"], [("a",), ("b",)]),
    ).collect()
    assert {(r["x"], r["y"]) for r in rows} == {
        ("a", "b"), ("a", "c"), ("b", "c")}


def test_sparql_values_seeded_path(spark, two_components):
    from rdf_rdfa_spark.pipeline.sparql import sparql

    got = {(r["x"], r["y"]) for r in sparql(two_components, """
        SELECT ?x ?y WHERE {
          ?x <p>+ ?y . VALUES ?x { "a" }
        }""").collect()}
    assert got == {("a", "b"), ("a", "c")}
    assert bgpq.last_seeded_stats["visited_rows"] == 2
