"""Physical-plan shape assertions — the scale properties the code
comments promise, enforced by CI:

- column pruning reaches the parquet scan (a 2-column projection must
  not read 5 columns),
- filter pushdown reaches the scan (DataFilters),
- no CartesianProduct anywhere in production query plans (broadcast
  nested-loop against a broadcast-small side is allowed; an
  unbroadcast cartesian of two big sides never is),
- the big joins stay broadcast-hash, not sort-merge, where a small
  side exists.

Plan construction only — nothing executes."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# documented brute-force oracle-only paths where a broadcast
# nested-loop cross join is the intended plan
_BNLJ_OK = {"ann_cosine_topk", "emb_near_dup", "ann_ivf_topk",
            "ann_lsh_topk",
            # the A-box predicate is a literal constant, so Catalyst
            # constant-folds it out of the equi-join against the tiny
            # broadcast T-box closure — BNLJ with a pushed condition
            # is the resulting (and fine) physical shape
            "entail_props"}

# queries whose page-synthesis step genuinely consumes every
# documents.parquet column (HTML_EXPR references all five)
_FULL_DOC_OK = {"rdfa_extract", "writer_roundtrip", "kg_degrees",
                "kg_pagerank", "kg_bgp", "kg_bgp_minus", "kg_bgp_agg",
                "kg_sparql", "kg_sparql_meta", "kg_sparql_graph",
                "kg_sparql_sub", "kg_sparql_update",
                "kg_sparql_describe", "rdfa_pred_counts",
                "rdfa_text_identity", "rdfa_processor_counts",
                "host_rollup", "entity_link_sameas", "stream_extract",
                "dedup_clusters"}

_DOC_FULL = {"doc_id", "text", "lang", "source", "n_chars"}


def _all_query_names():
    import __spark_entry__ as E
    return sorted(E.queries())


def _scans(plan: str):
    import re as _re
    for ln in plan.splitlines():
        m = _re.search(r"FileScan parquet \[([^\]]*)\].*?/(\w+)\.parquet", ln)
        if m:
            cols = {c.split("#")[0] for c in m.group(1).split(",") if c.strip()}
            yield m.group(2), cols


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as E
    return E


def _plan(spark, entry, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", _all_query_names())
def test_plan_shape(spark, entry, name):
    """Per-query physical-plan contract: no unbroadcast cartesian, a
    nested-loop join only where the documented broadcast-small cross
    join is the intended plan, and column pruning reaching every
    parquet scan (full-width documents reads only for the page
    synthesizer that needs all five columns)."""
    plan = _plan(spark, entry, name)
    assert "CartesianProduct" not in plan, name
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_OK, \
            "%s: unexpected BroadcastNestedLoopJoin:\n%s" % (name, plan)
        assert "BroadcastExchange" in plan, \
            "%s: nested-loop join without a broadcast side" % name
    for table, cols in _scans(plan):
        if table == "documents" and name not in _FULL_DOC_OK:
            assert cols < _DOC_FULL, \
                "%s: unpruned documents scan reads %s" % (name, sorted(cols))
        elif table == "embeddings":
            assert cols <= {"vec_id", "embedding"}, \
                "%s: embeddings scan reads %s" % (name, sorted(cols))
        elif table == "events":
            assert "event_id" not in cols and "props" not in cols or \
                name == "events_props", \
                "%s: events scan reads %s" % (name, sorted(cols))


def test_column_pruning_reaches_scan(spark, entry):
    plan = _plan(spark, entry, "token_counts")
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, plan
    for ln in scans:
        cols = ln.split("FileScan parquet [", 1)[1].split("]", 1)[0]
        names = {c.split("#")[0] for c in cols.split(",")}
        assert names <= {"doc_id", "text"}, \
            "scan reads more than the projection needs: %s" % names


def test_filter_pushdown_reaches_scan(spark, entry):
    plan = _plan(spark, entry, "ann_cosine_topk")
    pushed = [ln for ln in plan.splitlines()
              if "DataFilters" in ln and "vec_id" in ln and "< 8" in ln]
    assert pushed, "vec_id < 8 not pushed into the parquet scan:\n" + plan


def test_minhash_joins_are_hash_not_broadcast_corpus(spark, entry):
    """The verify joins must be SHUFFLED hash joins: parquet stats
    underestimate token-array columns, so without the hint the
    optimizer broadcasts the tokenized corpus (driver-side build,
    unbounded at scale)."""
    plan = _plan(spark, entry, "dedup_minhash")
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan, plan
    # the token side must never be a broadcast build
    assert "BroadcastHashJoin" not in plan or "toks" not in [
        ln for ln in plan.splitlines() if "BroadcastExchange" in ln
    ], plan
