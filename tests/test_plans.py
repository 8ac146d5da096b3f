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
            "ann_lsh_topk"}


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as E
    return E


def _plan(spark, entry, name):
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_anywhere(spark, entry):
    offenders = {}
    for name in entry.queries():
        plan = _plan(spark, entry, name)
        if "CartesianProduct" in plan:
            offenders[name] = True
    assert not offenders, "unbroadcast cartesian joins in: %s" % (
        sorted(offenders))


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
