#!/usr/bin/env python3
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's measurement — this file exists so per-query isolation runs,
noop-sink timings, and .explain("formatted") captures never touch it).

Methodology matches bench.py (best-of-N count() after cache/GC
isolation, same corpus helpers) so numbers are comparable with
BENCH_r05.json. Additionally:
  --explain DIR   write <query>_<tag>.txt plan captures (formatted)
  --noop          time df.write.format("noop") instead of count()
  --sf1           run against the 10x-amplified copy (materialized once)

Usage:
  python bench_extra.py --queries q3,q11 --tag before --explain plans/r06
  python bench_extra.py --queries smoke_ngram --sf1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_targets(spark, sf_dir):
    from rdf_rdfa_spark import corpus
    from rdf_rdfa_spark.pipeline.extract import extract_triples
    from rdf_rdfa_spark.textops import dedup as _dedup
    import __spark_entry__ as E

    pages = corpus.pages_df(spark, sf_dir, repeat=8)
    Q = E.queries()
    return {
        # the 12 bench.py queries, identical call shapes
        "q1_rdfa_extract": lambda: extract_triples(pages),
        "q2_entail_classes": lambda: E.q_entail_classes(spark, sf_dir),
        "q3_dedup_minhash": lambda: _dedup.minhash_near_dup_pairs(
            E._dup_corpus(spark, sf_dir), threshold=0.9),
        "q4_dedup_exact": lambda: E.q_dedup_exact(spark, sf_dir),
        "q5_entity_link": lambda: E.q_entity_link_sameas(spark, sf_dir),
        "q6_ann_cosine": lambda: E.q_ann_cosine_topk(spark, sf_dir),
        "q7a_quality": lambda: E.q_quality_scores(spark, sf_dir),
        "q7b_lang": lambda: E.q_lang_id(spark, sf_dir),
        "q7c_fingerprint": lambda: E.q_fingerprint(spark, sf_dir),
        "q8_dedup_simhash": lambda: _dedup.simhash_near_dups(
            E._dup_corpus(spark, sf_dir), max_hamming=3),
        "q9_session_windows": lambda: E.q_events_session_windows(spark, sf_dir),
        "q10_writer_export": lambda: E.q_writer_roundtrip(spark, sf_dir),
        "q11_kg_pagerank": lambda: E.q_kg_pagerank(spark, sf_dir),
        # heavy sf1-smoke operators (production configs, bench.py names)
        "smoke_ngram": lambda: _dedup.ngram_jaccard_pairs(
            E._dup_corpus(spark, sf_dir), n=3, threshold=0.8),
        "smoke_emb_lsh": lambda: Q["emb_near_dup_lsh"](spark, sf_dir),
        "smoke_clusters": lambda: _dedup.canonical_clusters(
            _dedup.minhash_near_dup_pairs(
                E._dup_corpus(spark, sf_dir), threshold=0.9)),
        "smoke_describe": lambda: Q["kg_sparql_describe"](spark, sf_dir),
        "smoke_ivf": lambda: Q["ann_ivf_topk"](spark, sf_dir),
        "smoke_bgp_path": lambda: Q["kg_bgp_path"](spark, sf_dir),
        "smoke_sparql_sub": lambda: Q["kg_sparql_sub"](spark, sf_dir),
        "smoke_sparql_update": lambda: Q["kg_sparql_update"](spark, sf_dir),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--queries", default="")
    ap.add_argument("--tag", default="")
    ap.add_argument("--explain", default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf1", action="store_true")
    args = ap.parse_args()

    from rdf_rdfa_spark.pipeline.session import get_spark
    spark = get_spark(app_name="bench-extra")
    sf_dir = args.sf_dir
    if args.sf1:
        from rdf_rdfa_spark import corpus
        sf_dir = corpus.materialize_scaled_sf(
            spark, args.sf_dir, "/tmp/spark_graft_sf1", mult=10)

    targets = build_targets(spark, sf_dir)
    names = [n for n in args.queries.split(",") if n] or list(targets)

    # warmup (same as bench.py)
    spark.range(10 ** 7).selectExpr("sum(id)").collect()
    from rdf_rdfa_spark import corpus as _c
    from rdf_rdfa_spark.pipeline.extract import extract_triples as _ex
    _ex(_c.pages_df(spark, sf_dir, repeat=8).sample(False, 0.01, seed=1)).count()

    def _isolate():
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out = {}
    for name in names:
        fn = targets[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn().explain("formatted")
            fname = "%s%s.txt" % (name, ("_" + args.tag) if args.tag else "")
            with open(os.path.join(args.explain, fname), "w") as f:
                f.write(buf.getvalue())
        best = None
        samples = []
        for _ in range(args.runs):
            _isolate()
            spark.sparkContext.setJobDescription("bench_extra:" + name)
            t0 = time.time()
            if args.noop:
                fn().write.format("noop").mode("overwrite").save()
            else:
                fn().count()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = dt if best is None or dt < best else best
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": round(best, 3), "samples": samples}
        print("%-22s best=%7.3f  %s" % (name, best, samples), file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "noop": args.noop, "queries": out}))


if __name__ == "__main__":
    main()
