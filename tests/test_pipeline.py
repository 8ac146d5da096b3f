"""Spark pipeline tests (slower — one shared session).

Cross-engine value checks live in scripts/oracle_check.py and the
driver's CORRECTNESS gate; these tests cover the distributed
algorithms' semantics against in-Python references.
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdf_rdfa_spark import corpus
from rdf_rdfa_spark.pipeline.expand import entail, entail_fixpoint, tbox_closures
from rdf_rdfa_spark.pipeline.extract import extract_triples, extract_text
from rdf_rdfa_spark.pipeline.link import connected_components
from rdf_rdfa_spark.pipeline import materialize
from rdf_rdfa_spark.textops import dedup, similarity

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SCO = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
SPO = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
EQC = "http://www.w3.org/2002/07/owl#equivalentClass"


def test_extract_matches_oracle_sample(spark, sf_dir):
    import duckdb

    pages = corpus.pages_df(spark, sf_dir)
    got = {tuple(r) for r in extract_triples(pages).collect()}
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM '%s/documents.parquet'" % sf_dir)
    want = {tuple(r) for r in con.sql(corpus.triples_oracle_sql()).fetchall()}
    assert got == want


def test_text_byte_identity(spark, sf_dir):
    pages = corpus.pages_df(spark, sf_dir)
    extracted = extract_text(pages).withColumnRenamed("text", "extracted")
    bad = (
        extracted.join(pages.select("url", "text"), "url")
        .filter("extracted <> text OR extracted IS NULL")
        .count()
    )
    assert bad == 0


def test_extract_handles_broken_page(spark):
    rows = [("http://x.example/ok",
             b'<html><body><span about="a" property="dc:title">T</span></body></html>'),
            ("http://x.example/garbage", bytes(range(256))),
            ("http://x.example/null", None)]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = extract_triples(pages).collect()
    urls = {r["url"] for r in out}
    assert "http://x.example/ok" in urls
    # a None page yields a processor row, never a task failure
    assert any(r["graph"] == "processor" for r in out
               if r["url"] == "http://x.example/null")


def test_tbox_closure():
    prop, cls = tbox_closures([
        ("a", SPO, "b"), ("b", SPO, "c"),
        ("X", SCO, "Y"), ("Y", EQC, "Z"),
    ])
    assert ("a", "c") in prop and ("a", "b") in prop
    assert ("X", "Z") in set(cls) and ("Z", "Y") in set(cls)


def test_entail_equals_fixpoint(spark):
    abox = spark.createDataFrame(
        [("x", RDF_TYPE, "A"), ("u", "p1", "v")],
        "subj string, pred string, obj string",
    )
    tbox = spark.createDataFrame(
        [("A", SCO, "B"), ("B", SCO, "C"), ("p1", SPO, "p2"), ("p2", SPO, "p3")],
        "sub string, rel string, sup string",
    )
    fast = {tuple(r) for r in entail(abox, tbox).collect()}
    slow = {tuple(r) for r in entail_fixpoint(abox, tbox).collect()}
    assert fast == slow
    assert ("x", RDF_TYPE, "C") in fast
    assert ("u", "p3", "v") in fast


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string",
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["d"] == cc["e"] == "d"
    assert cc["f"] == "f"


def test_connected_components_long_chain(spark):
    """Pointer-jumping convergence: a 120-node path graph (diameter
    119) must fully converge well inside max_iter=20 — pure
    neighbor-min would need 119 rounds — and still label every node
    with the lexicographic-min member ('n000')."""
    edges = spark.createDataFrame(
        [("n%03d" % i, "n%03d" % (i + 1)) for i in range(119)],
        "src string, dst string",
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert len(cc) == 120
    assert set(cc.values()) == {"n000"}


def test_link_entities_broadcast_and_shuffle_paths(spark):
    """link_entities must rewrite identically whether the cluster map
    is broadcast (default) or falls back to a shuffle join above the
    max_broadcast_rows guard."""
    from rdf_rdfa_spark.pipeline.link import link_entities

    rows = [
        ("u1", "http://e/a", "http://www.w3.org/2002/07/owl#sameAs",
         "http://e/b", "iri"),
        ("u1", "http://e/b", "http://e/p", "val", "literal"),
        ("u2", "http://e/c", "http://e/p", "http://e/a", "iri"),
    ]
    triples = spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
              "obj_kind string")

    def canon(df):
        return sorted((r["subj"], r["pred"], r["obj"])
                      for r in df.collect())

    broadcast = canon(link_entities(triples))
    shuffled = canon(link_entities(triples, max_broadcast_rows=0))
    assert broadcast == shuffled
    # a and b collapse to the lexicographic min (http://e/a)
    assert ("http://e/a", "http://e/p", "val") in broadcast
    assert ("http://e/c", "http://e/p", "http://e/a") in broadcast


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different words entirely unrelated content here " * 8
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    verified = dedup.jaccard_verify(pairs, docs, threshold=0.5)
    got = {(r["a"], r["b"]) for r in verified.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_simhash_hamming(spark):
    # needs token diversity: with few distinct tokens most bit votes
    # tie at 0 and a single extra token flips many bits (verified
    # offline: these fixtures give hamming 3 and 38)
    words = ["word%02d" % i for i in range(30)]
    base = " ".join(words * 3)
    near = base.replace("word07", "changed", 1)
    far = " ".join("other%02d" % i for i in range(30))
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in dedup.simhash_near_dups(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_simhash_bucket_cap_bounds_boilerplate(spark):
    # boilerplate-heavy corpus: 40 identical template pages share every
    # signature block → one hot bucket.  The skew cap drops it (no
    # quadratic reducer); uncapped finds all C(40,2)+1 pairs.
    tmpl = " ".join("word%02d" % i for i in range(30))
    rows = [(i, tmpl) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.simhash_near_dups(docs, max_hamming=8, max_bucket=8)
    uncapped = dedup.simhash_near_dups(docs, max_hamming=8, max_bucket=1 << 40)
    assert capped.count() == 0          # hot bucket (40 > 8) dropped entirely
    assert uncapped.count() == 40 * 39 // 2


def test_ngram_bucket_cap_bounds_skewed_corpus(spark):
    # single-bucket skew: every doc is same lang + same length decile.
    # With the cap below the bucket size the self-join sees zero rows.
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(i, base + "tail%d" % i, "en", len(base)) for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    capped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_bucket=8)
    uncapped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5,
                                         max_bucket=1 << 40)
    assert capped.count() == 0
    assert uncapped.count() == 30 * 29 // 2


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pdf = emb.toPandas()
    vecs = np.stack(pdf["embedding"].map(np.asarray).values).astype(np.float64)
    ids = pdf["vec_id"].values
    queries = emb.filter("vec_id < 3").selectExpr("vec_id AS qid",
                                                  "embedding AS qvec")
    got = similarity.cosine_topk(emb, queries, k=5).toPandas()
    norms = np.linalg.norm(vecs, axis=1)
    for qid in range(3):
        qi = list(ids).index(qid)
        sims = vecs @ vecs[qi] / (norms * norms[qi])
        order = sorted(zip(-sims, ids))  # desc score, asc id tiebreak
        expect = [int(i) for _, i in order[:5]]
        mine = got[got.qid == qid].sort_values("rank")["vec_id"].tolist()
        assert mine == expect, f"qid {qid}: {mine} != {expect}"


def test_lsh_ann_reasonable_recall(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter("vec_id < 8").selectExpr("vec_id AS qid",
                                                  "embedding AS qvec")
    exact = similarity.cosine_topk(emb, queries, k=5).toPandas()
    approx = similarity.lsh_ann_topk(emb, queries, k=5, n_planes=4,
                                     dim=64).toPandas()
    # every query must at least find itself in its own bucket
    for qid in range(8):
        mine = set(approx[approx.qid == qid]["vec_id"])
        assert qid in mine


def test_write_triples_append_refuses_modulus_change(spark, tmp_path):
    """Appending with a different bucket modulus would leave old rows
    in old-modulus partition dirs while pruned queries hash with the
    new one — write_triples must refuse instead of rewriting the
    meta."""
    t = spark.createDataFrame(
        [("u", "s", "p", "o", "iri", None, None, None)],
        "url string, subj string, pred string, obj string, "
        "obj_kind string, lang string, datatype string, graph string")
    root = str(tmp_path / "store")
    materialize.write_triples(t, root, buckets=16)
    with pytest.raises(ValueError, match="buckets=16"):
        materialize.write_triples(t, root, buckets=32, mode="append")
    # same modulus appends fine; overwrite may change it
    materialize.write_triples(t, root, buckets=16, mode="append")
    materialize.write_triples(t, root, buckets=8, mode="overwrite")
    assert materialize.store_buckets(root) == 8


def test_materialize_resumable(spark, sf_dir, tmp_path):
    pages = corpus.pages_df(spark, sf_dir).limit(60).cache()
    root = str(tmp_path / "store")
    m1 = materialize.materialize_resumable(pages, root, chunks=4)
    assert len(m1["ran"]) == 4 and not m1["skipped"]
    total1 = materialize.read_triples(spark, root).count()
    # idempotent resume: nothing re-runs, store unchanged
    m2 = materialize.materialize_resumable(pages, root, chunks=4)
    assert len(m2["skipped"]) == 4 and not m2["ran"]
    assert materialize.read_triples(spark, root).count() == total1
    # partial resume: delete one marker → exactly that chunk re-runs
    os.remove(os.path.join(root, "_progress", "chunk-2.done"))
    m3 = materialize.materialize_resumable(pages, root, chunks=4)
    assert m3["ran"] == [2]
    lineage = materialize.lineage_summary(root)
    assert lineage["pages"] >= 60  # chunk-2 counted twice in lineage log
    assert (
        materialize.read_triples(spark, root)
        .filter("graph = 'output'").count() > 0
    )


def test_multimodal_stub(spark, sf_dir):
    from rdf_rdfa_spark.textops import multimodal

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(20)
    feats = multimodal.extract_features(
        multimodal.documents_as_binary(docs)
    ).toPandas()
    assert len(feats) == 20
    assert feats["n_bytes"].gt(0).all()
    assert feats["width"].between(16, 79).all()


def test_expansion_spec_rules(spark):
    """Per-rule goldens from /root/reference/spec/expansion_spec.rb:88-135
    over the EXP vocabulary (expansion_spec.rb:3-8)."""
    from rdf_rdfa_spark.pipeline.expand import VOCAB_REGISTRY, entail

    EXPV = "http://example.org/vocab#"
    FOAF = "http://xmlns.com/foaf/0.1/"
    ME = "http://example/#me"
    tbox = spark.createDataFrame(VOCAB_REGISTRY[EXPV],
                                 "sub string, rel string, sup string")
    cases = {
        "prp-spo1": ([(ME, EXPV + "name", "Gregg Kellogg")],
                     [(ME, FOAF + "name", "Gregg Kellogg")]),
        "prp-eqp1": ([(ME, EXPV + "namee", "Gregg Kellogg")],
                     [(ME, FOAF + "name", "Gregg Kellogg")]),
        "prp-eqp2": ([(ME, FOAF + "name", "Gregg Kellogg")],
                     [(ME, EXPV + "namee", "Gregg Kellogg")]),
        "cax-sco": ([(ME, RDF_TYPE, EXPV + "Person")],
                    [(ME, RDF_TYPE, FOAF + "Person")]),
        "cax-eqc1": ([(ME, RDF_TYPE, EXPV + "Persone")],
                     [(ME, RDF_TYPE, FOAF + "Person")]),
        "cax-eqc2": ([(ME, RDF_TYPE, FOAF + "Person")],
                     [(ME, RDF_TYPE, EXPV + "Persone")]),
    }
    for name, (abox_rows, entailed) in cases.items():
        abox = spark.createDataFrame(abox_rows,
                                     "subj string, pred string, obj string")
        got = {tuple(r) for r in entail(abox, tbox).collect()}
        assert set(abox_rows) <= got, name
        for t in entailed:
            assert t in got, (name, sorted(got))


def test_vocab_expansion_end_to_end(spark):
    """Page declares @vocab → usesVocabulary triple → expand() joins
    the offline vocabulary T-box (reference reader option
    vocab_expansion: true, reader.rb:451)."""
    from rdf_rdfa_spark.pipeline.expand import expand

    html = ('<html><body><div about="http://example/#me" '
            'vocab="http://example.org/vocab#" typeof="Person">'
            '<span property="name">Gregg</span></div></body></html>')
    pages = spark.createDataFrame(
        [("http://x.example/", html.encode())], "url string, html binary")
    triples = extract_triples(pages)
    expanded = {(r["subj"], r["pred"], r["obj"])
                for r in expand(triples).collect()}
    FOAF = "http://xmlns.com/foaf/0.1/"
    assert ("http://example/#me", RDF_TYPE, FOAF + "Person") in expanded
    assert ("http://example/#me", FOAF + "name", "Gregg") in expanded


def test_writer_roundtrip(spark, sf_dir):
    """Serialize a graph to XHTML+RDFa and re-parse with our reader —
    the result must be identical (the reference's writer round-trip
    strategy, writer_spec.rb:546)."""
    from rdf_rdfa_spark.pipeline.extract import rows_for_document
    from rdf_rdfa_spark.writer import df_to_rdfa_html

    pages = corpus.pages_df(spark, sf_dir)
    triples = extract_triples(pages).filter(
        "url = 'http://host0.example.org/page/1'")
    html = df_to_rdfa_html(triples)
    reparsed = {
        (r[1], r[2], r[3], r[4], r[5] or None, r[6] or None)
        for r in rows_for_document(html, "http://roundtrip.example/",
                                   skolemize=False)
    }
    original = {
        (r["subj"], r["pred"], r["obj"], r["obj_kind"], r["lang"], r["datatype"])
        for r in triples.collect()
    }
    assert reparsed == original, (sorted(original - reparsed)[:3],
                                  sorted(reparsed - original)[:3])


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    """The same UDF runs unchanged under Structured Streaming and
    produces exactly the batch output (availableNow drain)."""
    from rdf_rdfa_spark.pipeline.streaming import stream_extract

    pages = corpus.pages_df(spark, sf_dir).limit(100).cache()
    in_dir = str(tmp_path / "pages_in")
    pages.write.parquet(in_dir)

    out_dir = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, in_dir, out_dir, ckpt, max_files_per_trigger=2)
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    want = {tuple(r) for r in extract_triples(spark.read.parquet(in_dir)).collect()}
    assert got == want and len(got) > 0

    # resume: a second availableNow run ingests nothing new
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(got)


def test_stream_dedup_exact_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState online dedup: each fingerprint emitted
    exactly once across micro-batches AND across restarts; duplicates
    appended later never re-emit (state survives in the checkpoint)."""
    import os
    from pyspark.sql import functions as F
    from rdf_rdfa_spark.pipeline.streaming import stream_dedup_exact

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    docs.write.parquet(in_dir)

    q = stream_dedup_exact(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    want_fps = {r[0] for r in
                docs.select(F.md5("text")).distinct().collect()}
    assert {r["fingerprint"] for r in got.collect()} == want_fps
    assert got.count() == len(want_fps)

    # append exact duplicates under new ids → nothing new is emitted
    docs.selectExpr("doc_id + 500000 AS doc_id", "text", "lang",
                    "source", "n_chars").write.mode("append").parquet(in_dir)
    q2 = stream_dedup_exact(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(want_fps)


def test_session_windows_streaming_matches_batch(spark, sf_dir, tmp_path):
    """session_windows is the streaming-capable sessionizer: the same
    groupBy(session_window) runs under readStream (stateful session
    merging + watermark) and drains to exactly the batch output."""
    import os
    from pyspark.sql import functions as F
    from rdf_rdfa_spark.textops.events import session_windows

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    in_dir = str(tmp_path / "events_in")
    events.write.parquet(in_dir)

    # watermarks require TIMESTAMP (LTZ); the parquet column is NTZ —
    # cast identically on both sides
    cast_ts = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp"))  # noqa: E731
    events = cast_ts(events)
    stream = cast_ts(
        spark.readStream.schema(
            spark.read.parquet(in_dir).schema).parquet(in_dir)
    ).withWatermark("ts", "1 hour")
    q = (
        session_windows(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName("sess_win")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_win").collect()}
    want = {tuple(r) for r in session_windows(events).collect()}
    assert got == want and len(got) > 0


def test_pagerank_deterministic_and_sane(spark):
    """Integer fixed-point PageRank: identical at different shuffle
    parallelism (the whole point of the integer formulation) and the
    hub of a star graph outranks its spokes."""
    from rdf_rdfa_spark.pipeline.graphops import SCALE, pagerank

    rows = [("u", "http://e/%d" % i, "http://e/p", "http://e/hub", "iri")
            for i in range(8)]
    rows.append(("u", "http://e/hub", "http://e/p", "http://e/0", "iri"))
    triples = spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
              "obj_kind string")
    r1 = {r["node"]: r["pr"] for r in pagerank(triples, iters=5).collect()}
    r2 = {r["node"]: r["pr"]
          for r in pagerank(triples.repartition(7), iters=5).collect()}
    assert r1 == r2
    assert r1["http://e/hub"] > r1["http://e/1"]
    # ranks stay in sane fixed-point range
    assert all(0 < v < 10 * SCALE for v in r1.values())


def test_salted_agg_matches_plain(spark, sf_dir):
    from rdf_rdfa_spark.pipeline.skew import host_rollup

    triples = extract_triples(corpus.pages_df(spark, sf_dir))
    salted = {(r["host"], r["n_triples"]) for r in host_rollup(triples).collect()}
    plain = {
        (r["host"], r["n"])
        for r in triples.withColumn(
            "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
        ).groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert salted == plain
    # the corpus really is skewed: host0 carries the biggest share
    top = max(plain, key=lambda t: t[1])
    assert top[0] == "host0.example.org"


def test_split_hot_keys(spark):
    from rdf_rdfa_spark.pipeline.skew import split_hot_keys

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold%d" % i, i) for i in range(20)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [("cold%d" % i, "C%d" % i) for i in range(20)],
        "k string, tag string",
    )
    got = split_hot_keys(big, small, "k", hot_threshold=100)
    plain = big.join(small, "k")
    assert got.count() == plain.count() == 520


def test_ivf_ann_recall(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter("vec_id < 8").selectExpr("vec_id AS qid",
                                                  "embedding AS qvec")
    exact = similarity.cosine_topk(emb, queries, k=10).toPandas()
    approx = similarity.ivf_ann_topk(emb, queries, k=10, nlist=8,
                                     nprobe=4).toPandas()
    recalls = []
    for qid in range(8):
        e = set(exact[exact.qid == qid]["vec_id"])
        a = set(approx[approx.qid == qid]["vec_id"])
        assert qid in a  # self-retrieval
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_canonical_iri_col(spark):
    from rdf_rdfa_spark.pipeline.link import canonical_iri_col

    cases = [
        ("HTTP://Example.COM/Path?Q=1", "http://example.com/Path?Q=1"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("http://example.com", "http://example.com/"),
        ("_:b0", "_:b0"),
        ("urn:ex:s001", "urn:ex:s001"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in cases], "iri string")
    got = [r["c"] for r in
           df.select(canonical_iri_col(F.col("iri")).alias("c")).collect()]
    assert got == [b for _, b in cases], got


def test_subject_lookup_prunes(spark, sf_dir, tmp_path):
    from rdf_rdfa_spark.pipeline.materialize import (
        materialize_resumable, subject_lookup)

    pages = corpus.pages_df(spark, sf_dir).limit(80)
    root = str(tmp_path / "store2")
    materialize_resumable(pages, root, chunks=2, buckets=8)
    from rdf_rdfa_spark.pipeline.materialize import read_triples

    target = read_triples(spark, root).select("subj").first()["subj"]
    got = subject_lookup(spark, root, target, buckets=8)
    rows = got.collect()
    assert rows and all(r["subj"] == target for r in rows)
    # the physical plan must show a partition filter on bucket
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted") if False else \
        got._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_writer_curie_compression():
    """Writer mints CURIEs from the initial-context prefixes, declares
    only used prefixes in @prefix, folds rdf:type into @typeof, and
    emits bnodes as SafeCURIEs — all round-trip through our reader
    (writer.rb:366-390 preprocess, :273-283 typeof, writer_spec.rb:546)."""
    from rdf_rdfa_spark.rdfa.walk import parse_rdfa
    from rdf_rdfa_spark.writer import to_rdfa_html

    FOAF = "http://xmlns.com/foaf/0.1/"
    rows = [
        ("http://example.org/a",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         FOAF + "Person", "iri", None, None),
        ("http://example.org/a", FOAF + "name", "Alice", "literal", None, None),
        ("http://example.org/a", "http://purl.org/dc/terms/created",
         "2020-01-01", "literal", None,
         "http://www.w3.org/2001/XMLSchema#date"),
        ("http://example.org/a", FOAF + "knows", "_:b0", "bnode", None, None),
        ("_:b0", FOAF + "name", "Bob", "literal", "en", None),
    ]
    html = to_rdfa_html(rows)
    assert 'typeof="foaf:Person"' in html
    assert 'property="foaf:name"' in html
    assert 'datatype="xsd:date"' in html
    assert 'resource="[_:b0]"' in html
    # only used prefixes declared
    assert "foaf: http://xmlns.com/foaf/0.1/" in html
    assert "schema:" not in html

    out, _, _ = parse_rdfa(html.encode(), url="http://example.org/doc")
    got, want = set(), set()
    for (sk, sv), (_pk, pv), o in out:
        s = "BN" if sk == "bnode" else sv
        if o[0] == "literal":
            got.add((s, pv, o[1], "literal", o[2], o[3]))
        else:
            got.add((s, pv, "BN" if o[0] == "bnode" else o[1],
                     o[0], None, None))
    for s, p, o, k, lang, dt in rows:
        want.add(("BN" if s.startswith("_:") else s, p,
                  "BN" if k == "bnode" else o, k, lang, dt))
    assert got == want, (sorted(want - got), sorted(got - want))


def test_bpe_token_counts(spark):
    """GPT-2-style pre-tokenizer classes: contractions split, digits
    and letters separate, punctuation runs, space-prefixed words."""
    from rdf_rdfa_spark.textops.quality import bpe_token_counts

    df = spark.createDataFrame(
        [(1, "It's 42 degrees, isn't it?"), (2, "")],
        "doc_id long, text string")
    got = {r["id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
           for r in bpe_token_counts(df).collect()}
    # It |'s | 42 | degrees |, | isn |'t | it |?  -> 9
    assert got[1] == (9, 5)
    assert got[2] == (0, 1)


def test_register_vocabulary_end_to_end(spark):
    """A user-registered vocabulary (Turtle source) drives distributed
    expansion, mirroring the reference's vocab_repository option."""
    from rdf_rdfa_spark.pipeline.expand import RDFA_USESVOCABULARY, expand
    from rdf_rdfa_spark.rdfa.vocab import VOCAB_REGISTRY, register_vocabulary

    url = "http://vocab.test/reg#"
    n = register_vocabulary(url, """
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        @prefix v: <http://vocab.test/reg#> .
        @prefix up: <http://upstream.example/> .
        v:localName rdfs:subPropertyOf up:name .
        v:Thing rdfs:subClassOf up:Entity .
        v:ignored v:notAnAxiom v:alsoIgnored .
    """)
    try:
        assert n == 2
        triples = spark.createDataFrame(
            [("http://d/1", RDFA_USESVOCABULARY, url),
             ("http://d/1", url + "localName", "X"),
             ("http://d/1", RDF_TYPE, url + "Thing")],
            "subj string, pred string, obj string")
        got = {(r["subj"], r["pred"], r["obj"])
               for r in expand(triples).collect()}
        assert ("http://d/1", "http://upstream.example/name", "X") in got
        assert ("http://d/1", RDF_TYPE,
                "http://upstream.example/Entity") in got
    finally:
        VOCAB_REGISTRY.pop(url, None)


def test_auto_bands_matches_threshold_curve():
    # s50 = (1/b)^(1/r) must sit below threshold - 0.05 with the
    # largest admissible rows-per-band
    assert dedup.auto_bands(64, 0.9) == 8      # r=8, s50 ≈ 0.77
    assert dedup.auto_bands(64, 0.7) == 16     # r=4, s50 = 0.5
    assert dedup.auto_bands(64, 0.99) == 4     # r=16, s50 ≈ 0.917
    assert dedup.auto_bands(64, 0.3) == 32     # r=2, s50 ≈ 0.18
    assert dedup.auto_bands(128, 0.9) == 16    # scales with num_hashes


def test_snapshot_time_travel(spark, sf_dir, tmp_path):
    """Each committed chunk is an Iceberg-style snapshot: reading at
    snapshot k scans only the files manifests v1..vk added, and the
    latest read equals the plain store read."""
    pages = corpus.pages_df(spark, sf_dir).limit(40).cache()
    root = str(tmp_path / "store")
    materialize.materialize_resumable(pages, root, chunks=3)
    assert materialize.current_snapshot(root) == 3
    total = materialize.read_triples(spark, root).count()
    counts = [materialize.read_triples(spark, root, snapshot=k).count()
              for k in (1, 2, 3)]
    assert counts[0] > 0 and counts == sorted(counts)
    assert counts[2] == total
    # snapshot reads keep the partition columns for pruning
    cols = materialize.read_triples(spark, root, snapshot=1).columns
    assert "graph" in cols and "bucket" in cols
    # snapshot 2 must equal chunks 0+1's lineage triple counts
    lin = materialize.lineage_summary(root)
    by_chunk = {c["chunk"]: c["triples"] for c in lin["chunks"]}
    assert counts[1] == by_chunk[0] + by_chunk[1]


def test_stream_materialize_and_compact(spark, sf_dir, tmp_path):
    """Micro-batch ingestion commits per-batch snapshots into the same
    store layout; compaction rewrites small files under a `compact`
    snapshot and both plain and snapshot reads stay consistent."""
    pages = corpus.pages_df(spark, sf_dir).limit(30).cache()
    in_dir, root = str(tmp_path / "in"), str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    pages.repartition(4).write.parquet(in_dir)
    q = materialize.stream_materialize(
        spark, in_dir, root, ckpt, max_files_per_trigger=2)
    q.awaitTermination()
    n_snaps = materialize.current_snapshot(root)
    assert n_snaps >= 2            # several micro-batches committed
    total = materialize.read_triples(spark, root).count()
    assert materialize.read_triples(spark, root, snapshot=n_snaps).count() == total
    assert 0 < materialize.read_triples(spark, root, snapshot=1).count() < total

    res = materialize.compact_store(spark, root)
    assert res["rewritten_partitions"]
    # plain read, latest-snapshot read, and row content all survive
    assert materialize.read_triples(spark, root).count() == total
    assert materialize.read_triples(
        spark, root, snapshot=res["snapshot"]).count() == total
    # every live partition now holds at most one data file
    from rdf_rdfa_spark.pipeline.materialize import _store_files
    per_part = {}
    for rel in _store_files(root + "/triples"):
        per_part[os.path.dirname(rel)] = per_part.get(os.path.dirname(rel), 0) + 1
    assert max(per_part.values()) == 1


def test_strip_boilerplate_semantics(spark):
    from rdf_rdfa_spark.textops.boilerplate import (
        boilerplate_lines, strip_boilerplate)

    rows = [
        (1, "nav\nunique one\nfooter", "h1"),
        (2, "nav\nunique two\nfooter", "h1"),
        (3, "nav\nunique three", "h1"),
        (4, "all alone here", "h2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bp = {(r["grp"], r["line"]) for r in boilerplate_lines(docs).collect()}
    # nav: 3/3 docs; footer: 2/3 ≥ 1/2 → both boilerplate in h1.
    # h2 has one doc: its single line is trivially 1/1 → stripped too
    # (min_df applies per group; tiny groups self-identify — callers
    # gate by group size upstream if that is not wanted)
    assert ("h1", "nav") in bp and ("h1", "footer") in bp
    got = {r["id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
           for r in strip_boilerplate(docs).collect()}
    assert got[1] == ("unique one", 3, 2)
    assert got[2] == ("unique two", 3, 2)
    assert got[3] == ("unique three", 2, 1)
    assert got[4] == ("", 1, 1)


def test_dataset_split_stable_under_growth(spark):
    """A document's split never changes when the corpus grows — the
    property that makes hash splits safe for eval-set hygiene."""
    from rdf_rdfa_spark.textops.filters import dataset_split

    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    s1 = {r["doc_id"]: r["split"] for r in dataset_split(small).collect()}
    s2 = {r["doc_id"]: r["split"] for r in dataset_split(big).collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # ~5/5/90 split, deterministic
    from collections import Counter
    c = Counter(s2.values())
    assert c["train"] > c["val"] > 0 and c["test"] > 0
    # salt versioning changes assignments
    s3 = {r["doc_id"]: r["split"]
          for r in dataset_split(small, salt="v2").collect()}
    assert s3 != s1


def test_bgp_select_semantics(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    rows = [
        ("a", "type", "Art"), ("a", "same", "m1"), ("a", "genre", "g1"),
        ("b", "type", "Art"), ("b", "genre", "g2"),
        ("c", "same", "m3"), ("c", "genre", "g3"),
        ("a", "loop", "a"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {tuple(r) for r in bgp_select(t, [
        (var("d"), "type", "Art"),
        (var("d"), "same", var("m")),
    ]).collect()}
    assert got == {("a", "m1")}
    # same variable in two positions of one pattern → equality filter
    loops = {r["x"] for r in bgp_select(
        t, [(var("x"), "loop", var("x"))]).collect()}
    assert loops == {"a"}
    # select projection
    only_d = {r["d"] for r in bgp_select(t, [
        (var("d"), "genre", var("g"))], select=["d"]).collect()}
    assert only_d == {"a", "b", "c"}


def test_bgp_filter_and_optional(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    rows = [
        ("a", "type", "Art"), ("a", "score", "9"),
        ("b", "type", "Art"), ("b", "score", "3"),
        ("c", "type", "Art"),
        ("a", "label", "AA"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    # FILTER over a bound variable
    got = {r["d"] for r in bgp_select(
        t, [(var("d"), "type", "Art"), (var("d"), "score", var("s"))],
        filters=["s > '5'"]).collect()}
    assert got == {"a"}
    # OPTIONAL keeps non-matching solutions with NULLs
    rows2 = {(r["d"], r["s"]) for r in bgp_select(
        t, [(var("d"), "type", "Art")],
        optional=[[(var("d"), "score", var("s"))]]).collect()}
    assert rows2 == {("a", "9"), ("b", "3"), ("c", None)}
    # two OPTIONAL groups compose independently
    rows3 = {(r["d"], r["s"], r["l"]) for r in bgp_select(
        t, [(var("d"), "type", "Art")],
        optional=[[(var("d"), "score", var("s"))],
                  [(var("d"), "label", var("l"))]]).collect()}
    assert rows3 == {("a", "9", "AA"), ("b", "3", None), ("c", None, None)}


def test_bgp_union(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, bgp_union, var

    rows = [("a", "type", "Art"), ("b", "type", "Book"),
            ("c", "type", "Art"), ("a", "type", "Book")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["d"] for r in bgp_union(t, [
        [(var("d"), "type", "Art")],
        [(var("d"), "type", "Book")],
    ]).collect()}
    assert got == {"a", "b", "c"}


def test_lsh_bucket_cap_applied_before_collect(spark):
    """A mega-bucket (40 identical docs → every band key shared) must
    be dropped by the skew guard BEFORE collect_list ever sees it: the
    plan carries a WINDOW count + filter BELOW the collect_list
    aggregate (WindowExec buffers a group in a spillable sorter, never
    a single-group agg buffer), and the window preserves the
    (band, key) partitioning so guard + collect share ONE exchange
    (pairs-distinct adds the only other one)."""
    tmpl = " ".join("word%02d" % i for i in range(30))
    docs = spark.createDataFrame([(i, tmpl) for i in range(40)],
                                 "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs)
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket=8, num_hashes=64)
    assert capped.count() == 0          # hot bucket (40 > 8) dropped
    uncapped = dedup.lsh_candidate_pairs(sigs, max_bucket=1 << 40,
                                         num_hashes=64)
    assert uncapped.count() == 40 * 39 // 2
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window [count(1)" in plan, plan
    # physical plans print root-first: the guard window must be BELOW
    # (printed after) the collect aggregate
    assert plan.index("Window [count(1)") > plan.index("collect_list"), plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_simhash_bucket_cap_applied_before_collect(spark):
    tmpl = " ".join("word%02d" % i for i in range(30))
    docs = spark.createDataFrame([(i, tmpl) for i in range(40)],
                                 "doc_id long, text string")
    plan = (dedup.simhash_near_dups(docs, max_bucket=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window [count(1)" in plan, plan
    assert plan.index("Window [count(1)") > plan.index("collect_list"), plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_emb_lsh_bucket_cap_and_lean_banding(spark):
    """cosine_near_dup_pairs_lsh production shape: (a) a hot
    sign-pattern bucket (identical template embeddings) is dropped by
    the window-count guard BEFORE any pair expansion; (b) the banded
    exchange carries only (id, tbl, bucket) — embedding vectors never
    ride it (they used to be exploded n_tables-fold through the
    self-join and the pair-dedup exchange); (c) guard + collect share
    one exchange, the pair distinct is the only other."""
    from pyspark.sql import functions as F
    from rdf_rdfa_spark.textops.similarity import (
        cosine_near_dup_pairs_lsh, emb_lsh_candidate_pairs)

    rows = [(i, [1.0] * 64) for i in range(40)]          # one hot bucket
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert cosine_near_dup_pairs_lsh(df, max_bucket=8).count() == 0
    assert (cosine_near_dup_pairs_lsh(df, max_bucket=1 << 20).count()
            == 40 * 39 // 2)
    v = df.select(F.col("vec_id").alias("id"),
                  F.transform(F.col("embedding"),
                              lambda x: x.cast("double")).alias("v"))
    plan = (emb_lsh_candidate_pairs(v, 64, 4, 12, 8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window [count(1)" in plan, plan
    assert plan.index("Window [count(1)") > plan.index("collect_list"), plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # no vector column above the banded exchange: the first reference
    # to the cast vector array appears only BELOW it (bucket math)
    assert plan.index("v#") > plan.index("Exchange hashpartitioning(tbl"), plan


def test_ivf_train_releases_vector_cache(spark):
    """ivf_train caches the vector projection for its Lloyd rounds; a
    long-lived session must not accumulate one cached corpus per call
    — after training (centroids eagerly checkpointed) the SQL cache
    must be empty again.  (pagerank's partitioned edge cache follows
    the same persist/unpersist discipline.)"""
    rows = [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    spark.catalog.clearCache()
    cents = similarity.ivf_train(df, nlist=4)
    assert cents.count() == 4
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_exact_duplicates_hot_fingerprint_bounded(spark):
    """The hottest fingerprint at crawl scale (the empty page) has
    millions of members: dup_ids must stay capped while n_dups carries
    the true cardinality; max_ids=None drops membership lists from the
    plan entirely."""
    rows = [(i, "same text") for i in range(300)] + [(1000, "unique")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.exact_duplicates(docs, max_ids=10).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_dups"] == 300
    assert r["canonical_id"] == 0
    assert r["dup_ids"] == list(range(10))   # capped, sorted, smallest-first
    lean = dedup.exact_duplicates(docs, max_ids=None)
    assert lean.columns == ["fingerprint", "n_dups", "canonical_id"]
    assert "collect_list" not in (
        lean._jdf.queryExecution().executedPlan().toString())
    # capped path: count window + rank window + collect all cluster on
    # fingerprint — a single exchange, no guard join
    plan = (dedup.exact_duplicates(docs, max_ids=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_topk_is_two_phase(spark):
    """cosine_topk's ranking must be the two-phase plan: a local
    row_number partitioned by (qid, input-partition) before the global
    per-qid window, so no single reducer ever sorts the whole scored
    corpus for a query."""
    from rdf_rdfa_spark.textops import similarity

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(50)],
        "vec_id long, embedding array<double>")
    q = emb.limit(2).selectExpr("vec_id as qid", "embedding as qvec")
    topk = similarity.cosine_topk(emb, q, k=3)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    windows = [ln for ln in plan.splitlines()
               if "Window [row_number()" in ln]
    assert len(windows) == 2, plan
    # root-first printing: windows[0] is the global phase (qid only),
    # windows[1] the local phase partitioned by (qid, _part)
    assert "_part" in windows[1] and "_part" not in windows[0], plan
    # Spark 4 inserts a map-side Partial WindowGroupLimit below each
    # exchange, so BOTH shuffles carry ≤ k rows per (group, mapper):
    # the full scored corpus never crosses the wire
    assert plan.count("row_number(), 3, Partial") == 2, plan
    # and the result equals the one-phase answer
    import numpy as np
    rows = topk.collect()
    assert {r["qid"] for r in rows} == {0, 1}
    for qid in (0, 1):
        got = [r["vec_id"] for r in sorted(
            (r for r in rows if r["qid"] == qid), key=lambda r: r["rank"])]
        qv = np.array([float(qid), 1.0])
        vs = np.array([[float(i), 1.0] for i in range(50)])
        cos = (vs @ qv) / (np.linalg.norm(vs, axis=1) * np.linalg.norm(qv))
        order = sorted(range(50), key=lambda i: (-cos[i], i))[:3]
        assert got == order


def test_bgp_negation_and_modifiers(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_ask, bgp_select, var

    triples = spark.createDataFrame(
        [("a", "type", "Doc"), ("b", "type", "Doc"), ("c", "type", "Doc"),
         ("a", "label", "A"), ("b", "label", "B"), ("c", "label", "C"),
         ("a", "mirror", "m1"), ("x", "other", "y")],
        "subj string, pred string, obj string")
    base = [(var("d"), "type", "Doc"), (var("d"), "label", var("l"))]
    # MINUS: docs WITHOUT a mirror (the "which subjects have NO label"
    # class of question)
    got = {r["d"] for r in bgp_select(
        triples, base,
        minus=[[(var("d"), "mirror", var("m"))]]).collect()}
    assert got == {"b", "c"}
    # MINUS with a disjoint group removes nothing (SPARQL spec)...
    assert bgp_select(
        triples, base,
        minus=[[(var("z"), "other", var("w"))]]).count() == 3
    # ...while NOT EXISTS with a disjoint matching group removes all
    assert bgp_select(
        triples, base,
        not_exists=[[(var("z"), "other", var("w"))]]).count() == 0
    assert bgp_select(
        triples, base,
        not_exists=[[(var("d"), "mirror", var("m"))]]).count() == 2
    # ORDER BY + LIMIT compile to TakeOrderedAndProject (top-k merge,
    # no global sort of the solution set)
    top = bgp_select(triples, base, order_by=["d"], limit=2)
    assert [r["d"] for r in top.collect()] == ["a", "b"]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # ASK
    assert bgp_ask(triples, [(var("d"), "mirror", var("m"))])
    assert not bgp_ask(triples, [(var("d"), "nope", var("m"))])


def test_bgp_optional_rejects_optional_only_shared_vars(spark):
    """A later OPTIONAL sharing a variable bound only by an earlier
    OPTIONAL must raise: NULL join keys silently diverge from SPARQL's
    unbound-is-compatible semantics."""
    import pytest as _pytest
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    triples = spark.createDataFrame(
        [("a", "type", "Doc"), ("a", "mirror", "m1"), ("m1", "label", "L")],
        "subj string, pred string, obj string")
    with _pytest.raises(ValueError, match="earlier OPTIONAL"):
        bgp_select(
            triples, [(var("d"), "type", "Doc")],
            optional=[[(var("d"), "mirror", var("m"))],
                      [(var("m"), "label", var("ml"))]])


def test_stream_materialize_reconciles_orphan_files(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: files appended by a crashed
    attempt (on disk, in no manifest) must be swept when the batch
    replays, so plain reads and snapshot reads agree afterwards."""
    import glob
    import shutil

    root = str(tmp_path / "store")
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    pages = corpus.pages_df(spark, sf_dir).limit(40)
    pages.write.parquet(os.path.join(inp, "batch0"))
    q = materialize.stream_materialize(
        spark, inp + "/*", root, str(tmp_path / "ckpt"))
    q.awaitTermination()
    tracked = materialize.read_triples(spark, root).count()
    # simulate a crashed attempt: copy a data file to an untracked name
    some = glob.glob(os.path.join(root, "triples", "graph=*", "bucket=*",
                                  "*.parquet"))[0]
    orphan = os.path.join(os.path.dirname(some), "part-orphan.c000.parquet")
    shutil.copyfile(some, orphan)
    assert materialize.read_triples(spark, root).count() > tracked
    # next stream batch reconciles before appending
    pages.write.parquet(os.path.join(inp, "batch1"))
    q2 = materialize.stream_materialize(
        spark, inp + "/*", root, str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert not os.path.exists(orphan)
    plain = materialize.read_triples(spark, root).count()
    snap = materialize.read_triples(
        spark, root, snapshot=materialize.current_snapshot(root)).count()
    assert plain == snap == 2 * tracked


def test_precompaction_snapshot_read_is_partial(spark, sf_dir, tmp_path):
    """After compaction expires replaced files, reading an OLD snapshot
    returns the still-existing subset (documented partial time travel,
    like Iceberg after expire_snapshots) instead of failing at scan."""
    root = str(tmp_path / "store")
    pages = corpus.pages_df(spark, sf_dir).limit(40)
    materialize.materialize_resumable(pages, root, chunks=2)
    pre = materialize.current_snapshot(root)
    full = materialize.read_triples(spark, root, snapshot=pre).count()
    materialize.compact_store(spark, root)
    # the old snapshot still reads (possibly partial), never raises
    partial = materialize.read_triples(spark, root, snapshot=pre).count()
    assert 0 <= partial <= full
    # the compacted head sees everything
    head = materialize.current_snapshot(root)
    assert materialize.read_triples(spark, root, snapshot=head).count() == full


def test_bgp_property_paths(spark):
    from rdf_rdfa_spark.pipeline.bgpq import (
        alt, bgp_select, inv, one_or_more, seq, var, zero_or_more,
        zero_or_one)

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
         ("a", "q", "x"), ("x", "r", "y")],
        "subj string, pred string, obj string")

    def pairs(path, **kw):
        return {(r["x"], r["y"]) for r in bgp_select(
            triples, [(var("x"), path, var("y"))], **kw).collect()}

    # p+ transitive closure
    assert pairs(one_or_more("p")) == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d")}
    # p* adds the zero-length identity over every graph node
    star = pairs(zero_or_more("p"))
    for n in ("a", "b", "c", "d", "x", "y", "q"):
        if n in ("q",):
            continue
        assert (n, n) in star
    assert ("a", "d") in star
    # seq: q/r
    assert pairs(seq("q", "r")) == {("a", "y")}
    # alt: p|q from a
    assert ("a", "b") in pairs(alt("p", "q")) and (
        "a", "x") in pairs(alt("p", "q"))
    # inverse
    assert pairs(inv("p")) == {("b", "a"), ("c", "b"), ("d", "c")}
    # zero_or_one
    zoo = pairs(zero_or_one("q"))
    assert ("a", "x") in zoo and ("b", "b") in zoo
    # constant endpoint + closure: everything reachable from a via p+
    got = {r["y"] for r in bgp_select(
        triples, [("a", one_or_more("p"), var("y"))]).collect()}
    assert got == {"b", "c", "d"}


def test_bgp_aggregate(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_aggregate, var

    triples = spark.createDataFrame(
        [("a", "type", "Doc"), ("b", "type", "Doc"), ("c", "type", "Doc"),
         ("a", "genre", "news"), ("b", "genre", "news"),
         ("c", "genre", "blog"),
         ("a", "genre", "news")],  # duplicate triple: set semantics
        "subj string, pred string, obj string")
    got = {r["g"]: r["n"] for r in bgp_aggregate(
        triples,
        [(var("d"), "type", "Doc"), (var("d"), "genre", var("g"))],
        group_by=["g"], aggs={"n": F.count("*")}).collect()}
    assert got == {"news": 2, "blog": 1}


def test_bgp_values_and_bind(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    triples = spark.createDataFrame(
        [("a", "type", "Doc"), ("b", "type", "Doc"), ("c", "type", "Doc"),
         ("a", "label", "Apple"), ("b", "label", "Pear"),
         ("c", "label", "Fig")],
        "subj string, pred string, obj string")
    base = [(var("d"), "type", "Doc"), (var("d"), "label", var("l"))]
    # VALUES: restrict d to an inline binding table
    got = {r["d"] for r in bgp_select(
        triples, base, values=(["d"], [("a",), ("c",)])).collect()}
    assert got == {"a", "c"}
    # BIND: computed variable usable by FILTER
    rows = bgp_select(
        triples, base,
        bind={"l_len": F.length("l")},
        filters=[F.col("l_len") >= 4]).collect()
    assert {(r["d"], r["l_len"]) for r in rows} == {("a", 5), ("b", 4)}
    # disjoint VALUES raises
    import pytest as _pytest
    with _pytest.raises(ValueError, match="VALUES"):
        bgp_select(triples, base, values=(["zz"], [("x",)]))


def test_processor_date_opt_in():
    """Full reference parity for the processor graph's dc:date triple
    (reader.rb:539) with a caller-supplied deterministic date; absent
    by default (the documented deviation)."""
    from rdf_rdfa_spark.rdfa.walk import parse_rdfa

    html = (b'<html><body><span about="[undef:x]" property="dc:title">'
            b'T</span></body></html>')
    out, proc, _ = parse_rdfa(html, url="http://x/", rdfagraph="all",
                              processor_date="2026-08-17")
    dates = [t for t in proc if t[1][1].endswith("dc/terms/date")]
    assert dates and dates[0][2] == (
        "literal", "2026-08-17", None,
        "http://www.w3.org/2001/XMLSchema#date")
    out2, proc2, _ = parse_rdfa(html, url="http://x/", rdfagraph="all")
    assert not [t for t in proc2 if t[1][1].endswith("dc/terms/date")]
    assert out == out2   # the output graph is unaffected by the option


def test_bgp_construct(spark):
    from rdf_rdfa_spark.pipeline.bgpq import bgp_construct, var

    triples = spark.createDataFrame(
        [("a", "type", "Doc"), ("a", "mirror", "m1"),
         ("b", "type", "Doc")],
        "subj string, pred string, obj string")
    got = {tuple(r) for r in bgp_construct(
        triples,
        [(var("d"), "type", "Doc")],
        [(var("d"), "kind", "document"),
         (var("d"), "seen", var("d"))],
        optional=[[(var("d"), "mirror", var("m"))]],
    ).collect()}
    assert ("a", "kind", "document") in got
    assert ("b", "seen", "b") in got
    assert len(got) == 4
    # unbound OPTIONAL var in the template → that row dropped, per SPARQL
    got2 = {tuple(r) for r in bgp_construct(
        triples, [(var("d"), "type", "Doc")],
        [(var("d"), "sameAs", var("m"))],
        optional=[[(var("d"), "mirror", var("m"))]]).collect()}
    assert got2 == {("a", "sameAs", "m1")}


def test_path_closure_matches_python_reference(spark):
    """Iterative-doubling closure vs a pure-Python Warshall reference
    on pseudo-random graphs (fixed seeds — deterministic)."""
    import random

    from rdf_rdfa_spark.pipeline.bgpq import one_or_more, path_edges

    for seed in (3, 17, 99):
        rnd = random.Random(seed)
        nodes = ["n%d" % i for i in range(14)]
        edges = {(rnd.choice(nodes), rnd.choice(nodes))
                 for _ in range(25)}
        triples = spark.createDataFrame(
            [(s, "p", o) for s, o in edges],
            "subj string, pred string, obj string")
        got = {(r["s"], r["o"]) for r in path_edges(
            triples, one_or_more("p")).collect()}
        want = set(edges)
        grew = True
        while grew:
            grew = False
            for (a, b) in list(want):
                for (c, d) in list(want):
                    if b == c and (a, d) not in want:
                        want.add((a, d))
                        grew = True
        assert got == want, seed


def test_sparql_bucket_pruning_on_store(spark, sf_dir, tmp_path):
    """Constant-subject SPARQL over the materialized store prunes to
    ONE bucket partition directory: the partition filter on `bucket`
    reaches the scan, exactly like materialize.subject_lookup — a
    point lookup on a 100 TB store reads 1/buckets of it."""
    from rdf_rdfa_spark.pipeline import materialize
    from rdf_rdfa_spark.pipeline.sparql import sparql

    root = str(tmp_path / "store")
    pages = corpus.pages_df(spark, sf_dir)
    materialize.materialize_resumable(pages, root, chunks=2, buckets=16)
    assert materialize.store_buckets(root) == 16
    store = materialize.read_triples(spark, root)
    subj = store.select("subj").first()["subj"]
    q = 'SELECT ?p ?o WHERE { <%s> ?p ?o }' % subj
    pruned = sparql(store, q, buckets=16)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1)[1][:200], plan
    # same answers as the unpruned query
    a = {tuple(r) for r in pruned.collect()}
    b = {tuple(r) for r in sparql(store, q).collect()}
    assert a == b and a
    # and agrees with the dedicated point-lookup helper
    c = {(r["pred"], r["obj"]) for r in materialize.subject_lookup(
        spark, root, subj, buckets=16).select("pred", "obj").collect()}
    assert a == c
