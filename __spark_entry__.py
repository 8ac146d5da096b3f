"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship RDFa-extraction pipeline on sf0.001;
`queries()` exposes each implemented operator from SURVEY.md §2 (plus
the training-data ops) as (spark, sf_dir) → DataFrame; `oracle_sql()`
gives the DuckDB-equivalent SQL for every value-checkable query.

The RDFa corpus is synthesized deterministically from
documents.parquet with SQL expressions shared verbatim between Spark
and DuckDB (rdf_rdfa_spark/corpus.py) — so even the HTML→triples
extraction path has a full value-level oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rdf_rdfa_spark import corpus
from rdf_rdfa_spark.pipeline.expand import entail
from rdf_rdfa_spark.pipeline.extract import extract_text, extract_triples
from rdf_rdfa_spark.pipeline.link import sameas_clusters
from rdf_rdfa_spark.rdfa.terms import RDF_TYPE
from rdf_rdfa_spark.textops import dedup, events, multimodal, quality, similarity

CLASS_NS = "http://kg.example.org/class/"
PROP_NS = "http://kg.example.org/prop/"
DOC_NS = "http://kg.example.org/doc/"

_TRIPLE_COLS = ["url", "subj", "pred", "obj", "obj_kind", "lang", "datatype", "graph"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


# embeddings.parquet is generated with a fixed width at every sf
EMB_DIM = 64


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# --- RDFa pipeline queries ------------------------------------------------

def q_rdfa_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = corpus.pages_df(spark, sf_dir)
    return extract_triples(pages).select(*_TRIPLE_COLS)


def _kg_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extracted triples behind a LAZY materialization barrier, for the
    BGP/SPARQL queries: the query compilers reference the store once
    per triple pattern, and without the barrier every pattern scan
    re-runs the whole page-parse pipeline (measured: kg_sparql_sub's
    four patterns cost four extractions).  A parquet-backed store
    (pipeline/materialize.py) would NOT want this — per-pattern scans
    there get pushdown + bucket pruning — but over an inline
    extraction pipeline, materializing once is strictly better.
    Results are identical (a barrier, not a transform)."""
    return q_rdfa_extract(spark, sf_dir).localCheckpoint(eager=False)


def q_kg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdf_rdfa_spark.pipeline import graphops

    return graphops.degrees(q_rdfa_extract(spark, sf_dir))


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-point integer PageRank: bit-identical at any parallelism
    # and exactly replayable in the SQL oracle (10 unrolled rounds)
    from rdf_rdfa_spark.pipeline import graphops

    return graphops.pagerank(q_rdfa_extract(spark, sf_dir), iters=10)


def q_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed writer closure: extract → export RDFa pages
    (applyInPandas per url) → RE-extract → per-url triple counts.
    Counts match the corpus oracle iff the writer loses/merges
    nothing; per-page graph ISOMORPHISM is separately pytest-checked
    (test_writer_spec.py real-page sweep)."""
    from rdf_rdfa_spark.pipeline.export import export_rdfa_pages

    triples = extract_triples(corpus.pages_df(spark, sf_dir))
    pages2 = export_rdfa_pages(triples)
    return (
        extract_triples(pages2)
        .groupBy("url")
        .agg(F.count("*").alias("n_triples"))
    )


def q_stream_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming extraction under the VALUE oracle: the same
    pages go through readStream → mapInPandas extraction → parquet sink
    (availableNow), and the sink contents must hash-match the batch
    oracle SQL — batch ≡ stream, value-level."""
    import shutil
    import tempfile

    from rdf_rdfa_spark.pipeline.streaming import stream_extract

    work = tempfile.mkdtemp(prefix="spark_graft_stream_")
    in_dir = os.path.join(work, "pages")
    out_dir = os.path.join(work, "triples")
    ckpt = os.path.join(work, "ckpt")
    # split the input across several files so the stream takes >1
    # micro-batch (maxFilesPerTrigger exercises incremental progress)
    corpus.pages_df(spark, sf_dir).repartition(8).write.parquet(in_dir)
    q = stream_extract(spark, in_dir, out_dir, ckpt,
                       max_files_per_trigger=3)
    q.awaitTermination()
    result = spark.read.parquet(out_dir).select(*_TRIPLE_COLS)
    shutil.rmtree(os.path.join(work, "ckpt"), ignore_errors=True)
    return result


def q_rdfa_pred_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_rdfa_extract(spark, sf_dir)
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
    )


def q_rdfa_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical extracted text invariant: mismatches (MUST be empty)."""
    pages = corpus.pages_df(spark, sf_dir)
    extracted = extract_text(pages).withColumnRenamed("text", "extracted")
    return (
        extracted.join(pages.select("url", "text"), "url")
        .filter((F.col("extracted") != F.col("text"))
                | F.col("extracted").isNull())
        .select("url")
    )


def q_rdfa_processor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = corpus.pages_df(spark, sf_dir)
    triples = extract_triples(pages, include_processor=True)
    return (
        triples.filter(F.col("graph") == "processor")
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
    )


# --- entailment (J1) ------------------------------------------------------

def _class_tbox(spark):
    rows = [(CLASS_NS + "src%d" % i, "http://www.w3.org/2000/01/rdf-schema#subClassOf",
             CLASS_NS + "group%d" % (i % 4)) for i in range(20)]
    rows += [(CLASS_NS + "group%d" % g, "http://www.w3.org/2000/01/rdf-schema#subClassOf",
              CLASS_NS + "Document") for g in range(4)]
    rows.append((CLASS_NS + "group0", "http://www.w3.org/2002/07/owl#equivalentClass",
                 CLASS_NS + "primary"))
    return spark.createDataFrame(rows, "sub string, rel string, sup string")


def _prop_tbox(spark):
    rows = [
        (PROP_NS + "basedOn", "http://www.w3.org/2000/01/rdf-schema#subPropertyOf",
         PROP_NS + "cites"),
        (PROP_NS + "cites", "http://www.w3.org/2000/01/rdf-schema#subPropertyOf",
         PROP_NS + "refs"),
        (PROP_NS + "cites", "http://www.w3.org/2002/07/owl#equivalentProperty",
         PROP_NS + "quotes"),
    ]
    return spark.createDataFrame(rows, "sub string, rel string, sup string")


def q_kg_bgp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative BGP query over the constructed KG: Articles with
    their genre, OPTIONALly joined with a sameAs mirror — required
    patterns compile to inner joins on the shared subject variable,
    the OPTIONAL group to a left join (NULL m where no script)."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    triples = _kg_store(spark, sf_dir)
    return bgp_select(
        triples,
        [(var("d"), RDF_TYPE, "http://schema.org/Article"),
         (var("d"), "http://schema.org/genre", var("g"))],
        # OPTIONAL: only every 11th page embeds the sameAs script —
        # the others come back with m = NULL (left-join semantics)
        optional=[[(var("d"), "http://schema.org/sameAs", var("m"))]],
    )


def q_kg_bgp_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation + solution modifiers over the KG: Articles with a
    genre that have NO sameAs mirror (SPARQL MINUS → left-anti join),
    first 100 by (d, g) (ORDER BY + LIMIT → TakeOrderedAndProject,
    never a global sort)."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, var

    triples = _kg_store(spark, sf_dir)
    return bgp_select(
        triples,
        [(var("d"), RDF_TYPE, "http://schema.org/Article"),
         (var("d"), "http://schema.org/genre", var("g"))],
        minus=[[(var("d"), "http://schema.org/sameAs", var("m"))]],
        order_by=["d", "g"], limit=100,
    )


def q_kg_bgp_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property path over the KG: ``x basedOn+ y`` — transitive
    closure by distributed iterative doubling (log-diameter rounds,
    one shuffle per round, lazy localCheckpoint lineage barriers).
    Docs chain within decades (doc_id %% 10 boundaries), so the
    closure output scales LINEARLY with the corpus (45 pairs per
    decade), not quadratically — oracled against a DuckDB recursive
    CTE."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, one_or_more, var

    abox = (
        _docs(spark, sf_dir)
        .filter("doc_id % 10 != 0 AND doc_id > 0")
        .selectExpr(
            "'%s' || doc_id AS subj" % DOC_NS,
            "'%sbasedOn' AS pred" % PROP_NS,
            "'%s' || (doc_id - 1) AS obj" % DOC_NS,
        )
    )
    return bgp_select(
        abox, [(var("x"), one_or_more(PROP_NS + "basedOn"), var("y"))])


def q_kg_bgp_path_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-restricted property path: ``<doc19> basedOn+ ?y`` — the
    engine seeds a frontier from the BOUND subject and iterates
    frontier ⋈ edges to fixpoint (work ∝ the reachable chain, 9 docs),
    instead of materializing the full closure and filtering — the
    web-scale reachability shape (oracle: seeded DuckDB recursive
    CTE)."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_select, one_or_more, var

    abox = (
        _docs(spark, sf_dir)
        .filter("doc_id % 10 != 0 AND doc_id > 0")
        .selectExpr(
            "'%s' || doc_id AS subj" % DOC_NS,
            "'%sbasedOn' AS pred" % PROP_NS,
            "'%s' || (doc_id - 1) AS obj" % DOC_NS,
        )
    )
    return bgp_select(
        abox, [(DOC_NS + "19", one_or_more(PROP_NS + "basedOn"),
                var("y"))])


def q_kg_sparql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL TEXT in, DataFrame out: the same negation + modifier
    query as kg_bgp_minus authored as a SPARQL string and parsed by
    pipeline/sparql.py — so the textual surface itself sits under the
    value oracle (shared SQL with kg_bgp_minus)."""
    from rdf_rdfa_spark.pipeline.sparql import sparql

    triples = _kg_store(spark, sf_dir)
    return sparql(triples, """
        PREFIX schema: <http://schema.org/>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?d ?g WHERE {
          ?d rdf:type schema:Article ; schema:genre ?g .
          FILTER NOT EXISTS { ?d schema:sameAs ?m }
        } ORDER BY ?d ?g LIMIT 100""")


def q_kg_sparql_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-metadata SPARQL: the engine threads the store's
    lang/datatype/obj_kind columns alongside object-bound variables,
    so FILTERs can test LANG()/DATATYPE()/isIRI() — here: every
    integer-typed or English-tagged object in the KG."""
    from rdf_rdfa_spark.pipeline.sparql import sparql

    triples = q_rdfa_extract(spark, sf_dir)
    return sparql(triples, """
        SELECT ?d ?p ?v WHERE {
          ?d ?p ?v .
          FILTER (DATATYPE(?v) =
                    <http://www.w3.org/2001/XMLSchema#integer>
                  || LANG(?v) = "en")
        }""")


def q_kg_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-scoped SPARQL: per-predicate counts of the PROCESSOR
    graph (the store routes processor diagnostics to a named graph
    exactly like the reference's rdfagraph option,
    reader.rb:311-317,459-466) — querying diagnostics no longer needs
    manual DataFrame filtering."""
    from rdf_rdfa_spark.pipeline.sparql import sparql

    pages = corpus.pages_df(spark, sf_dir)
    triples = extract_triples(pages, include_processor=True)
    return sparql(triples, """
        SELECT ?p (COUNT(*) AS ?n) WHERE {
          GRAPH <processor> { ?s ?p ?w }
        } GROUP BY ?p""")


def q_kg_sparql_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subquery + HAVING: genres with ≥ 3 mirrored articles
    (inner { SELECT ... GROUP BY ... HAVING }), then every article of
    those genres — the 'top genre, then its docs' shape from the
    round-4 verdict.  The subquery compiles bottom-up to an aggregate
    plan (HAVING as a hidden count column, dropped after the filter)
    and joins the outer patterns on ?g."""
    from rdf_rdfa_spark.pipeline.sparql import sparql

    triples = _kg_store(spark, sf_dir)
    return sparql(triples, """
        PREFIX schema: <http://schema.org/>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?d ?g WHERE {
          ?d rdf:type schema:Article ; schema:genre ?g .
          { SELECT ?g WHERE { ?x schema:genre ?g ; schema:sameAs ?m }
            GROUP BY ?g HAVING (COUNT(*) >= 3) }
        } ORDER BY ?d ?g LIMIT 120""")


def q_kg_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL DESCRIBE: every store triple about the articles of one
    genre — targets resolved through the WHERE group, description =
    subject-scoped triple set (broadcast-semi against the store)."""
    from rdf_rdfa_spark.pipeline.sparql import sparql

    triples = _kg_store(spark, sf_dir)
    return sparql(triples, """
        PREFIX schema: <http://schema.org/>
        DESCRIBE ?d WHERE { ?d schema:genre "src0" }
    """).select("subj", "pred", "obj")


def q_kg_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL UPDATE (functional): rename every schema:genre edge to
    schema:category via DELETE {} INSERT {} WHERE {} — the update
    returns the new triples DataFrame (the store is immutable;
    committing = writing a snapshot), here projected to (subj, pred,
    obj) and value-oracled against a CASE rewrite of the corpus
    triples."""
    from rdf_rdfa_spark.pipeline.sparql import sparql_update

    triples = _kg_store(spark, sf_dir)
    updated = sparql_update(triples, """
        PREFIX schema: <http://schema.org/>
        DELETE { ?d schema:genre ?g }
        INSERT { ?d schema:category ?g }
        WHERE { ?d schema:genre ?g }""")
    return updated.select("subj", "pred", "obj")


def q_kg_bgp_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL aggregate over the KG: Articles per genre (GROUP BY +
    COUNT over the distinct solution set; map-side partial agg)."""
    from rdf_rdfa_spark.pipeline.bgpq import bgp_aggregate, var

    triples = _kg_store(spark, sf_dir)
    return bgp_aggregate(
        triples,
        [(var("d"), RDF_TYPE, "http://schema.org/Article"),
         (var("d"), "http://schema.org/genre", var("g"))],
        group_by=["g"], aggs={"n_docs": F.count("*")})


def q_entail_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    abox = _docs(spark, sf_dir).selectExpr(
        "'%s' || doc_id AS subj" % DOC_NS,
        "'%s' AS pred" % RDF_TYPE,
        "'%s' || source AS obj" % CLASS_NS,
    )
    return entail(abox, _class_tbox(spark))


def q_entail_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    abox = (
        _docs(spark, sf_dir)
        .filter("doc_id > 0")
        .selectExpr(
            "'%s' || doc_id AS subj" % DOC_NS,
            "'%sbasedOn' AS pred" % PROP_NS,
            "'%s' || (doc_id - 1) AS obj" % DOC_NS,
        )
    )
    return entail(abox, _prop_tbox(spark))


# --- entity linking (J3) ---------------------------------------------------

def q_entity_link_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    triples = q_rdfa_extract(spark, sf_dir)
    return sameas_clusters(triples)


def q_host_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rdf_rdfa_spark.pipeline.skew import host_rollup

    return host_rollup(q_rdfa_extract(spark, sf_dir))


# --- dedup family -----------------------------------------------------------

def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies of every 10th doc under shifted ids —
    guarantees the dedup path has work to do, deterministically.

    Built as ONE scan + a per-row id-shift generator rather than
    union(docs, docs.filter(...)): the modulo predicate cannot push
    down to parquet, so the union form read the full `text` column
    twice (every dedup query pays the corpus scan 2x at crawl scale).
    Row set is identical — same ids, same payloads."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        F.explode(
            F.when(F.expr("doc_id % 10 = 0"),
                   F.array(F.col("doc_id"), F.col("doc_id") + 1000000))
            .otherwise(F.array(F.col("doc_id")))
        ).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dup_ids is array<long> in the operator; the driver's comparator
    # needs scalar columns, so serialize it to a csv string here.
    return dedup.exact_duplicates(_dup_corpus(spark, sf_dir)).select(
        "fingerprint", "n_dups", "canonical_id",
        F.array_join("dup_ids", ",").alias("dup_ids"),
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bands=16 (r=4) + uncapped buckets → exhaustive recall (P(miss)
    # ~ 4e-8 per pair at threshold 0.9), so the output equals the
    # exact-Jaccard pair set and is value-oracled against DuckDB. The
    # production configuration (auto bands=8/r=8, max_bucket=64) is
    # what bench.py measures at sf0.1.
    corpus_df = _dup_corpus(spark, sf_dir)
    return dedup.minhash_near_dup_pairs(
        corpus_df, threshold=0.9, bands=16, max_bucket=1 << 40).select(
        "a", "b", F.floor(F.col("jaccard") * 10000).cast("long").alias("jaccard_bp")
    )


def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation filter funnel: per-drop-reason document counts plus
    kept/input totals — the report every training-data pipeline emits
    before tokenization."""
    from rdf_rdfa_spark.textops.filters import quality_funnel

    return quality_funnel(_docs(spark, sf_dir))


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket train/val/test assignment: stable
    under repartitioning and corpus growth, replayed exactly in SQL."""
    from rdf_rdfa_spark.textops.filters import dataset_split

    return dataset_split(_docs(spark, sf_dir)).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.sum("doc_id").alias("sum_ids"),
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over the near-dup clusters: per cluster keep
    the member with the most tokens (ties → smallest id) — the final
    step of an LLM dedup stage, value-oracled end to end on top of the
    exhaustive cluster oracle."""
    corpus_df = _dup_corpus(spark, sf_dir)
    verified = dedup.minhash_near_dup_pairs(corpus_df, threshold=0.9,
                                            bands=16, max_bucket=1 << 40)
    clusters = dedup.canonical_clusters(verified).select(
        F.col("id").cast("long").alias("id"),
        F.col("canonical").cast("long").alias("canonical"))
    scores = corpus_df.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("score"))
    return dedup.keep_best_per_cluster(clusters, scores).select(
        F.col("cluster").cast("long").alias("cluster"),
        "best_id", "n_members")


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style host-group boilerplate removal under the value
    oracle. The synthetic docs carry no newlines, so deterministic
    line breaks are injected with a dialect-common replace() before
    the op — the SQL oracle applies the identical expression."""
    from rdf_rdfa_spark.textops.boilerplate import strip_boilerplate

    docs = _docs(spark, sf_dir).withColumn(
        "text", F.expr("replace(text, ' the ', chr(10) || 'the ')"))
    return strip_boilerplate(docs)


def q_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION MinHash configuration under the value oracle:
    auto banding (threshold 0.9 → b=8/r=8) AND the max_bucket=64 skew
    cap, with the md5-60bit token hash so DuckDB can replay the exact
    signatures, band keys, bucket-size drops, and verify join."""
    return dedup.minhash_near_dup_pairs(
        _dup_corpus(spark, sf_dir), threshold=0.9, max_bucket=64,
        hash_fn=dedup.md5_60bit).select(
        "a", "b",
        F.floor(F.col("jaccard") * 10000).cast("long").alias("jaccard_bp"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # uncapped blocking buckets → exhaustive within-bucket recall, and
    # gram_hash=False → jaccard over gram STRINGS, so the output is
    # PROVABLY replayable in SQL (no 64-bit hash-collision caveat);
    # bench.py measures the capped (max_bucket=1024) hashed-gram
    # production configuration
    return dedup.ngram_jaccard_pairs(
        _dup_corpus(spark, sf_dir), n=3, threshold=0.8,
        max_bucket=1 << 40, gram_hash=False).select(
        "a", "b",
        F.floor(F.col("jaccard") * 10000).cast("long").alias("jaccard_bp"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5-based 60-bit token hash: bit-identical to the DuckDB oracle
    # (production default is the faster JVM xxhash64; same plan shape)
    # uncapped block buckets (see q_dedup_minhash's note): the full
    # O(n²)-hamming DuckDB oracle needs every in-bucket pair; bench.py
    # measures the capped (max_bucket=256) production configuration
    return dedup.simhash_near_dups(
        _dup_corpus(spark, sf_dir), max_hamming=3,
        hash_fn=dedup.md5_60bit, nbits=60, max_bucket=1 << 40)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # uncapped pairs (see q_dedup_minhash) so the cluster set equals
    # connected components over the exact-Jaccard graph — value-oracled
    # against a DuckDB recursive CTE
    corpus_df = _dup_corpus(spark, sf_dir)
    verified = dedup.minhash_near_dup_pairs(corpus_df, threshold=0.9,
                                            bands=16, max_bucket=1 << 40)
    return dedup.canonical_clusters(verified).select(
        F.col("id").cast("long").alias("id"),
        F.col("canonical").cast("long").alias("canonical"),
    )


# --- text analysis -----------------------------------------------------------

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.token_counts(_docs(spark, sf_dir))


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.bpe_token_counts(_docs(spark, sf_dir))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.quality_scores(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.fingerprint(_docs(spark, sf_dir))


# --- similarity search -------------------------------------------------------

def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _embeddings(spark, sf_dir)
        .filter("vec_id < 8")
        .selectExpr("vec_id AS qid", "embedding AS qvec")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(
        _embeddings(spark, sf_dir), _queries_df(spark, sf_dir), k=10
    ).select("qid", "vec_id", "rank")


def _emb_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ exact copies of every 10th vector under shifted
    ids — near-dup detection has deterministic work to do (the random
    synthetic vectors are mutually near-orthogonal)."""
    # one scan + per-row id-shift generator (same rationale as
    # _dup_corpus): the union form read the embedding column twice —
    # the modulo predicate does not push down
    emb = _embeddings(spark, sf_dir)
    return emb.select(
        F.explode(
            F.when(F.expr("vec_id % 10 = 0"),
                   F.array(F.col("vec_id"), F.col("vec_id") + 1000000))
            .otherwise(F.array(F.col("vec_id")))
        ).alias("vec_id"),
        "embedding", "label",
    )


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_near_dup_pairs(
        _emb_dup_corpus(spark, sf_dir), threshold=0.99).select(
        "a", "b", F.floor(F.col("cosine") * 10000).cast("long").alias("cos_bp"))


def q_emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact duplicates collide in every sign-bit table, so on this
    # corpus the LSH path returns the same pair set as the exact one
    # (value-oracled against the same SQL); on general data recall is
    # ~0.97 at t=0.99 — documented in the op
    return similarity.cosine_near_dup_pairs_lsh(
        _emb_dup_corpus(spark, sf_dir), threshold=0.99).select(
        "a", "b", F.floor(F.col("cosine") * 10000).cast("long").alias("cos_bp"))


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_ann_topk(
        _embeddings(spark, sf_dir), _queries_df(spark, sf_dir), k=10,
        dim=EMB_DIM,
    ).select("qid", "vec_id", "rank")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_ann_topk(
        _embeddings(spark, sf_dir), _queries_df(spark, sf_dir), k=10,
        nlist=8, nprobe=4,
    ).select("qid", "vec_id", "rank")


# --- event analytics ---------------------------------------------------------

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.hourly_counts(_events(spark, sf_dir))


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.sessionize(_events(spark, sf_dir))


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark-native session_window (streaming-capable stateful op);
    # value oracle replays the gap semantics with lag/cumsum SQL
    return events.session_windows(_events(spark, sf_dir))


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.props_key_counts(_events(spark, sf_dir))


# --- multimodal plumbing -------------------------------------------------------

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = multimodal.documents_as_binary(_docs(spark, sf_dir))
    return multimodal.extract_features(payloads).select(
        "id", "modality", "n_bytes", "content_md5"
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = multimodal.documents_as_binary(_docs(spark, sf_dir))
    return multimodal.resize_images(payloads, width=32, height=32)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    payloads = multimodal.documents_as_binary(_docs(spark, sf_dir))
    return multimodal.sample_frames(payloads, max_frames=8)


# === driver contract =========================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full RDFa extraction over the synthesized CC-style
    corpus at sf0.001."""
    return q_rdfa_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rdfa_extract": q_rdfa_extract,
        "writer_roundtrip": q_writer_roundtrip,
        "kg_degrees": q_kg_degrees,
        "kg_pagerank": q_kg_pagerank,
        "stream_extract": q_stream_extract,
        "rdfa_pred_counts": q_rdfa_pred_counts,
        "rdfa_text_identity": q_rdfa_text_identity,
        "rdfa_processor_counts": q_rdfa_processor_counts,
        "kg_bgp": q_kg_bgp,
        "kg_bgp_minus": q_kg_bgp_minus,
        "kg_bgp_path": q_kg_bgp_path,
        "kg_bgp_path_seeded": q_kg_bgp_path_seeded,
        "kg_bgp_agg": q_kg_bgp_agg,
        "kg_sparql": q_kg_sparql,
        "kg_sparql_meta": q_kg_sparql_meta,
        "kg_sparql_graph": q_kg_sparql_graph,
        "kg_sparql_sub": q_kg_sparql_sub,
        "kg_sparql_update": q_kg_sparql_update,
        "kg_sparql_describe": q_kg_sparql_describe,
        "entail_classes": q_entail_classes,
        "entail_props": q_entail_props,
        "entity_link_sameas": q_entity_link_sameas,
        "host_rollup": q_host_rollup,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_capped": q_dedup_minhash_capped,
        "dedup_keep_best": q_dedup_keep_best,
        "boilerplate_strip": q_boilerplate_strip,
        "quality_funnel": q_quality_funnel,
        "dataset_split": q_dataset_split,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "token_counts": q_token_counts,
        "bpe_token_counts": q_bpe_token_counts,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "ann_cosine_topk": q_ann_cosine_topk,
        "emb_near_dup": q_emb_near_dup,
        "emb_near_dup_lsh": q_emb_near_dup_lsh,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "events_session_windows": q_events_session_windows,
        "events_props": q_events_props,
    }


# --- DuckDB oracles -----------------------------------------------------------

_RDF_TYPE = RDF_TYPE
_SCO = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

_ENTAIL_CLASSES_SQL = """
WITH abox AS (
  SELECT '{doc}' || doc_id AS subj,
         '{cls}' || source AS src_class,
         CAST(substr(source, 4) AS INT) % 4 AS grp
  FROM documents
)
SELECT subj, '{t}' AS pred, src_class AS obj FROM abox
UNION
SELECT subj, '{t}', '{cls}group' || grp FROM abox
UNION
SELECT subj, '{t}', '{cls}Document' FROM abox
UNION
SELECT subj, '{t}', '{cls}primary' FROM abox WHERE grp = 0
""".format(doc=DOC_NS, cls=CLASS_NS, t=_RDF_TYPE)

_KG_BGP_PATH_SQL = """
WITH RECURSIVE e AS (
  SELECT '{doc}' || doc_id AS s, '{doc}' || (doc_id - 1) AS o
  FROM documents WHERE doc_id % 10 <> 0 AND doc_id > 0
), p AS (
  SELECT s, o FROM e
  UNION
  SELECT p.s, e.o FROM p JOIN e ON p.o = e.s
)
SELECT s AS x, o AS y FROM p
""".format(doc=DOC_NS)

_KG_BGP_PATH_SEEDED_SQL = """
WITH RECURSIVE e AS (
  SELECT doc_id AS s, doc_id - 1 AS o
  FROM documents WHERE doc_id % 10 <> 0 AND doc_id > 0
), r AS (
  SELECT o FROM e WHERE s = 19
  UNION
  SELECT e.o FROM r JOIN e ON r.o = e.s
)
SELECT '{doc}' || o AS y FROM r
""".format(doc=DOC_NS)

_KG_BGP_AGG_SQL = """
WITH t AS ({t})
SELECT g, COUNT(*) AS n_docs FROM (
  SELECT DISTINCT p1.subj AS d, p3.obj AS g
  FROM t p1
  JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'http://schema.org/genre'
  WHERE p1.pred = '{rdf_type}' AND p1.obj = 'http://schema.org/Article'
) GROUP BY g
"""

_ENTAIL_PROPS_SQL = """
WITH abox AS (
  SELECT '{doc}' || doc_id AS subj, '{doc}' || (doc_id - 1) AS obj
  FROM documents WHERE doc_id > 0
)
SELECT subj, '{p}basedOn' AS pred, obj FROM abox
UNION ALL SELECT subj, '{p}cites', obj FROM abox
UNION ALL SELECT subj, '{p}refs', obj FROM abox
UNION ALL SELECT subj, '{p}quotes', obj FROM abox
""".format(doc=DOC_NS, p=PROP_NS)

_ENTITY_LINK_SQL = """
SELECT '{doc}' || doc_id AS entity, '{doc}' || doc_id AS canonical
FROM documents WHERE doc_id % 11 = 0
UNION ALL
SELECT 'http://mirror.example.net/doc/' || doc_id, '{doc}' || doc_id
FROM documents WHERE doc_id % 11 = 0
""".format(doc=DOC_NS)

_DUP_CORPUS_SQL = """
SELECT * FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 10 = 0
"""

# SimHash with the md5-60bit token hash, recomputed exactly in SQL:
# hex-parse the top 15 md5 chars per token (shifts, not float pow —
# 16^14 > 2^53 loses precision as double), ±1 votes per bit, pack,
# then the full O(n²) hamming join (oracle-only; the Spark side uses
# the 4×16-bit block trick, which is exact for hamming ≤ 3).
_DEDUP_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id AS id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM ({dup})
),
th AS (
  SELECT id,
    list_sum(list_transform(range(1, 16), i ->
      CAST(strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1
           AS BIGINT) << ((15 - i) * 4))) AS h
  FROM toks
),
votes AS (
  SELECT id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM th, (SELECT unnest(range(0, 60)) AS b) b
  GROUP BY id, b.b
),
sig AS (
  SELECT id,
         SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END)
           AS simhash
  FROM votes GROUP BY id
)
SELECT a.id AS a, b.id AS b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""".format(dup=_DUP_CORPUS_SQL)

# blocked n-gram Jaccard, replayed exactly: same tokenization, same
# (lang | length-centile) blocking — CAST(...AS INT) in DuckDB ROUNDS,
# so FLOOR first to match Spark's truncating cast — same distinct-gram
# sets, same int/int → double division.
_NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id AS id, lang, n_chars,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM ({dup})
),
g AS (
  SELECT id,
         lang || '|' || CAST(CAST(FLOOR(n_chars / 100) AS INT) AS VARCHAR)
           AS bucket,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(range(1, len(t) - 1),
             i -> array_to_string(list_slice(t, i, i + 2), ' ')))
         ELSE [] END AS grams
  FROM toks
),
gg AS (SELECT * FROM g WHERE len(grams) > 0)
SELECT a.id AS a, b.id AS b,
       CAST(FLOOR((len(list_intersect(a.grams, b.grams))
            / len(list_distinct(list_concat(a.grams, b.grams)))) * 10000)
            AS BIGINT) AS jaccard_bp
FROM gg a JOIN gg b ON a.bucket = b.bucket AND a.id < b.id
WHERE len(list_intersect(a.grams, b.grams))
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
""".format(dup=_DUP_CORPUS_SQL)

# Spark-native session_window replayed with lag/cumsum: a new session
# starts strictly MORE than the gap after the previous event (probed:
# an event exactly gap seconds later merges); value_cents is a sum of
# per-event integer cents (order-independent on both engines)
_SESSION_WINDOWS_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM s GROUP BY user_id, sid
"""

# exact token-set Jaccard over all pairs (DuckDB list ops). Matches
# the Spark LSH path exactly because uncapped b=16/r=4 banding at
# threshold 0.9 has ~zero false-negative probability and the verify
# step recomputes exact Jaccard with the same tokenization.
_DEDUP_MINHASH_SQL = """
WITH toks AS (
  SELECT doc_id AS id,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM ({dup})
)
SELECT a.id AS a, b.id AS b,
       -- same float op order as the Spark side ((inter/union)*10000)
       -- so FLOOR never disagrees by one ulp
       CAST(FLOOR((len(list_intersect(a.t, b.t)) * 1.0
            / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))))
            * 10000) AS BIGINT) AS jaccard_bp
FROM toks a JOIN toks b ON a.id < b.id
WHERE len(list_intersect(a.t, b.t)) * 1.0
      / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.9
""".format(dup=_DUP_CORPUS_SQL)

# connected components over the exact near-dup graph as a recursive
# CTE: labels propagate along edges; the `comp < d` prune is safe
# because the component minimum is smaller than every intermediate
# node, so it always survives to reach the whole component. canonical
# matches Spark's connected_components (LEXICOGRAPHIC min over the
# stringified ids — both sides compare as VARCHAR).


def _dedup_minhash_capped_sql(bands: int = 8, num_hashes: int = 64,
                              max_bucket: int = 64,
                              threshold: float = 0.9) -> str:
    """Exact SQL replay of the PRODUCTION LSH path: md5-60bit token
    hashes mod the Mersenne prime, the 64 SplitMix64 permutations
    (a*h+b mod p — a,h < 2^31 so products stay in BIGINT), r-row band
    keys, bucket-size window [2, max_bucket], in-bucket pair
    generation, and the exact-Jaccard verify with the Spark float op
    order.  Band grouping uses the raw r-tuple string where Spark
    groups on xxhash64 of it — identical partitions (a Spark-side hash
    collision could only merge two buckets, P ~ 2^-64)."""
    from rdf_rdfa_spark.pipeline.canonicalize import (
        _PRIME, permutation_params)

    r = num_hashes // bands
    params = permutation_params(num_hashes)
    mins = ",\n    ".join(
        "list_min(list_transform(h, x -> (%d * x + %d) %% %d))"
        % (a, b, _PRIME) for a, b in params)
    band_keys = ",\n    ".join(
        "array_to_string(list_slice(sig, %d, %d), ',')"
        % (j * r + 1, j * r + r) for j in range(bands))
    return """
WITH toks AS (
  SELECT doc_id AS id,
         list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
  FROM ({dup})
),
hashed AS (
  SELECT id, t,
    list_transform(t, tok ->
      list_sum(list_transform(range(1, 16), i ->
        CAST(strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1
             AS BIGINT) << ((15 - i) * 4))) % {prime}) AS h
  FROM toks
),
sigs AS (
  SELECT id, t, [
    {mins}
  ] AS sig FROM hashed
),
banded AS (
  SELECT id, t, b.b AS band,
         [{band_keys}][b.b + 1] AS key
  FROM sigs, (SELECT unnest(range(0, {bands})) AS b) b
),
buckets AS (
  SELECT band, key, list_sort(list(id)) AS ids
  FROM banded GROUP BY band, key
  HAVING len(list(id)) BETWEEN 2 AND {max_bucket}
),
cand AS (
  SELECT DISTINCT ids[i.i] AS a, ids[j.j] AS b
  FROM buckets,
       (SELECT unnest(range(1, {cap})) AS i) i,
       (SELECT unnest(range(2, {cap1})) AS j) j
  WHERE i.i < j.j AND j.j <= len(ids)
)
SELECT c.a, c.b,
       CAST(FLOOR((len(list_intersect(ta.t, tb.t)) * 1.0
            / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))))
            * 10000) AS BIGINT) AS jaccard_bp
FROM cand c JOIN toks ta ON ta.id = c.a JOIN toks tb ON tb.id = c.b
WHERE len(list_intersect(ta.t, tb.t)) * 1.0
      / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)))
      >= {thr}
""".format(dup=_DUP_CORPUS_SQL, prime=_PRIME, mins=mins,
           band_keys=band_keys, bands=bands, max_bucket=max_bucket,
           cap=max_bucket + 1, cap1=max_bucket + 2, thr=threshold)


_BOILERPLATE_SQL = """
WITH docs AS (
  SELECT doc_id AS id, source AS grp,
         replace(text, ' the ', chr(10) || 'the ') AS text
  FROM documents
),
split AS (
  SELECT id, grp, string_split(text, chr(10)) AS sp FROM docs
),
-- fixed range + WHERE: DuckDB's range() table fn rejects lateral args
-- and WITH ORDINALITY is unimplemented
lines AS (
  SELECT id, grp, sp[i.i] AS line, i.i - 1 AS pos
  FROM split, (SELECT unnest(range(1, 4096)) AS i) i
  WHERE i.i <= len(sp)
),
gd AS (SELECT grp, COUNT(DISTINCT id) AS group_docs FROM docs GROUP BY grp),
bp AS (
  SELECT l.grp, l.line
  FROM (SELECT DISTINCT grp, line, id FROM lines) l
  JOIN gd USING (grp)
  GROUP BY l.grp, l.line, gd.group_docs
  HAVING COUNT(*) * 2 >= gd.group_docs * 1
),
kept AS (
  SELECT l.* FROM lines l
  WHERE NOT EXISTS (SELECT 1 FROM bp
                    WHERE bp.grp = l.grp AND bp.line = l.line)
),
re AS (
  SELECT id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY id
)
SELECT d.id, COALESCE(re.clean_text, '') AS clean_text,
       len(string_split(d.text, chr(10))) AS n_lines,
       CAST(len(string_split(d.text, chr(10))) - COALESCE(re.n_kept, 0)
            AS BIGINT) AS n_removed
FROM docs d LEFT JOIN re ON re.id = d.id
"""


_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE
pairs AS (SELECT a, b FROM ({mh})),
e AS (SELECT CAST(a AS VARCHAR) AS s, CAST(b AS VARCHAR) AS d FROM pairs
      UNION SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM pairs),
n AS (SELECT DISTINCT s AS node FROM e),
cc AS (
  SELECT node, node AS comp FROM n
  UNION
  SELECT e.d AS node, cc.comp FROM cc JOIN e ON cc.node = e.s
  WHERE cc.comp < e.d
)
SELECT CAST(node AS BIGINT) AS id, CAST(MIN(comp) AS BIGINT) AS canonical
FROM cc GROUP BY node
""".format(mh=_DEDUP_MINHASH_SQL)

_DEDUP_KEEP_BEST_SQL = """
WITH clu AS ({clusters}),
sc AS (
  SELECT doc_id AS id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS score
  FROM ({dup})
),
ranked AS (
  SELECT clu.canonical AS cluster, clu.id,
         row_number() OVER (PARTITION BY clu.canonical
                            ORDER BY sc.score DESC, clu.id ASC) AS rn
  FROM clu JOIN sc ON sc.id = clu.id
),
sizes AS (SELECT canonical AS cluster, COUNT(*) AS n_members
          FROM clu GROUP BY canonical)
SELECT r.cluster, r.id AS best_id, sizes.n_members
FROM ranked r JOIN sizes USING (cluster)
WHERE r.rn = 1
"""

# brute-force cosine top-k with Spark-identical scoring: sequential
# left-to-right double accumulation and (desc cosine, asc vec_id)
# tie-break, so ranks agree bit-for-bit.
_ANN_COSINE_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 8),
v AS (SELECT vec_id, embedding AS v FROM embeddings),
scored AS (
  SELECT q.qid, v.vec_id,
    list_sum(list_transform(range(1, len(v.v) + 1),
             i -> CAST(v.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(v.v,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(q.qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
  FROM v, q
)
SELECT qid, vec_id, rank FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
"""

# hyperplane-LSH top-k with the SAME deterministic hyperplanes as the
# Spark side (similarity.hyperplanes literals → VALUES rows), the same
# sequential-fold dot products, and the same (desc cosine, asc vec_id)
# rank tie-break — bit-identical buckets and ranks.
_COSINE_EXPR = """
    list_sum(list_transform(range(1, len(v.v) + 1),
             i -> CAST(v.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(v.v,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(q.qv,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""


def _planes_values_sql(planes) -> str:
    return ",\n    ".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join(repr(c) for c in p))
        for i, p in enumerate(planes)
    )


def _ann_lsh_sql() -> str:
    planes = similarity.hyperplanes(EMB_DIM, 8)  # lsh_ann_topk defaults
    bucket = """
  SELECT t.{id} AS {id},
         SUM(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST(t.{vc}[i] AS DOUBLE) * p.p[i])) > 0
             THEN CAST(1 AS BIGINT) << p.pidx ELSE CAST(0 AS BIGINT) END)
           AS bucket
  FROM {src} t, planes p GROUP BY t.{id}"""
    return """
WITH planes(pidx, p) AS (VALUES
    {planes}),
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < 8),
v AS (SELECT vec_id, embedding AS v FROM embeddings),
vb AS ({vb}),
qb AS ({qb}),
scored AS (
  SELECT q.qid, v.vec_id, {cos} AS cosine
  FROM v JOIN vb USING (vec_id)
       JOIN qb ON vb.bucket = qb.bucket
       JOIN q ON q.qid = qb.qid
)
SELECT qid, vec_id, rank FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
""".format(
        planes=_planes_values_sql(planes),
        vb=bucket.format(id="vec_id", vc="v", src="v", dim=EMB_DIM),
        qb=bucket.format(id="qid", vc="qv", src="q", dim=EMB_DIM),
        cos=_COSINE_EXPR,
    )


def _ivf_sql(nlist: int = 8, nprobe: int = 4, k: int = 10) -> str:
    """IVF top-k mirroring ivf_ann_topk exactly: id-strided seeds,
    two unrolled Lloyd rounds with fixed-point (2^20) per-dimension
    means (integer sums are order-independent, so Spark's partition
    merge order can't perturb the centroids), nearest-centroid
    assignment and nprobe probing with (desc sim, asc cid) ties."""
    dim = EMB_DIM
    # best-by-cosine helper: pick n_best centroids per row of src
    best = """
  SELECT * FROM (
    SELECT s.*, c.cid, c.center,
           row_number() OVER (PARTITION BY s.{id} ORDER BY
             list_sum(list_transform(range(1, {dim} + 1),
               i -> s.{vc}[i] * c.center[i]))
             / (sqrt(list_sum(list_transform(s.{vc}, x -> x * x)))
                * sqrt(list_sum(list_transform(c.center, x -> x * x))))
             DESC, c.cid ASC) AS _r
    FROM {src} s, {cents} c
  ) WHERE _r <= {nbest}"""
    cent = """
  SELECT cid, list(m ORDER BY pos) AS center FROM (
    SELECT cid, r.i AS pos,
           CAST(SUM(CAST(FLOOR(a.v[r.i] * 1048576) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 1048576.0 AS m
    FROM {assign} a, range(1, {dim} + 1) r(i)
    GROUP BY cid, r.i
  ) GROUP BY cid"""
    return """
WITH q AS (SELECT vec_id AS qid,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
cnt AS (SELECT GREATEST(COUNT(*) // {nlist}, 1) AS stride FROM v),
seeds AS (SELECT vec_id AS cid, v AS center FROM v, cnt
          WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT {nlist}),
a1 AS ({a1}),
c1 AS ({c1}),
a2 AS ({a2}),
c2 AS ({c2}),
av AS ({av}),
qp AS ({qp}),
scored AS (
  SELECT DISTINCT q.qid, v.vec_id, {cos} AS cosine
  FROM av JOIN qp USING (cid)
       JOIN v ON v.vec_id = av.vec_id
       JOIN q ON q.qid = qp.qid
)
SELECT qid, vec_id, rank FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
""".format(
        nlist=nlist, k=k,
        a1=best.format(id="vec_id", vc="v", src="v", cents="seeds",
                       nbest=1, dim=dim),
        c1=cent.format(assign="a1", dim=dim),
        a2=best.format(id="vec_id", vc="v", src="v", cents="c1",
                       nbest=1, dim=dim),
        c2=cent.format(assign="a2", dim=dim),
        av=best.format(id="vec_id", vc="v", src="v", cents="c2",
                       nbest=1, dim=dim),
        qp=best.format(id="qid", vc="qv", src="q", cents="c2",
                       nbest=nprobe, dim=dim),
        cos=_COSINE_EXPR,
    )


# exact cosine pairs over the duplicated embedding corpus, same float
# accumulation order as the Spark side
_EMB_NEAR_DUP_SQL = """
WITH emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 10 = 0
),
v AS (SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM emb2),
s AS (
  SELECT a.id AS a, b.id AS b,
    list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
    / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
  FROM v a JOIN v b ON a.id < b.id
)
SELECT a, b, CAST(FLOOR(cosine * 10000) AS BIGINT) AS cos_bp
FROM s WHERE cosine >= 0.99
"""

_DEDUP_EXACT_SQL = """
SELECT md5(text) AS fingerprint, COUNT(*) AS n_dups,
       MIN(doc_id) AS canonical_id,
       array_to_string(list_slice(list_sort(list(doc_id)), 1, 100), ',') AS dup_ids
FROM ({dup}) GROUP BY md5(text) HAVING COUNT(*) > 1
""".format(dup=_DUP_CORPUS_SQL)

_TOKEN_COUNTS_SQL = """
SELECT doc_id AS id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) AS n_chars_actual
FROM documents
"""

# same lookahead-free pattern as quality.BPE_TOKEN_PATTERN (Java regex
# and RE2 count identically on it)
_BPE_TOKEN_COUNTS_SQL = """
SELECT doc_id AS id,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
         AS BIGINT) AS n_bpe_tokens,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens
FROM documents
"""

_QUALITY_FUNNEL_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
    length(text) AS n,
    CAST(FLOOR((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS punct_bp,
    CAST(FLOOR((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS digit_bp
  FROM documents
),
flagged AS (
  SELECT CASE
    WHEN n < 200 THEN 'too_short'
    WHEN n > 100000 THEN 'too_long'
    WHEN punct_bp > 2000 THEN 'too_much_punct'
    WHEN digit_bp > 2000 THEN 'too_many_digits'
    WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 'lang'
  END AS r FROM scored
)
SELECT COALESCE(r, 'kept') AS stage, COUNT(*) AS n_docs FROM flagged GROUP BY 1
UNION ALL
SELECT 'input', COUNT(*) FROM documents
"""

_DATASET_SPLIT_SQL = """
WITH b AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(1, 16), i ->
      CAST(strpos('0123456789abcdef',
                  substring(md5('v1|' || CAST(doc_id AS VARCHAR)), i, 1)) - 1
           AS BIGINT) << ((15 - i) * 4))) % 100 AS BIGINT) AS bk
  FROM documents
)
SELECT CASE WHEN bk < 5 THEN 'val' WHEN bk < 10 THEN 'test'
            ELSE 'train' END AS split,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_id, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM b GROUP BY 1
"""

_QUALITY_SQL = """
SELECT doc_id AS id,
  length(text) AS n_chars_actual,
  len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
  CAST(FLOOR((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS punct_bp,
  CAST(FLOOR((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS upper_bp,
  CAST(FLOOR((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS digit_bp,
  CAST(FLOOR((length(text) - length(regexp_replace(text, '\\s', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS space_bp,
  CAST(FLOOR(length(regexp_replace(text, '\\s', '', 'g')) * 100.0 / len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS mean_wordlen_c
FROM documents
"""

_STOP = {
    "de": ["der", "und", "das"],
    "en": ["the", "and", "of"],
    "es": ["el", "y", "los"],
    "fr": ["le", "et", "les"],
    "zh": ["的", "是", "了"],
}


def _lang_score_sql(lg):
    terms = []
    for w in _STOP[lg]:
        token = " %s " % w
        terms.append(
            "(length(p) - length(replace(p, '{t}', ''))) / {n}".format(
                t=token, n=len(token))
        )
    return "CAST(%s AS BIGINT)" % " + ".join(terms)


_LANG_ID_SQL = (
    "WITH s AS (SELECT doc_id AS id, ' ' || lower(text) || ' ' AS p FROM documents),\n"
    "sc AS (SELECT id, "
    + ", ".join("%s AS s_%s" % (_lang_score_sql(lg), lg) for lg in sorted(_STOP))
    + ", greatest("
    + ", ".join(_lang_score_sql(lg) for lg in sorted(_STOP))
    + ") AS best FROM s)\n"
    "SELECT id, CASE "
    + " ".join("WHEN best > 0 AND s_%s = best THEN '%s'" % (lg, lg)
               for lg in sorted(_STOP))
    + " ELSE 'und' END AS lang_pred FROM sc"
)

_FINGERPRINT_SQL = """
SELECT doc_id AS id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""

_MULTIMODAL_SQL = """
SELECT doc_id AS id, 'text' AS modality,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""

def _kg_degrees_sql(triples_sql: str) -> str:
    return """
WITH e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({t})
           WHERE obj_kind = 'iri'),
o AS (SELECT src AS node, COUNT(*) AS out_degree FROM e GROUP BY src),
i AS (SELECT dst AS node, COUNT(*) AS in_degree FROM e GROUP BY dst)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree
FROM o FULL JOIN i ON o.node = i.node
""".format(t=triples_sql)


def _kg_pagerank_sql(triples_sql: str, iters: int = 10) -> str:
    """Integer fixed-point PageRank, the 10 rounds unrolled as chained
    CTEs — DuckDB SUM(BIGINT) widens to HUGEINT, hence the outer CAST;
    all arithmetic is exact so the Spark plan matches bit-for-bit."""
    from rdf_rdfa_spark.pipeline.graphops import (
        BASE, DAMP_DEN, DAMP_NUM, SCALE)

    rounds = []
    for k in range(1, iters + 1):
        # d{k}: dangling mass of round k-1 (nodes with no out-edges);
        # every node receives dang // n_nodes before damping — the
        # integer teleport, spelled exactly like graphops.pagerank
        rounds.append("""
d{k} AS MATERIALIZED (SELECT COALESCE(SUM(pr), 0) AS dang FROM r{km1} r
         WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = r.node)),
r{k} AS MATERIALIZED (
  SELECT n.node,
         CAST({base} + {dn} * (COALESCE(SUM(c.contrib), 0)
                               + ANY_VALUE(x.dang) // ANY_VALUE(x.n)) // {dd}
              AS BIGINT) AS pr
  FROM nodes n
  CROSS JOIN (SELECT d.dang AS dang, nn.n AS n FROM d{k} d, nn) x
  LEFT JOIN (
    SELECT e.dst AS node, r.pr // od.outdeg AS contrib
    FROM e JOIN r{km1} r ON r.node = e.src
           JOIN od ON od.src = e.src
  ) c ON c.node = n.node
  GROUP BY n.node
)""".format(k=k, km1=k - 1, base=BASE, dn=DAMP_NUM, dd=DAMP_DEN))
    return """
WITH e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM ({t})
           WHERE obj_kind = 'iri'),
nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
od AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes),
{rounds}
SELECT node, pr FROM r{iters}
""".format(t=triples_sql, scale=SCALE, rounds=",".join(rounds),
           iters=iters)


# resize/frame-sample stubs are deterministic functions of the source
# bytes, so the full mapInPandas fan-out is value-oracled in SQL;
# strlen() = BYTE length in DuckDB (length() counts characters)
_MULTIMODAL_RESIZE_SQL = """
SELECT doc_id AS id, 'text' AS modality,
       CASE WHEN strlen(text) > 0 THEN 32 END AS width,
       CASE WHEN strlen(text) > 0 THEN 32 END AS height,
       CASE WHEN strlen(text) > 0 THEN md5(text || ':32x32') END
         AS payload_md5
FROM documents
"""

_MULTIMODAL_FRAMES_SQL = """
SELECT doc_id AS id, CAST(r.i AS INTEGER) AS frame_idx,
       md5(text || ':' || CAST(r.i AS VARCHAR)) AS frame_md5
FROM documents, range(0, 8) r(i)
WHERE strlen(text) > 0 AND r.i <= strlen(text) % 8
"""

_PROCESSOR_COUNTS_SQL = """
SELECT pred, n FROM (
  SELECT '{t}' AS pred, COUNT(*) AS n FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT 'http://purl.org/dc/terms/description', COUNT(*) FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT 'http://www.w3.org/ns/rdfa#context', COUNT(*) FROM documents WHERE doc_id % 13 = 0
) WHERE n > 0
""".format(t=_RDF_TYPE)


_KG_BGP_SQL = """
WITH t AS ({t})
SELECT DISTINCT p1.subj AS d, p3.obj AS g, p2.obj AS m
FROM t p1
JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'http://schema.org/genre'
LEFT JOIN t p2 ON p2.subj = p1.subj
              AND p2.pred = 'http://schema.org/sameAs'
WHERE p1.pred = '{rdf_type}' AND p1.obj = 'http://schema.org/Article'
"""

_KG_SPARQL_SUB_SQL = """
WITH t AS ({t}),
sol AS (
  SELECT DISTINCT p1.subj AS d, p3.obj AS g
  FROM t p1
  JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'http://schema.org/genre'
  WHERE p1.pred = '{rdf_type}' AND p1.obj = 'http://schema.org/Article'
),
mg AS (
  -- the engine's subquery counts over its DISTINCT (x, g, m)
  -- solution set; replay exactly
  SELECT g FROM (
    SELECT DISTINCT p1.subj AS x, p1.obj AS g, p2.obj AS m
    FROM t p1
    JOIN t p2 ON p2.subj = p1.subj
             AND p2.pred = 'http://schema.org/sameAs'
    WHERE p1.pred = 'http://schema.org/genre'
  ) GROUP BY g HAVING COUNT(*) >= 3
)
SELECT d, g FROM sol JOIN mg USING (g) ORDER BY d, g LIMIT 120
"""

_KG_BGP_MINUS_SQL = """
WITH t AS ({t})
SELECT DISTINCT p1.subj AS d, p3.obj AS g
FROM t p1
JOIN t p3 ON p3.subj = p1.subj AND p3.pred = 'http://schema.org/genre'
WHERE p1.pred = '{rdf_type}' AND p1.obj = 'http://schema.org/Article'
  AND NOT EXISTS (SELECT 1 FROM t p2 WHERE p2.subj = p1.subj
                  AND p2.pred = 'http://schema.org/sameAs')
ORDER BY d, g LIMIT 100
"""


def oracle_sql() -> dict[str, str]:
    triples = corpus.triples_oracle_sql()
    return {
        "rdfa_extract": triples,
        # batch ≡ stream: the streaming sink must match the SAME oracle
        "stream_extract": triples,
        "kg_degrees": _kg_degrees_sql(triples),
        "kg_pagerank": _kg_pagerank_sql(triples),
        "writer_roundtrip": (
            "SELECT url, COUNT(*) AS n_triples FROM (%s) GROUP BY url"
            % triples
        ),
        "rdfa_pred_counts": (
            "SELECT pred, COUNT(*) AS n FROM (%s) GROUP BY pred" % triples
        ),
        "rdfa_text_identity": "SELECT CAST(NULL AS VARCHAR) AS url WHERE 1=0",
        "rdfa_processor_counts": _PROCESSOR_COUNTS_SQL,
        "kg_bgp": _KG_BGP_SQL.format(t=triples, rdf_type=_RDF_TYPE),
        "kg_bgp_minus": _KG_BGP_MINUS_SQL.format(t=triples,
                                                 rdf_type=_RDF_TYPE),
        "kg_bgp_path": _KG_BGP_PATH_SQL,
        "kg_bgp_path_seeded": _KG_BGP_PATH_SEEDED_SQL,
        "kg_bgp_agg": _KG_BGP_AGG_SQL.format(t=triples,
                                             rdf_type=_RDF_TYPE),
        # the SPARQL-text path shares kg_bgp_minus's oracle: same
        # solution set, authored as a query string instead of an AST
        "kg_sparql": _KG_BGP_MINUS_SQL.format(t=triples,
                                              rdf_type=_RDF_TYPE),
        "kg_sparql_meta": (
            "SELECT subj AS d, pred AS p, obj AS v FROM (%s) "
            "WHERE datatype = 'http://www.w3.org/2001/XMLSchema#integer'"
            " OR lang = 'en'" % triples),
        # GRAPH <processor> scoping ≡ the processor-counts oracle
        # (distinct (s,p,o) = raw counts: processor bnodes are
        # skolemized per document, so nothing collapses)
        "kg_sparql_sub": _KG_SPARQL_SUB_SQL.format(t=triples,
                                                   rdf_type=_RDF_TYPE),
        # genre→category rename: the update's DELETE removes every
        # (d, genre, g) row and the INSERT adds one distinct
        # (d, category, g) per solution — with per-document unique
        # subjects that is exactly a predicate rewrite
        "kg_sparql_update": (
            "SELECT subj, CASE WHEN pred = 'http://schema.org/genre' "
            "THEN 'http://schema.org/category' ELSE pred END AS pred, "
            "obj FROM (%s)" % triples),
        "kg_sparql_describe": (
            "SELECT subj, pred, obj FROM (%s) WHERE subj IN ("
            "SELECT DISTINCT subj FROM (%s) WHERE "
            "pred = 'http://schema.org/genre' AND obj = 'src0')"
            % (triples, triples)),
        "kg_sparql_graph": _PROCESSOR_COUNTS_SQL.replace(
            "SELECT pred, n FROM", "SELECT pred AS p, n FROM"),
        "entail_classes": _ENTAIL_CLASSES_SQL,
        "entail_props": _ENTAIL_PROPS_SQL,
        "entity_link_sameas": _ENTITY_LINK_SQL,
        "host_rollup": (
            "SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host, "
            "COUNT(*) AS n_triples FROM (%s) GROUP BY 1" % triples
        ),
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_minhash": _DEDUP_MINHASH_SQL,
        "dedup_minhash_capped": _dedup_minhash_capped_sql(),
        "boilerplate_strip": _BOILERPLATE_SQL,
        "dedup_simhash": _DEDUP_SIMHASH_SQL,
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        "events_session_windows": _SESSION_WINDOWS_SQL,
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "dedup_keep_best": _DEDUP_KEEP_BEST_SQL.format(
            clusters=_DEDUP_CLUSTERS_SQL, dup=_DUP_CORPUS_SQL),
        "ann_cosine_topk": _ANN_COSINE_SQL,
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ivf_sql(nlist=8, nprobe=4, k=10),
        "emb_near_dup": _EMB_NEAR_DUP_SQL,
        "emb_near_dup_lsh": _EMB_NEAR_DUP_SQL,
        "token_counts": _TOKEN_COUNTS_SQL,
        "bpe_token_counts": _BPE_TOKEN_COUNTS_SQL,
        "quality_scores": _QUALITY_SQL,
        "quality_funnel": _QUALITY_FUNNEL_SQL,
        "dataset_split": _DATASET_SPLIT_SQL,
        "lang_id": _LANG_ID_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        "multimodal_features": _MULTIMODAL_SQL,
        "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
        "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(FLOOR(SUM(value * 100)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2""",
        "events_sessions": """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id""",
        "events_props": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n
FROM events GROUP BY 1""",
        # dedup_minhash / dedup_simhash / dedup_clusters / ann_*: hash- or
        # float-order-dependent → rows-only driver check; exactness is
        # covered by pytest against numpy/brute-force references.
    }
