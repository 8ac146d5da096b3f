"""rdf_rdfa_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
ruby-rdf/rdf-rdfa (RDFa 1.1 Core + HTML5 host language).

Layout:
  rdfa/      pure-Python RDFa 1.1 parser (runs inside Arrow/pandas UDFs)
  pipeline/  distributed stages: extract, expand (entailment), fold,
             link (entity linking), canonicalize (MinHash), materialize
  textops/   training-data ops: dedup, quality, language-ID, similarity

Reference parity is cited per-module as /root/reference/<file>:<line>.
"""

__version__ = "0.1.0"

# convenience top-level API
from .rdfa.walk import parse_rdfa  # noqa: E402,F401


def extract_triples(pages_df, **kw):
    """Lazy import wrapper (keeps `import rdf_rdfa_spark` Spark-free
    for pure-parser users)."""
    from .pipeline.extract import extract_triples as _et

    return _et(pages_df, **kw)
