"""ontology_mapping_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference repo ``valeriasepicacchi/ontology_mapping`` (single-process
pandas/networkx/sklearn thesis code) as distributed Spark DataFrame dataflow:

* triple extraction from Common-Crawl-style web pages,
* entity linking (candidate blocking, pairwise features, voting ensemble),
* canonicalization (connected components over similarity edges),
* graph materialization to partitioned tables with lineage manifests.

Everything is DataFrame-first: fixed explicit schemas, Catalyst-optimizable
built-in expressions wherever possible, vectorized pandas/Arrow UDFs as the
only Python execution, deterministic hashing instead of process-dependent
randomness. See SURVEY.md for the operator-by-operator mapping to the
reference (every module cites reference file:line in its docstrings).
"""

__version__ = "0.1.0"
