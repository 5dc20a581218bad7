"""OWL / RDF-XML -> ``triples`` parquet prep job.

The reference loads ontologies with ``rdflib.Graph().parse(path,
format="xml")`` (thesis/main.py:37-41, thesis/pre_processing_data.py:28-29)
and then walks the graph in Python. This engine's operators instead start
from a flat ``triples`` table (subject, predicate, object, lang) —
SURVEY.md §2.1 allows a driver-side prep script, and this is it: it turns
real OWL files (e.g. the OAEI bio-ml snomed/fma bodies) into that table.

Parsing strategy:

* **rdflib when importable** (exactly the reference's parser — full RDF/XML
  support including striped syntax and blank nodes);
* **contained fallback parser** otherwise (this sandbox ships no rdflib):
  a streaming ``xml.etree.ElementTree.iterparse`` pass recognizing the
  node-element + property-element shape that OWL exporters emit —
  ``<owl:Class rdf:about=...>`` / ``<rdf:Description rdf:about=...>`` with
  child elements carrying ``rdf:resource`` (object triples) or text
  (literal triples, ``xml:lang`` captured). owl:Restriction blank nodes
  under subClassOf are skipped, matching what the reference's
  ``extract_hierarchy`` keeps (URIRef objects only,
  thesis/process_data_features.py:98-102). Constant memory: elements are
  cleared as soon as each top-level node closes.

Scale shape: one ontology file is one unsplittable XML document, so
parallelism is per FILE, not per byte — ``prepare_ontologies`` ships the
path list through ``spark.createDataFrame(...).repartition(len(paths))``
and parses inside ``mapInPandas`` (one executor task per ontology, the
same pattern a 1000-file corpus would use on a cluster with shared
storage). OAEI-class files (~100 MB) parse in seconds; the output parquet
is what every downstream operator reads, so the XML cost is paid once.

Well-known predicate IRIs are folded to the engine's CURIE forms
(PipelineConfig.predicates defaults); everything else keeps its full IRI —
``extract_labels`` / ``extract_hierarchy`` filter by predicate anyway.
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET
from collections.abc import Iterable, Iterator

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

# full-IRI -> engine CURIE (PipelineConfig.predicates defaults)
CURIE = {
    "http://www.w3.org/2000/01/rdf-schema#label": "rdfs:label",
    "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym": "obo:hasExactSynonym",
    "http://www.w3.org/2004/02/skos/core#prefLabel": "rdfs:label",
    "http://www.w3.org/2004/02/skos/core#altLabel": "obo:hasExactSynonym",
    "http://www.w3.org/2000/01/rdf-schema#subClassOf": "rdfs:subClassOf",
    "http://www.w3.org/2004/02/skos/core#broader": "rdfs:subClassOf",
    "http://www.w3.org/2004/02/skos/core#exactMatch": "skos:exactMatch",
}

Triple = tuple[str, str, str, str | None]


def _fold(iri: str) -> str:
    return CURIE.get(iri, iri)


def _expand(tag: str) -> str:
    # ElementTree gives tags as {namespace}local
    return tag[1:].replace("}", "", 1) if tag.startswith("{") else tag


def parse_rdfxml(source) -> Iterator[Triple]:
    """Stream (subject, predicate, object, lang) from an RDF/XML file.

    ``source``: path or file-like. Handles the node/property striping OWL
    exporters produce; nested node elements (e.g. a class description
    inlined under subClassOf) contribute their ``rdf:about`` as the object
    and are then walked as subjects themselves. Anonymous restriction
    nodes yield no triple.
    """
    about_attr = f"{{{RDF_NS}}}about"
    id_attr = f"{{{RDF_NS}}}ID"
    resource_attr = f"{{{RDF_NS}}}resource"
    lang_attr = f"{{{XML_NS}}}lang"

    # stack entries: (element, kind) where kind is "node" (has a subject),
    # "prop" (property element under a node), or "anon" (blank node)
    stack: list[tuple[ET.Element, str, str | None]] = []

    for event, elem in ET.iterparse(source, events=("start", "end")):
        if event == "start":
            subj = elem.get(about_attr)
            if subj is None and elem.get(id_attr) is not None:
                subj = "#" + elem.get(id_attr)
            depth_kind = stack[-1][1] if stack else "prop"
            if depth_kind in ("prop",):  # children of property elems / root are nodes
                if subj is not None:
                    stack.append((elem, "node", subj))
                elif _expand(elem.tag) == RDF_NS + "RDF":
                    stack.append((elem, "prop", None))  # root acts like a property slot
                else:
                    stack.append((elem, "anon", None))
            else:  # child of a node (or anon) element = property element
                stack.append((elem, "prop", None))
            continue

        # end event
        _, kind, subj = stack.pop()
        if kind == "prop" and stack:
            parent_kind, parent_subj = stack[-1][1], stack[-1][2]
            if parent_kind == "node" and parent_subj is not None:
                pred = _fold(_expand(elem.tag))
                res = elem.get(resource_attr)
                if res is not None:
                    yield (parent_subj, pred, res, None)
                elif len(elem) == 0 and elem.text is not None and elem.text.strip():
                    yield (
                        parent_subj, pred, elem.text.strip(),
                        elem.get(lang_attr),
                    )
                # nested node-element objects are emitted at the nested
                # node's own end event (its subtree is cleared by then)
        elif kind == "node" and subj is not None:
            # rdf:type from the element name itself (owl:Class etc.)
            tag_iri = _expand(elem.tag)
            if tag_iri != RDF_NS + "Description":
                yield (subj, RDF_NS + "type", tag_iri, None)
            # inlined node description as a property object:
            # <node A> <prop P> <node B rdf:about=...> => (A, P, B)
            if (
                len(stack) >= 2
                and stack[-1][1] == "prop"
                and stack[-2][1] == "node"
                and stack[-2][2] is not None
            ):
                yield (stack[-2][2], _fold(_expand(stack[-1][0].tag)), subj, None)
        if not stack or stack[-1][1] != "node":
            # safe to free: nothing above still needs this subtree
            elem.clear()


def parse_with_rdflib(path: str) -> Iterator[Triple]:
    """The reference's own parser, when the lib is present."""
    from rdflib import Graph, Literal, URIRef

    g = Graph()
    g.parse(path, format="xml")
    for s, p, o in g:
        if not isinstance(s, URIRef):
            continue  # blank-node subjects (restrictions) carry no label/edge
        if isinstance(o, Literal):
            yield (str(s), _fold(str(p)), str(o), o.language)
        elif isinstance(o, URIRef):
            yield (str(s), _fold(str(p)), str(o), None)


def parse_ontology(path: str) -> Iterator[Triple]:
    try:
        import rdflib  # noqa: F401
        return parse_with_rdflib(path)
    except ImportError:
        return parse_rdfxml(path)


def prepare_ontologies(spark, paths_with_sides: list[tuple[str, str]]):
    """[(owl_path, side)] -> triples DataFrame (+side column).

    One Spark task per file: XML is unsplittable, so the file is the unit
    of parallelism (a 1000-ontology corpus = 1000 parallel parse tasks).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from ontology_mapping_spark import schemas

    files = spark.createDataFrame(
        paths_with_sides, "path string, side string"
    ).repartition(len(paths_with_sides))

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, side in zip(pdf["path"], pdf["side"]):
                rows = list(parse_ontology(path))
                if rows:
                    yield pd.DataFrame(
                        {
                            "subject": [r[0] for r in rows],
                            "predicate": [r[1] for r in rows],
                            "object": [r[2] for r in rows],
                            "lang": [r[3] for r in rows],
                            "side": side,
                        }
                    )

    # copy, don't .add(): StructType.add mutates the shared module schema
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(schemas.TRIPLES.fields) + [T.StructField("side", T.StringType(), True)]
    )
    return files.mapInPandas(run, schema=out_schema)


def main(argv: list[str]) -> int:
    """prepare_ontology.py SRC.owl TGT.owl OUT_DIR -> OUT_DIR/triples.parquet"""
    if len(argv) != 3:
        print(__doc__)
        print("usage: prepare_ontology.py <src.owl> <tgt.owl> <out_dir>")
        return 2
    src, tgt, out = argv
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ontology_mapping_spark.session import get_spark

    spark = get_spark("prepare_ontology")
    df = prepare_ontologies(spark, [(src, "src"), (tgt, "tgt")])
    df.write.mode("overwrite").parquet(os.path.join(out, "triples.parquet"))
    n = spark.read.parquet(os.path.join(out, "triples.parquet")).count()
    print(f"wrote {n} triples to {out}/triples.parquet")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
