"""OWL/RDF-XML prep tool: parse -> triples parquet -> label/hierarchy
extraction, checked against the pure-Python oracle on the same triples.

The reference's input path is ``rdflib.Graph().parse(path, format="xml")``
(thesis/main.py:37-41); here the tool's fallback parser (rdflib is absent
in this container) must feed the engine the same flat triples the
fixtures do. When rdflib IS importable, the equivalence test below also
runs the tool's rdflib path and demands identical label/edge sets.
"""

from __future__ import annotations

import io
import sys

import pytest

sys.path.insert(0, "/root/repo")
from tools.prepare_ontology import parse_ontology, parse_rdfxml, prepare_ontologies

from ontology_mapping_spark.operators.labels import extract_hierarchy, extract_labels
from tests import oracle

SRC_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:obo="http://www.geneontology.org/formats/oboInOwl#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#">
  <owl:Class rdf:about="http://src/Lung">
    <rdfs:label xml:lang="en">Lung</rdfs:label>
    <obo:hasExactSynonym>  Pulmo  </obo:hasExactSynonym>
    <rdfs:subClassOf rdf:resource="http://src/Organ"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="http://src/partOf"/>
        <owl:someValuesFrom rdf:resource="http://src/Thorax"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <skos:exactMatch rdf:resource="http://tgt/Lung"/>
  </owl:Class>
  <owl:Class rdf:about="http://src/LeftLung">
    <rdfs:label>Left lung</rdfs:label>
    <rdfs:subClassOf>
      <owl:Class rdf:about="http://src/Lung"/>
    </rdfs:subClassOf>
  </owl:Class>
  <rdf:Description rdf:about="http://src/Organ">
    <rdfs:label>ORGAN </rdfs:label>
  </rdf:Description>
</rdf:RDF>"""

TGT_OWL = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#">
  <owl:Class rdf:about="http://tgt/Lung">
    <rdfs:label>lung</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://tgt/BodyPart"/>
  </owl:Class>
</rdf:RDF>"""


def _expected_triples():
    return [
        {"subject": s, "predicate": p, "object": o}
        for s, p, o, _ in parse_rdfxml(io.StringIO(SRC_OWL))
    ] + [
        {"subject": s, "predicate": p, "object": o}
        for s, p, o, _ in parse_rdfxml(io.StringIO(TGT_OWL))
    ]


def test_parser_core_shapes():
    got = list(parse_rdfxml(io.StringIO(SRC_OWL)))
    # literal with lang; whitespace preserved for the engine to strip
    assert ("http://src/Lung", "rdfs:label", "Lung", "en") in got
    assert ("http://src/Lung", "obo:hasExactSynonym", "Pulmo", None) in got
    # resource-valued subClassOf kept, restriction blank node skipped
    assert ("http://src/Lung", "rdfs:subClassOf", "http://src/Organ", None) in got
    assert not any(
        p == "rdfs:subClassOf" and o.startswith("http://src/Thorax")
        for _, p, o, _ in got
    )
    # inlined class description contributes an edge
    assert ("http://src/LeftLung", "rdfs:subClassOf", "http://src/Lung", None) in got
    assert ("http://src/Lung", "skos:exactMatch", "http://tgt/Lung", None) in got


def test_owl_roundtrip_matches_oracle(spark, tmp_path):
    src = tmp_path / "src.owl"
    tgt = tmp_path / "tgt.owl"
    src.write_text(SRC_OWL)
    tgt.write_text(TGT_OWL)

    triples = prepare_ontologies(spark, [(str(src), "src"), (str(tgt), "tgt")])
    out = tmp_path / "triples.parquet"
    triples.write.mode("overwrite").parquet(str(out))
    flat = spark.read.parquet(str(out))
    assert set(flat.columns) == {"subject", "predicate", "object", "lang", "side"}
    assert flat.filter("side = 'tgt'").count() > 0

    labels = {
        r["uri"]: list(r["labels"]) for r in extract_labels(flat).collect()
    }
    want_labels = oracle.extract_labels(_expected_triples())
    assert labels == want_labels
    # the engine lowercases+strips: the decorated "  Pulmo  "/"ORGAN " land clean
    assert labels["http://src/Lung"] == ["lung", "pulmo"]
    assert labels["http://src/Organ"] == ["organ"]

    edges = {
        (r["child"], r["parent"]) for r in extract_hierarchy(flat).collect()
    }
    assert edges == set(oracle.extract_edges(_expected_triples()))


def test_rdflib_path_equivalence(tmp_path):
    """When rdflib is present, the tool's rdflib path must produce the
    same label/edge-relevant triples as the fallback parser. Skips
    cleanly in containers without rdflib (this sandbox)."""
    pytest.importorskip("rdflib")
    from tools.prepare_ontology import parse_with_rdflib

    p = tmp_path / "src.owl"
    p.write_text(SRC_OWL)
    keep = {"rdfs:label", "obo:hasExactSynonym", "rdfs:subClassOf", "skos:exactMatch"}
    # rdflib preserves literal whitespace; the fallback parser strips it
    # (elem.text.strip()) — compare on stripped literals, which is also
    # what the engine's extract_labels normalizes away anyway
    via_rdflib = {
        (t[0], t[1], t[2].strip()) for t in parse_with_rdflib(str(p)) if t[1] in keep
    }
    via_fallback = {
        (t[0], t[1], t[2].strip())
        for t in parse_rdfxml(io.StringIO(SRC_OWL))
        if t[1] in keep
    }
    assert via_rdflib == via_fallback


def test_parse_ontology_dispatch(tmp_path):
    p = tmp_path / "one.owl"
    p.write_text(TGT_OWL)
    got = list(parse_ontology(str(p)))
    assert ("http://tgt/Lung", "rdfs:subClassOf", "http://tgt/BodyPart", None) in got


# ---- OAEI-scale shape: ~100 MB striped OWL, constant memory (round 3) ----

_BIG_OWL_HEADER = (
    '<?xml version="1.0"?>\n'
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
    '         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"\n'
    '         xmlns:owl="http://www.w3.org/2002/07/owl#"\n'
    '         xmlns:obo="http://www.geneontology.org/formats/oboInOwl#">\n'
)

_BIG_OWL_CLASS = (
    '  <owl:Class rdf:about="http://big/C%d">\n'
    '    <rdfs:label xml:lang="en">concept %d of the synthetic terminology '
    "with a realistically verbose clinical-style preferred term</rdfs:label>\n"
    '    <obo:hasExactSynonym>synonym %d padded with enough descriptive '
    "filler text to emulate an OAEI-class ontology body</obo:hasExactSynonym>\n"
    '    <rdfs:subClassOf rdf:resource="http://big/C%d"/>\n'
    "    <rdfs:subClassOf>\n"
    "      <owl:Restriction>\n"
    '        <owl:onProperty rdf:resource="http://big/partOf"/>\n'
    '        <owl:someValuesFrom rdf:resource="http://big/C%d"/>\n'
    "      </owl:Restriction>\n"
    "    </rdfs:subClassOf>\n"
    "  </owl:Class>\n"
)


def write_big_owl(path: str, n_classes: int) -> None:
    """Stream a striped-syntax OWL body with blank-node restrictions to
    disk in constant memory (the writer must not be the thing that
    allocates 100 MB either)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(_BIG_OWL_HEADER)
        for i in range(n_classes):
            f.write(_BIG_OWL_CLASS % (i, i, i, i // 2, (i * 7) % n_classes))
        f.write("</rdf:RDF>\n")


_BIG_PARSE_DRIVER = """
import json, resource, sys
sys.path.insert(0, "/root/repo")
from tools.prepare_ontology import parse_rdfxml
counts = {}
for s, p, o, lang in parse_rdfxml(sys.argv[1]):
    counts[p] = counts.get(p, 0) + 1
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps({"counts": counts, "peak_mb": peak_mb}))
"""


def test_big_owl_constant_memory(tmp_path):
    """~100 MB OWL through the fallback parser in a fresh subprocess:
    triple counts exact, peak RSS bounded far below the document size
    (a DOM-building parse holds >= 5x the file; streaming holds ~none)."""
    import json
    import os
    import subprocess

    n = 150_000
    owl = tmp_path / "big.owl"
    write_big_owl(str(owl), n)
    size_mb = os.path.getsize(owl) / 1e6
    assert size_mb > 90, f"generator produced only {size_mb:.0f} MB"
    out = subprocess.run(
        [sys.executable, "-c", _BIG_PARSE_DRIVER, str(owl)],
        capture_output=True,
        text=True,
        check=True,
        timeout=300,
    )
    r = json.loads(out.stdout)
    # every class: 1 type + 1 label + 1 synonym + 1 resource subClassOf;
    # the restriction blank node under the second subClassOf yields none
    assert r["counts"]["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"] == n
    assert r["counts"]["rdfs:label"] == n
    assert r["counts"]["obo:hasExactSynonym"] == n
    assert r["counts"]["rdfs:subClassOf"] == n
    assert sum(r["counts"].values()) == 4 * n
    assert r["peak_mb"] < 300, (
        f"peak RSS {r['peak_mb']:.0f} MB for a {size_mb:.0f} MB document — "
        "the streaming parse is holding the tree"
    )


def test_prepare_ontologies_parallelism_is_per_file(spark, tmp_path):
    # one unsplittable XML file = one task: N files must land in N
    # partitions of the parse stage
    paths = []
    for i in range(3):
        p = tmp_path / f"o{i}.owl"
        write_big_owl(str(p), 5)
        paths.append((str(p), "src" if i == 0 else "tgt"))
    df = prepare_ontologies(spark, paths)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 3 * 5 * 4
