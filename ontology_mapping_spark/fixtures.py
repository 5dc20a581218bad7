"""Deterministic synthetic fixtures (FIXTURES.md contract, seed=42).

Generates, in pure Python (shared verbatim with the pytest oracle):

* ``triples``    — two ontology sides (src/tgt) flattened to (subject,
                   predicate, object, lang) rows: prefLabels, synonyms,
                   subClassOf tree (+ a multi-parent DAG slice), exactMatch
                   links. Mirrors what the reference parses from OWL
                   (thesis/main.py:37-46).
* ``alignments`` — true (SrcEntity, TgtEntity, Score) pairs split
                   train/test (thesis/main.py:53-62 TSV shape).
* ``web_pages``  — Common-Crawl-style pages (BASELINE.json input_hint
                   shape) whose html embeds the ground-truth text inside
                   boilerplate; text plants 0-5 concept labels per page with
                   known gold (url, concept) mentions.

Everything is derived from ``random.Random(seed)`` — no uuid4, no
wall-clock, no numpy RNG — so the same call always yields byte-identical
rows (FIXTURES.md §5 determinism rules).
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass, field

P_LABEL = "rdfs:label"
P_SYNONYM = "obo:hasExactSynonym"
P_SUBCLASS = "rdfs:subClassOf"
P_EXACT = "skos:exactMatch"

_VOCAB_STEMS = [
    "gland", "tissue", "membrane", "nerve", "artery", "vein", "muscle",
    "bone", "joint", "cortex", "lobe", "duct", "node", "cell", "fiber",
    "tract", "plexus", "fossa", "canal", "sinus", "valve", "chamber",
    "vessel", "organ", "capsule", "ligament", "tendon", "cartilage",
    "marrow", "follicle", "mucosa", "serosa", "ganglion", "nucleus",
    "segment", "branch", "trunk", "root", "apex", "base", "body", "head",
    "neck", "surface", "border", "margin", "process", "ridge", "groove",
    "notch",
]
_MODIFIERS = [
    "anterior", "posterior", "superior", "inferior", "medial", "lateral",
    "proximal", "distal", "left", "right", "deep", "superficial", "upper",
    "lower", "central", "peripheral", "primary", "secondary", "internal",
    "external", "thoracic", "lumbar", "cervical", "cranial", "caudal",
    "dorsal", "ventral", "axial", "radial", "ulnar", "femoral", "tibial",
]
# sprinkled to exercise normalization ops (thesis/normalization.py:190-359)
_DECOR = ["α", "β", "γ", "–", "’", "é"]

# filler vocabulary disjoint from concept labels (keeps mention density real)
_FILLER_ADJ = [
    "initial", "final", "repeated", "standard", "combined", "separate",
    "observed", "expected", "recorded", "published", "routine", "detailed",
]
_FILLER_NOUN = [
    "analysis", "protocol", "measurement", "survey", "review", "cohort",
    "baseline", "followup", "interval", "session", "report", "estimate",
]

_EPOCH = _dt.datetime(2020, 1, 1, tzinfo=_dt.timezone.utc)


@dataclass
class Fixture:
    triples: list[dict] = field(default_factory=list)
    alignments_train: list[dict] = field(default_factory=list)
    alignments_test: list[dict] = field(default_factory=list)
    web_pages: list[dict] = field(default_factory=list)
    # gold: exact (url, uri) mention pairs planted into pages
    gold_mentions: list[tuple[str, str]] = field(default_factory=list)
    # concept uri -> prefLabel (for oracles)
    pref_labels: dict[str, str] = field(default_factory=dict)


def _concept_phrase(rng: random.Random, core: list[str]) -> str:
    """A label phrase around shared core tokens."""
    words = list(core)
    if rng.random() < 0.5:
        words.insert(0, rng.choice(_MODIFIERS))
    return " ".join(words)


def make_fixture(
    n_pairs: int = 100,
    n_extra_per_side: int = 50,
    n_pages: int = 1000,
    seed: int = 42,
    branching: int = 3,
    dag_fraction: float = 0.15,
    mentions_per_page: tuple[int, int] = (0, 5),
    filler_sentences: tuple[int, int] = (1, 3),
) -> Fixture:
    rng = random.Random(seed)
    fx = Fixture()

    n_side = n_pairs + n_extra_per_side

    def uri(side: str, i: int) -> str:
        return f"{side}:C{i:04d}"

    # --- labels -----------------------------------------------------------
    for i in range(n_side):
        core = rng.sample(_VOCAB_STEMS, k=rng.randint(1, 2)) + [
            rng.choice(_MODIFIERS)
        ]
        matched = i < n_pairs
        # matched pairs share synonym sets (real aligned concepts do); the
        # target side gets mild noise: drop/add one, reorder the core
        shared_syns = [
            _concept_phrase(rng, [rng.choice(_VOCAB_STEMS)])
            for _ in range(rng.randint(0, 3))
        ]
        for side in ("src", "tgt"):
            u = uri(side, i)
            if matched:
                words = list(core)
                syns = list(shared_syns)
                if side == "tgt":
                    # exactly one noise op per matched target (hard-ish but
                    # learnable positives)
                    r = rng.random()
                    if r < 0.2:
                        words[-1] = rng.choice(_MODIFIERS)
                    elif r < 0.4:
                        words = list(reversed(words))
                    elif r < 0.55 and syns:
                        syns.pop(rng.randrange(len(syns)))
                    elif r < 0.7:
                        syns.append(_concept_phrase(rng, [rng.choice(_VOCAB_STEMS)]))
                pref = " ".join(words)
            else:
                pref = _concept_phrase(rng, rng.sample(_VOCAB_STEMS, k=2))
                syns = [
                    _concept_phrase(rng, [rng.choice(_VOCAB_STEMS)])
                    for _ in range(rng.randint(0, 3))
                ]
            # decorate a few labels with greek/typographic chars
            if rng.random() < 0.08:
                pref = pref + " " + rng.choice(_DECOR)
            fx.triples.append(
                {"subject": u, "predicate": P_LABEL, "object": pref, "lang": "en"}
            )
            fx.pref_labels[u] = pref
            for syn in syns:
                fx.triples.append(
                    {
                        "subject": u,
                        "predicate": P_SYNONYM,
                        "object": syn,
                        "lang": "en",
                    }
                )

    # --- hierarchy: tree with parent (i-1)//branching, root i=0 ------------
    for side in ("src", "tgt"):
        for i in range(1, n_side):
            parent = (i - 1) // branching
            fx.triples.append(
                {
                    "subject": uri(side, i),
                    "predicate": P_SUBCLASS,
                    "object": uri(side, parent),
                    "lang": None,
                }
            )
        # DAG slice: extra second parents for a deterministic subset
        for i in range(2, n_side):
            if rng.random() < dag_fraction:
                extra = rng.randrange(0, max(1, (i - 1) // branching))
                if extra != (i - 1) // branching:
                    fx.triples.append(
                        {
                            "subject": uri(side, i),
                            "predicate": P_SUBCLASS,
                            "object": uri(side, extra),
                            "lang": None,
                        }
                    )

    # --- exactMatch links within sides (cross-reference / CC fixture) ------
    for side in ("src", "tgt"):
        for i in range(0, n_side - 1, 17):
            a, b = uri(side, i), uri(side, i + 1)
            fx.triples.append(
                {"subject": a, "predicate": P_EXACT, "object": b, "lang": None}
            )
            fx.triples.append(
                {"subject": b, "predicate": P_EXACT, "object": a, "lang": None}
            )

    # --- alignments (70/30 train/test) --------------------------------------
    for i in range(n_pairs):
        row = {
            "SrcEntity": uri("src", i),
            "TgtEntity": uri("tgt", i),
            "Score": 1.0,
        }
        (fx.alignments_train if i % 10 < 7 else fx.alignments_test).append(row)

    # --- web pages -----------------------------------------------------------
    all_uris = [uri(s, i) for s in ("src", "tgt") for i in range(n_side)]
    for p in range(n_pages):
        row, mentioned = _gen_page(
            rng, p, all_uris, fx.pref_labels, mentions_per_page, filler_sentences
        )
        for u in mentioned:
            fx.gold_mentions.append((row["url"], u))
        fx.web_pages.append(row)
    return fx


_PAGE_TEMPLATES = [
    "The study of {m} has advanced considerably in recent years.",
    "Researchers described the {m} in detail.",
    "A new atlas covers the {m} and adjacent structures.",
    "Clinical notes often reference the {m}.",
    "This section reviews anatomy of the {m}.",
]
# two-mention sentences whose folded between-text is EXACTLY a
# DEFAULT_PATTERNS key, so operators/relations.pattern_relations extracts a
# typed triple from them — planted when a page has >= 2 mentions, giving the
# pipeline's S7 relation stage real work end-to-end
_REL_TEMPLATES = [
    "Every {a} is a {b} overall.",
    "The {a} is part of {b} broadly.",
    "Typically {a} located in {b} regions.",
]
# predicate each template plants, index-parallel with _REL_TEMPLATES
# (operators/relations.DEFAULT_PATTERNS maps the between-texts)
_REL_PREDS = ["kg:isA", "kg:partOf", "kg:locatedIn"]
_PAGE_FILLER = [
    "General methods are described elsewhere.",
    "Results were consistent across cohorts.",
    "See the appendix for protocols.",
    "The dataset was collected over two years.",
]


def _gen_page_head(rng, p, all_uris, mentions_per_page):
    """The rng-draw PREFIX of :func:`_gen_page`: url, lang and the
    planted-mention list — everything the gold twin needs. MUST stay the
    exact draw sequence _gen_page starts with (it calls this helper), so
    replaying only the head yields the same mentions as generating the
    whole page. Returns (url, lang, mentioned)."""
    url = f"https://example.org/p/{p:08d}"
    lang = "en" if rng.random() >= 0.05 else "de"
    k = rng.randint(*mentions_per_page) if lang == "en" else 0
    mentioned = rng.sample(all_uris, k=k) if k else []
    return url, lang, mentioned


def _gen_page_relation(rng, mentioned, pref_labels):
    """The rng-draw segment IMMEDIATELY after :func:`_gen_page_head`:
    possibly plant a two-mention relation sentence (both labels still
    appear, so gold mention recall holds; the between-text is an exact
    relation pattern). Returns (sentence | None, (subj, pred, obj) gold
    triple | None, remaining mentions). MUST keep this exact draw
    sequence — synth_gold_relations_distributed replays head + this
    segment to emit planted relation gold at any corpus size."""
    ms = list(mentioned)
    if len(ms) >= 2 and rng.random() < 0.5:
        t = rng.choice(_REL_TEMPLATES)
        pred = _REL_PREDS[_REL_TEMPLATES.index(t)]
        sent = t.format(a=pref_labels[ms[0]], b=pref_labels[ms[1]])
        return sent, (ms[0], pred, ms[1]), ms[2:]
    return None, None, ms


def _gen_page(rng, p, all_uris, pref_labels, mentions_per_page, filler_sentences):
    """One synthetic page row from an rng — the SINGLE page-content
    generator, shared by the sequential fixture (one rng stream for the
    whole corpus) and the distributed generator (one rng per page id), so
    the two can never drift in content shape. Returns (row, mentioned)."""
    url, lang, mentioned = _gen_page_head(rng, p, all_uris, mentions_per_page)
    sentences: list[str] = []
    rel_sent, _gold, ms = _gen_page_relation(rng, mentioned, pref_labels)
    if rel_sent is not None:
        sentences.append(rel_sent)
    for u in ms:
        t = rng.choice(_PAGE_TEMPLATES)
        sentences.append(t.format(m=pref_labels[u]))
    for _ in range(rng.randint(*filler_sentences)):
        if rng.random() < 0.3:
            sentences.append(rng.choice(_PAGE_FILLER))
        else:
            # filler vocabulary is DISJOINT from concept labels so
            # mention density stays realistic (~0-8 per page)
            sentences.append(
                "The %s %s was recorded during the %s %s phase."
                % (
                    rng.choice(_FILLER_ADJ),
                    rng.choice(_FILLER_NOUN),
                    rng.choice(_FILLER_ADJ),
                    rng.choice(_FILLER_NOUN),
                )
            )
    rng.shuffle(sentences)
    if lang != "en":
        sentences = ["Dieser Text ist nicht englisch."] + sentences
    text = " ".join(sentences)
    html = (
        "<html><head><title>Page {p}</title>"
        "<script>var x = {p};</script>"
        "<style>body {{ margin: 0 }}</style></head>"
        "<body><nav><a href='/'>home</a> | <a href='/about'>about</a></nav>"
        "<!-- tracking -->"
        "<main><p>{text}</p></main>"
        "<footer>© example.org</footer></body></html>"
    ).format(p=p, text=text)
    row = {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=p),
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }
    return row, mentioned


def synth_pages_distributed(
    spark,
    n_pages: int,
    pref_labels: dict[str, str],
    seed: int = 7,
    mentions_per_page: tuple[int, int] = (0, 8),
    filler_sentences: tuple[int, int] = (25, 50),
    partitions: int | None = None,
):
    """Spark-parallel deterministic page synthesis — the scale-shape twin
    of the driver-side fixture loop. A 10^12-row synthetic table cannot be
    built on the driver (the sequential generator is O(corpus) single-core
    Python: a 2.4M-page bench corpus took >25 min); here every executor
    generates its own id range via mapInPandas over ``spark.range``.

    Content comes from the SAME :func:`_gen_page` as ``make_fixture``, but
    seeded per page id (``random.Random(f"{seed}:{p}")``) instead of one
    sequential stream, so output is byte-deterministic AND independent of
    partitioning, task order, and cluster size — re-running at any
    parallelism yields identical rows (pinned in tests/test_catalog.py)."""
    from ontology_mapping_spark import schemas

    labels = dict(pref_labels)
    uris = sorted(labels)  # any fixed order; sorted = partition-independent
    mpp, fs = tuple(mentions_per_page), tuple(filler_sentences)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["id"]:
                p = int(p)
                rng = random.Random(f"{seed}:{p}")
                row, _ = _gen_page(rng, p, uris, labels, mpp, fs)
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    n_part = partitions or spark.sparkContext.defaultParallelism * 4
    return spark.range(0, n_pages, numPartitions=n_part).mapInPandas(
        gen, schema=schemas.WEB_PAGES
    )


def synth_gold_mentions_distributed(
    spark,
    n_pages: int,
    pref_labels: dict[str, str],
    seed: int = 7,
    mentions_per_page: tuple[int, int] = (0, 8),
    filler_sentences: tuple[int, int] = (25, 50),
    partitions: int | None = None,
):
    """(url, uri) gold mention pairs for the distributed corpus — the
    replay twin of :func:`synth_pages_distributed`. Each page id reseeds
    the SAME per-id rng and calls the SAME :func:`_gen_page`, so the gold
    set is exactly the mentions that generator planted; pass identical
    (n_pages, pref_labels, seed, mentions_per_page, filler_sentences).
    This is what makes the north-star P/R metric measurable at corpus
    scale: planted ground truth exists for ANY corpus size without ever
    materializing it on the driver (tests pin pages/gold consistency and
    partition-independence)."""
    from pyspark.sql.types import StringType, StructField, StructType

    del filler_sentences  # accepted for signature parity; gold needs only
    # the rng-draw HEAD of the page generator (url/lang/mentions all draw
    # before any filler) — skipping filler+HTML makes the gold pass ~30x
    # cheaper than regenerating full pages
    uris = sorted(pref_labels)  # same fixed order as synth_pages_distributed
    mpp = tuple(mentions_per_page)
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("uri", StringType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_url, out_uri = [], []
            for p in pdf["id"]:
                p = int(p)
                rng = random.Random(f"{seed}:{p}")
                url, _lang, mentioned = _gen_page_head(rng, p, uris, mpp)
                for u in mentioned:
                    out_url.append(url)
                    out_uri.append(u)
            yield pd.DataFrame(
                {"url": pd.Series(out_url, dtype=object),
                 "uri": pd.Series(out_uri, dtype=object)}
            )

    n_part = partitions or spark.sparkContext.defaultParallelism * 4
    return spark.range(0, n_pages, numPartitions=n_part).mapInPandas(
        gen, schema=schema
    )


def synth_gold_relations_distributed(
    spark,
    n_pages: int,
    pref_labels: dict[str, str],
    seed: int = 7,
    mentions_per_page: tuple[int, int] = (0, 8),
    filler_sentences: tuple[int, int] = (25, 50),
    partitions: int | None = None,
):
    """(url, subj, pred, obj) gold RELATION triples for the distributed
    corpus — replays the page-generator head plus the relation-sentence
    draw segment (:func:`_gen_page_relation`) per page id, so the gold
    set is exactly the typed triples the generator planted; pass the
    same arguments as :func:`synth_pages_distributed`."""
    from pyspark.sql.types import StringType, StructField, StructType

    del filler_sentences  # signature parity; gold needs only head + rel draws
    labels = dict(pref_labels)
    uris = sorted(labels)
    mpp = tuple(mentions_per_page)
    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("subj", StringType(), False),
            StructField("pred", StringType(), False),
            StructField("obj", StringType(), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["id"]:
                p = int(p)
                rng = random.Random(f"{seed}:{p}")
                url, _lang, mentioned = _gen_page_head(rng, p, uris, mpp)
                _sent, gold, _rest = _gen_page_relation(rng, mentioned, labels)
                if gold is not None:
                    rows.append((url, *gold))
            yield pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"]).astype(
                object
            )

    n_part = partitions or spark.sparkContext.defaultParallelism * 4
    return spark.range(0, n_pages, numPartitions=n_part).mapInPandas(
        gen, schema=schema
    )


def fixture_dataframes(spark, fx: Fixture):
    """Fixture lists -> Spark DataFrames with the fixed schemas."""
    from ontology_mapping_spark import schemas

    triples = spark.createDataFrame(fx.triples, schema=schemas.TRIPLES)
    align_train = spark.createDataFrame(fx.alignments_train, schema=schemas.ALIGNMENTS)
    align_test = spark.createDataFrame(fx.alignments_test, schema=schemas.ALIGNMENTS)
    pages = spark.createDataFrame(fx.web_pages, schema=schemas.WEB_PAGES)
    return triples, align_train, align_test, pages
