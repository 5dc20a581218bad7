"""Stage materialization with checkpoint/resume + lineage manifests.

The north rule requires batch stages "resumable from checkpoint at each
stage boundary" with "per-partition lineage manifests and metrics". Each
stage is a pure ``() -> DataFrame`` builder; ``StageRunner.materialize``
writes the result to ``<workdir>/<name>`` (parquet locally; passing
``catalog=`` to the runner switches the SAME callsite to Iceberg
``writeTo(catalog.name).using("iceberg").createOrReplace()`` — the
BASELINE's storage layer — with reads via ``spark.read.table``), plus ``<workdir>/<name>.manifest.json`` holding:

* config hash (any knob change invalidates downstream reuse),
* build id — sha256 chained over (config hash, stage name, input stages'
  build ids), so a rebuilt upstream stage invalidates every downstream
  manifest (lineage is *checked*, not just recorded),
* input stage names (lineage),
* total rows + per-file row counts (per-partition metrics),
* output columns.

External inputs (tables never materialized by this runner, e.g. the raw
``web_pages``/``triples``) contribute only their *name* to the chain:
pointing an existing workdir at different external data requires a fresh
workdir.

A re-run with the same build id reads the manifest and skips the build —
the reference's memoized similarity matrix (thesis/generate_candidates.py:33-44)
generalized into the resume mechanism. The reference has no streaming;
checkpoint/resume at stage boundaries is the canonical form (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig


def config_hash(cfg: PipelineConfig) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class StageRunner:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: PipelineConfig,
        catalog: str | None = None,
        table_format: str = "iceberg",
    ):
        """``catalog``: optional "<catalog>.<namespace>" prefix. When set,
        stages land as ``catalog.namespace.stage_name`` tables through the
        DataFrameWriterV2 (Iceberg in production; ``table_format`` lets
        tests/other catalogs swap the provider). Manifests stay on the
        local workdir either way — they carry the build-id chain, which is
        the runner's own lineage, not the table format's."""
        self.spark = spark
        self.workdir = workdir
        self.catalog = catalog
        self.table_format = table_format
        self.cfg = cfg
        self.cfg_hash = config_hash(cfg)
        self.events: list[tuple[str, str]] = []  # (stage, built|skipped)
        # stage name -> build id of the output THIS run would use; the
        # chained hash makes a rebuilt upstream stage invalidate every
        # downstream manifest (lineage is checked, not just recorded)
        self._build_ids: dict[str, str] = {}
        os.makedirs(workdir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.workdir, name),
            os.path.join(self.workdir, f"{name}.manifest.json"),
        )

    def _table_ident(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def _output_exists(self, name: str, path: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._table_ident(name))
        return os.path.exists(path)

    def _read_output(self, name: str, path: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(self._table_ident(name))
        return self.spark.read.parquet(path)

    def _expected_build_id(self, name: str, inputs: list[str]) -> str:
        # external inputs (no materialized stage) contribute their name
        # only — changing external input DATA under an existing workdir
        # still needs a fresh workdir, documented in the module docstring
        parts = [self.cfg_hash, name] + [
            self._build_ids.get(i, i) for i in sorted(inputs)
        ]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]

    def materialize(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        path, mpath = self._paths(name)
        expected = self._expected_build_id(name, inputs or [])
        if os.path.exists(mpath) and self._output_exists(name, path):
            with open(mpath) as f:
                manifest = json.load(f)
            # build_id covers config + the exact upstream build chain;
            # legacy manifests (config_hash only) are treated as stale
            if manifest.get("build_id") == expected:
                self._build_ids[name] = expected
                self.events.append((name, "skipped"))
                return self._read_output(name, path)
        df = build()
        if self.catalog:
            writer = df.writeTo(self._table_ident(name)).using(self.table_format)
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.createOrReplace()
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        written = self._read_output(name, path)
        if self.catalog:
            # Iceberg keeps per-file metrics in its own manifests; the
            # runner records only the row count (input_file_name() is not
            # defined for catalog tables on all providers)
            rows = written.count()
            per_file = {}
        else:
            per_file = {
                r["f"]: r["n"]
                for r in written.groupBy(
                    F.input_file_name().alias("f")
                ).agg(F.count("*").alias("n")).collect()
            }
            rows = int(sum(per_file.values()))
        manifest = {
            "stage": name,
            "config_hash": self.cfg_hash,
            "build_id": expected,
            "inputs": inputs or [],
            "rows": int(rows),
            "columns": list(written.columns),
            "partition_metrics": {
                os.path.basename(k): int(v) for k, v in per_file.items()
            },
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        self._build_ids[name] = expected
        self.events.append((name, "built"))
        return written

    def is_current(self, name: str) -> bool:
        """True when the stage's manifest matches this config AND the
        upstream build chain (a re-run would skip the build)."""
        path, mpath = self._paths(name)
        if not (os.path.exists(mpath) and self._output_exists(name, path)):
            return False
        with open(mpath) as f:
            m = json.load(f)
        return m.get("build_id") == self._expected_build_id(
            name, m.get("inputs", [])
        )

    def manifest(self, name: str) -> dict:
        with open(self._paths(name)[1]) as f:
            return json.load(f)
