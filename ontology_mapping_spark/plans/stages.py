"""Stage materialization with checkpoint/resume + lineage manifests.

The north rule requires batch stages "resumable from checkpoint at each
stage boundary" with "per-partition lineage manifests and metrics". Each
stage is a pure ``() -> DataFrame`` builder; ``StageRunner.materialize``
writes the result to ``<workdir>/<name>`` (parquet locally; the writer is
format-agnostic — on a cluster with an Iceberg catalog the same callsite
becomes ``writeTo(...)``), plus ``<workdir>/<name>.manifest.json`` holding:

* config hash (any knob change invalidates downstream reuse),
* input stage names (lineage),
* total rows + per-file row counts (per-partition metrics),
* output columns.

A re-run with the same config hash reads the manifest and skips the build —
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
    def __init__(self, spark: SparkSession, workdir: str, cfg: PipelineConfig):
        self.spark = spark
        self.workdir = workdir
        self.cfg = cfg
        self.cfg_hash = config_hash(cfg)
        self.events: list[tuple[str, str]] = []  # (stage, built|skipped)
        os.makedirs(workdir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.workdir, name),
            os.path.join(self.workdir, f"{name}.manifest.json"),
        )

    def materialize(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        path, mpath = self._paths(name)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("config_hash") == self.cfg_hash:
                self.events.append((name, "skipped"))
                return self.spark.read.parquet(path)
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        written = self.spark.read.parquet(path)
        per_file = {
            r["f"]: r["n"]
            for r in written.groupBy(
                F.input_file_name().alias("f")
            ).agg(F.count("*").alias("n")).collect()
        }
        manifest = {
            "stage": name,
            "config_hash": self.cfg_hash,
            "inputs": inputs or [],
            "rows": int(sum(per_file.values())),
            "columns": written.columns,
            "partition_metrics": {
                os.path.basename(k): int(v) for k, v in per_file.items()
            },
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        self.events.append((name, "built"))
        return written

    def is_current(self, name: str) -> bool:
        """True when the stage's manifest exists for this config hash (a
        re-run would skip the build)."""
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return False
        with open(mpath) as f:
            return json.load(f).get("config_hash") == self.cfg_hash

    def manifest(self, name: str) -> dict:
        with open(self._paths(name)[1]) as f:
            return json.load(f)
