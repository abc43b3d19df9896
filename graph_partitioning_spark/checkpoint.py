"""Per-superstep checkpointing with manifests, counters, and resume.

Maps the reference's restartable artifacts — the loadable PREDICTION_MODEL
assignments file (/root/reference/graph_partitioning/graph_partitioning.py:234-237)
and the per-stage assignment dumps reloaded by
graph-partitioning-parallel-run.ipynb cell 3 — onto a parquet + JSON-manifest
scheme: every superstep writes its state DataFrame (breaking lineage, which
is also what keeps iterative plans from growing unboundedly) and a manifest
recording (run_id, superstep, counters, algorithm params). Resume = read the
highest complete manifest and continue the loop; the manifest is written
*after* the parquet commit, so a half-written step is invisible.

Counters per north star: edges_scanned, messages_exchanged, skew_ratio.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Counters:
    edges_scanned: int = 0
    messages_exchanged: int = 0
    skew_ratio: float = 1.0
    extra: dict[str, float] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "edges_scanned": self.edges_scanned,
            "messages_exchanged": self.messages_exchanged,
            "skew_ratio": self.skew_ratio,
            **self.extra,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Counters":
        base = {"edges_scanned", "messages_exchanged", "skew_ratio"}
        return cls(
            edges_scanned=int(d.get("edges_scanned", 0)),
            messages_exchanged=int(d.get("messages_exchanged", 0)),
            skew_ratio=float(d.get("skew_ratio", 1.0)),
            extra={k: v for k, v in d.items() if k not in base},
        )


class CheckpointManager:
    """Writes/loads per-superstep state under ``base_dir/run_id/``."""

    def __init__(self, base_dir: str, run_id: str):
        self.base_dir = base_dir
        self.run_id = run_id
        self.run_dir = os.path.join(base_dir, run_id)
        os.makedirs(self.run_dir, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _state_path(self, step: int, name: str) -> str:
        return os.path.join(self.run_dir, f"step={step:06d}", name)

    def _manifest_path(self, step: int) -> str:
        return os.path.join(self.run_dir, f"manifest_{step:06d}.json")

    # -- write ------------------------------------------------------------
    def save(
        self,
        step: int,
        states: dict[str, DataFrame],
        counters: Counters,
        params: dict[str, Any] | None = None,
    ) -> dict[str, DataFrame]:
        """Write each state DataFrame as parquet, then commit the manifest.

        Returns re-read (lineage-free) DataFrames for the next superstep.
        """
        spark = next(iter(states.values())).sparkSession
        out: dict[str, DataFrame] = {}
        for name, df in states.items():
            path = self._state_path(step, name)
            df.write.mode("overwrite").parquet(path)
            out[name] = spark.read.parquet(path)
        manifest = {
            "run_id": self.run_id,
            "superstep": step,
            "states": {n: self._state_path(step, n) for n in states},
            "counters": counters.to_dict(),
            "params": params or {},
        }
        tmp = self._manifest_path(step) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path(step))
        return out

    # -- read / resume ------------------------------------------------------
    def latest_manifest(self) -> dict[str, Any] | None:
        if not os.path.isdir(self.run_dir):
            return None
        steps = sorted(
            int(f[len("manifest_") : -len(".json")])
            for f in os.listdir(self.run_dir)
            if f.startswith("manifest_") and f.endswith(".json")
        )
        if not steps:
            return None
        with open(self._manifest_path(steps[-1])) as f:
            return json.load(f)

    def load_states(self, spark: SparkSession, manifest: dict[str, Any]) -> dict[str, DataFrame]:
        return {n: spark.read.parquet(p) for n, p in manifest["states"].items()}
