"""Checkpoint manifest: per-stage lineage records + resume (SURVEY §2.3 ST4).

gencore tracks pre/post Stats accumulators and emits a JSON report
(/root/reference/src/stats.cpp:153-193, src/jsonreporter.cpp:11-42);
its incremental cluster flush (src/gencore.cpp:319-389) bounds state so
a crash loses little.  Our batch equivalent of both: every stage
materialises its output as a partitioned Parquet directory written
atomically (tmp dir + rename), and appends one manifest record

    {stage, fingerprint, rows_out, partitions: [{path, rows}],
     counters, wall_sec, completed_at_ord}

to ``manifest.jsonl``.  Resume = if a stage's (name, fingerprint)
pair — the fingerprint chain covers the DedupConfig, the input
identity (source files + schema), the extract_html flag, and every
upstream stage's fingerprint (see ``dedup_pages``) — already has a
completed record whose files still exist, read the parquet back
instead of recomputing.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import ray.data as rd


@dataclass
class StageRecord:
    stage: str
    fingerprint: str
    rows_out: int
    partitions: list[dict]
    counters: dict[str, int] = field(default_factory=dict)
    wall_sec: float = 0.0


class CheckpointManager:
    """Stage-level checkpoint/resume over a run directory."""

    def __init__(self, run_dir: str | None, enabled: bool = True):
        self.run_dir = run_dir or ""
        self.enabled = enabled and run_dir is not None
        self.manifest_path = os.path.join(self.run_dir, "manifest.jsonl")
        self._records: dict[tuple[str, str], dict] = {}
        if self.enabled:
            os.makedirs(run_dir, exist_ok=True)
            if os.path.exists(self.manifest_path):
                with open(self.manifest_path) as f:
                    for line in f:
                        rec = json.loads(line)
                        self._records[(rec["stage"], rec["fingerprint"])] = rec

    # -- resume ------------------------------------------------------
    def completed(self, stage: str, fingerprint: str) -> dict | None:
        rec = self._records.get((stage, fingerprint))
        if rec and all(os.path.exists(p["path"]) for p in rec["partitions"]):
            return rec
        return None

    def load(self, rec: dict) -> rd.Dataset:
        return rd.read_parquet([p["path"] for p in rec["partitions"]])

    # -- checkpoint --------------------------------------------------
    def save(
        self,
        stage: str,
        fingerprint: str,
        ds: rd.Dataset,
        counters: dict[str, int] | None = None,
        t0: float | None = None,
    ) -> rd.Dataset:
        """Write ds to <run_dir>/<stage>/ atomically, record lineage,
        and return a Dataset reading from the checkpoint (so downstream
        consumes the materialised copy, not a recompute)."""
        out_dir = os.path.join(self.run_dir, stage)
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(tmp_dir)
        # an all-empty dataset writes no files at all (Ray skips empty
        # blocks) — materialise one schema-bearing empty parquet so the
        # checkpoint stays loadable and the resume path keeps the schema
        os.makedirs(tmp_dir, exist_ok=True)
        if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
            import pyarrow as pa
            import pyarrow.parquet as _pq

            schema = ds.schema().base_schema
            if not isinstance(schema, pa.Schema):
                schema = pa.Table.from_pandas(
                    ds.limit(0).to_pandas(), preserve_index=False
                ).schema
            _pq.write_table(
                schema.empty_table(), os.path.join(tmp_dir, "empty-0.parquet")
            )
        os.replace(tmp_dir, out_dir)

        import pyarrow.parquet as pq

        partitions = []
        rows = 0
        for fn in sorted(os.listdir(out_dir)):
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(out_dir, fn)
            n = pq.ParquetFile(path).metadata.num_rows
            partitions.append({"path": path, "rows": n})
            rows += n
        rec = StageRecord(
            stage=stage,
            fingerprint=fingerprint,
            rows_out=rows,
            partitions=partitions,
            counters=counters or {},
            wall_sec=round(time.monotonic() - t0, 3) if t0 else 0.0,
        ).__dict__
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._records[(stage, fingerprint)] = rec
        return rd.read_parquet([p["path"] for p in partitions])

    # -- convenience -------------------------------------------------
    def stage(
        self,
        name: str,
        fingerprint: str,
        build: Any,
        counters: dict[str, int] | None = None,
    ) -> rd.Dataset:
        """Run-or-resume one stage. ``build`` is a zero-arg callable
        returning the stage's Dataset."""
        if self.enabled:
            rec = self.completed(name, fingerprint)
            if rec is not None:
                return self.load(rec)
        t0 = time.monotonic()
        ds = build()
        if not self.enabled:
            return ds
        return self.save(name, fingerprint, ds, counters=counters, t0=t0)

    def counters(self) -> dict[str, dict[str, int]]:
        return {rec["stage"]: rec.get("counters", {}) for rec in self._records.values()}

    def write_report(
        self,
        counters: dict[str, int],
        histogram: dict[int, int] | None = None,
    ) -> None:
        """Final JSON report (gencore JSON reporter analogue,
        /root/reference/src/jsonreporter.cpp:11-42): run counters plus
        the per-stage lineage summary.  Also renders ``report.html``
        (S7 — the human-readable summary gencore's HTML reporter emits,
        /root/reference/src/htmlreporter.cpp:56-485), including the
        duplication-level histogram when provided."""
        if not self.enabled:
            return
        stages = [
            {"stage": r["stage"], "rows_out": r["rows_out"],
             "partitions": len(r["partitions"]), "wall_sec": r["wall_sec"]}
            for r in self._records.values()
        ]
        report: dict[str, Any] = {"counters": counters, "stages": stages}
        if histogram:
            report["cluster_size_histogram"] = {
                str(k): v for k, v in sorted(histogram.items())
            }
        with open(os.path.join(self.run_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        with open(os.path.join(self.run_dir, "report.html"), "w") as f:
            f.write(_render_html_report(counters, stages, histogram))


def _render_html_report(
    counters: dict[str, int],
    stages: list[dict],
    histogram: dict[int, int] | None,
) -> str:
    """Static single-file HTML summary (no external assets — the same
    self-contained style as the reference's HTML reporter)."""
    import html as _h

    def table(headers: list[str], rows: list[list[Any]]) -> str:
        head = "".join(f"<th>{_h.escape(str(h))}</th>" for h in headers)
        body = "".join(
            "<tr>" + "".join(f"<td>{_h.escape(str(c))}</td>" for c in row) + "</tr>"
            for row in rows
        )
        return f"<table><tr>{head}</tr>{body}</table>"

    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        "<title>gencore_ray dedup report</title><style>",
        "body{font-family:sans-serif;margin:2em;max-width:60em}",
        "table{border-collapse:collapse;margin:1em 0}",
        "td,th{border:1px solid #999;padding:.3em .8em;text-align:left}",
        "th{background:#eee}.bar{background:#4a7;display:inline-block;",
        "height:1em;vertical-align:middle}</style></head><body>",
        "<h1>gencore_ray dedup report</h1>",
        "<h2>Run counters</h2>",
        table(["counter", "value"], [[k, v] for k, v in counters.items()]),
        "<h2>Stage lineage</h2>",
        table(
            ["stage", "rows out", "partitions", "wall (s)"],
            [[s["stage"], s["rows_out"], s["partitions"], s["wall_sec"]]
             for s in stages],
        ),
    ]
    if histogram:
        mx = max(histogram.values())
        rows = []
        for size, n in sorted(histogram.items()):
            bar = f"<span class='bar' style='width:{220 * n // mx}px'></span>"
            rows.append(
                f"<tr><td>{size}</td><td>{n}</td><td>{bar}</td></tr>"
            )
        parts += [
            "<h2>Duplication-level histogram</h2>",
            "<table><tr><th>cluster size</th><th>clusters</th><th></th></tr>",
            *rows, "</table>",
        ]
    parts.append("</body></html>")
    return "".join(parts)
