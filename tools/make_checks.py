#!/usr/bin/env python
"""Produce CHECKS_r{N}.json: the full oracle sweep as a committed
artifact (the driver's correctness gate samples ~50 of the registry's
queries; this records ALL of them at two scales).

Runs ``tools/check_oracles.py --chunk`` per sf dir (fresh subprocesses
— see ray-data raylet-segfault note in check_oracles.py) and collects
the per-query verdict lines.

    python tools/make_checks.py CHECKS_r5.json /root/testdata/sf0.001 /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def oracled_names() -> list[str]:
    import importlib.util

    sys.path.insert(0, os.path.dirname(HERE))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(HERE), "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return [n for n in m.queries() if n in m.oracle_sql()]


def sweep(sf_dir: str, expected: list[str],
          chunk: int = 30) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracles.py"),
         "--chunk", str(chunk), sf_dir],
        capture_output=True, text=True)
    out: dict[str, str] = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"^(\w+)\s+(OK|ROWS.*|SCHEMA.*|VALUES.*|ERROR.*)$",
                     line.strip())
        if m:
            out[m.group(1)] = m.group(2)
    # a crashed sweep (raylet segfault — the failure mode --chunk
    # exists for) must SHRINK the artifact loudly, not silently:
    # absent queries are recorded as NOT_RUN and count as failures
    for name in expected:
        out.setdefault(name, "NOT_RUN")
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
    return out


def main() -> None:
    dest = sys.argv[1]
    expected = oracled_names()
    result: dict = {}
    for sf_dir in sys.argv[2:]:
        label = os.path.basename(sf_dir.rstrip("/"))
        res = sweep(sf_dir, expected)
        n_ok = sum(1 for v in res.values() if v == "OK")
        result[label] = {"total": len(res), "ok": n_ok, "results": res}
        print(f"{label}: {n_ok}/{len(res)} OK", file=sys.stderr)
    with open(dest, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
