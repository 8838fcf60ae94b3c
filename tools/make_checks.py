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


def sweep(sf_dir: str, chunk: int = 30) -> dict[str, str]:
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
    return out


def main() -> None:
    dest = sys.argv[1]
    result: dict = {}
    for sf_dir in sys.argv[2:]:
        label = os.path.basename(sf_dir.rstrip("/"))
        res = sweep(sf_dir)
        n_ok = sum(1 for v in res.values() if v == "OK")
        result[label] = {"total": len(res), "ok": n_ok, "results": res}
        print(f"{label}: {n_ok}/{len(res)} OK", file=sys.stderr)
    with open(dest, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"wrote {dest}", file=sys.stderr)


if __name__ == "__main__":
    main()
