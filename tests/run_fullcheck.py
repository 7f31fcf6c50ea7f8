"""Full-registry re-verification sweep (round-11 VERDICT #1): run the
driver-style oracle compare (tests/driver_compare.py) over EVERY registered
query — not just the driver's capped 50-window — at the gate scale, twice:

- default: the engine's own session factory (the builder preflight form);
- vanilla: a bare SparkSession under TZ=America/New_York (the form the
  driver actually uses — no UTC pin, no engine confs; every query fn must
  self-apply what it needs).

Merges both passes into FULLCHECK_r{N}.json at the repo root:

    {"round": N, "sf_dir": ..., "names": <count>,
     "default": {name: {status, rows, ...}},
     "vanilla_tz": {name: {...}}}

This converts the cumulative union-over-rounds correctness claim ("every
query has a green driver row in SOME round") into a single-round artifact
("every query is green NOW, under the current code") —
tests/test_fullcheck.py asserts the newest artifact stays green and covers
the registry. Run it like bench: alone, a clean window; the two passes run
as concurrent subprocesses (~1-2.5 h wall at sf0.01 on local[32]).

Usage:  python tests/run_fullcheck.py <round-number>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def main() -> None:
    rnd = int(sys.argv[1])
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    compare = os.path.join(HERE, "driver_compare.py")
    outs = {}
    procs = {}
    for variant, extra_env in (
        ("default", {}),
        ("vanilla_tz", {"SPARK_GRAFT_VANILLA": "1", "TZ": "America/New_York"}),
    ):
        out = os.path.join("/tmp", f"fullcheck_{variant}_r{rnd}.json")
        outs[variant] = out
        env = {**os.environ, "SPARK_GRAFT_TEST_SF_DIR": sf_dir, **extra_env}
        procs[variant] = subprocess.Popen(
            [sys.executable, compare, "--all", "--json", out],
            env=env,
            stdout=open(out + ".log", "w"),
            stderr=subprocess.STDOUT,
        )
    failures = {v: p.wait() for v, p in procs.items()}
    merged = {
        "round": rnd,
        "sf_dir": sf_dir,
        "variants": {v: json.load(open(p)) for v, p in outs.items()},
    }
    merged["names"] = len(merged["variants"]["default"])
    dest = os.path.join(ROOT, f"FULLCHECK_r{rnd}.json")
    with open(dest, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"wrote {dest}; subprocess exit codes: {failures}")
    sys.exit(max(failures.values()))


if __name__ == "__main__":
    main()
