#!/usr/bin/env python3
"""Splice the deep-min patch re-run into the full post-floor JOBREAL sweep.

The full 113-query sweep ran on the floor-as-committed binary; the pin
machinery flagged the deep-small families (11/13/27/33) as regressed, the
deep-plan minimum budget fixed them, and those families (+ controls
17c/18b/29a) were re-measured on the fixed binary on the same box. This
script replaces exactly the re-measured queries in the full sweep's JSON
and recomputes the geomeans, marking provenance per query.

Usage: splice_jobreal.py <full.json> <patch.json> <out.json>
"""
import json
import math
import sys


def main() -> None:
    full = json.load(open(sys.argv[1]))
    patch = json.load(open(sys.argv[2]))
    out = dict(full)
    out["spliced_from_patch_run"] = sorted(
        set(patch["broadcast"]["queries"]) | set(patch["shuffle"]["queries"]))
    for reg in ("broadcast", "shuffle"):
        qs = dict(full[reg]["queries"])
        for name, row in patch[reg]["queries"].items():
            row = dict(row)
            row["remeasured"] = True
            qs[name] = row
        geo = math.exp(
            sum(math.log(v["speedup"]) for v in qs.values()) / len(qs))
        # the full sweep's regressions block was computed against the
        # PRE-patch speedups; its pin/now values would contradict the
        # spliced queries map, so carry it under a provenance-marked key
        # and drop every flag the patch run re-measured away
        pre = dict(full[reg].get("regressions", {}))
        still = {n: r for n, r in pre.items()
                 if n not in patch[reg]["queries"]}
        # a query the patch run re-measured AND STILL flags must keep its
        # flag (with the post-patch pin/now values) — dropping it would
        # silently launder a live regression out of the spliced artifact
        still.update(patch[reg].get("regressions", {}))
        out[reg] = {
            "geomean": round(geo, 3),
            "matches": sum(1 for v in qs.values() if v["match"]),
            "total": len(qs),
            "regressions": still,
            "regressions_pre_splice": pre,
            "queries": qs,
        }
    json.dump(out, open(sys.argv[3], "w"))
    for reg in ("broadcast", "shuffle"):
        print(reg, out[reg]["geomean"], out[reg]["matches"], "/",
              out[reg]["total"])


if __name__ == "__main__":
    main()
