#!/usr/bin/env python3
"""Rebuild a pseudo BENCH_FULL-style run from an existing BENCH_FLOOR.md.

Usage: fold_floor_from_md.py BENCH_FLOOR.md > floor_as_run.json

The floor table IS a set of believed-quiet per-query minima, so it can
re-enter `make_floor.py` as one more "run" when the original run JSONs
that produced it are no longer on disk (only the folded table was
committed). Streaming is carried as the doc's best-clean-run figure so
the max-across-runs streaming floor is preserved by a re-fold.
"""
import json
import re
import sys


def main(path):
    txt = open(path).read()
    queries = {}
    for name, med in re.findall(r"\| ([a-z0-9_]+) \| ([0-9.]+) ", txt):
        queries[name] = float(med)
    m = re.search(
        r"streaming ([0-9,]+) rows/s \(best clean run\) over (\d+) "
        r"completed batches at ([0-9,]+) rows/batch", txt)
    streaming = None
    if m:
        streaming = {
            "rows_per_sec": int(m.group(1).replace(",", "")),
            "n_batches": int(m.group(2)),
            "rows_per_batch": int(m.group(3).replace(",", "")),
        }
    json.dump({"queries": queries, "streaming": streaming}, sys.stdout)


if __name__ == "__main__":
    main(sys.argv[1])
