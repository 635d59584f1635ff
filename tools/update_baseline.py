#!/usr/bin/env python3
"""Maintain BASELINE_QUERIES.json — the committed per-query record minima
that graft.Bench diffs every run against (its mechanical 3x-per-query
regression gate).

Usage: update_baseline.py [BENCH_FULL.json ...]

For each input bench JSON (default: BENCH_FULL_LATEST.json), take its
per-query minima and fold them into the record as a monotone MIN — a
record only ever improves; new queries are added at their first clean
measurement. Runs marked contended or errored are refused (records must
come from clean evidence); pass --force to override for a query subset
you know was clean.
"""
import sys, os, json

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "BASELINE_QUERIES.json")


def main(argv):
    force = "--force" in argv
    inputs = [a for a in argv if not a.startswith("--")] or [
        os.path.join(REPO, "BENCH_FULL_LATEST.json")]
    record = {}
    if os.path.exists(RECORD):
        record = json.load(open(RECORD))
    changed = 0
    for path in inputs:
        run = json.load(open(path))
        if (run.get("contended") or run.get("errored")) and not force:
            print(f"refusing {path}: contended={run.get('contended')} "
                  f"errored={run.get('errored')} (use --force)")
            continue
        for q, sec in run.get("queries", {}).items():
            old = record.get(q)
            if old is None or sec < old:
                record[q] = round(float(sec), 4)
                changed += 1
        # Box fingerprint (round-14 verdict #7): keep the LATEST clean
        # run's CPU/shuffle microbench beside the records. A future
        # elevation adjudicates in one compare: fingerprint elevated too
        # -> box drift; fingerprint flat -> a real code regression.
        # ("__"-prefixed keys are invisible to Bench's q-keyed regex.)
        for k in ("box_cpu_sec", "box_shuffle_sec"):
            if k in run:
                record["__" + k] = round(float(run[k]), 4)
    json.dump(dict(sorted(record.items())), open(RECORD, "w"), indent=1)
    print(f"{RECORD}: {len(record)} queries, {changed} records updated")


if __name__ == "__main__":
    main(sys.argv[1:])
