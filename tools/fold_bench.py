#!/usr/bin/env python3
"""Fold a bench run into the durable per-query minima record.

Usage: tools/fold_bench.py <new_run.json> [record.json]

The record (default bench_records/latest.json) is updated IN PLACE with
per-query ``min(old, new)``. Structural guarantees this script enforces —
the reason it exists (round-11's record was once replaced wholesale by a
loaded-box run, corrupting the regression baseline):

  * a fold can NEVER raise a row: every output value is min(old, new);
  * queries present only in the new run are added at their new value;
    queries absent from the new run keep their old value;
  * the record's ``note`` is preserved (appended to, never dropped);
  * the total is recomputed as the sum of the folded minima, so it can
    never exceed min(old_total_possible, ...) drift.

Exit non-zero without touching the record if the new run has failures.
"""
import json
import sys


def fold(record: dict, run: dict, note_suffix: str | None = None) -> dict:
    if run.get("failed"):
        raise SystemExit(f"refusing to fold a run with failures: {run['failed']}")
    # Scale-factor guard (mirrors Bench.foldRecord): an sf0.01 dev run has
    # the same query names at ~10x lower times — folding it would poison
    # the sf0.1 minima permanently, the corruption class this tool exists
    # to prevent.
    if record.get("sf") != run.get("sf"):
        raise SystemExit(
            f"refusing to fold: run sf={run.get('sf')!r} != record sf={record.get('sf')!r}"
        )
    old_q = dict(record.get("queries", {}))
    new_q = dict(run.get("queries", {}))
    # Subset-run guard (mirrors Bench.main's only.isEmpty check): an
    # isolated SPARK_GRAFT_BENCH_ONLY run measures its queries on an idle
    # box — its times are not comparable to full-catalog minima.
    if old_q and len(new_q) < 0.9 * len(old_q):
        raise SystemExit(
            f"refusing to fold a subset run ({len(new_q)} queries vs {len(old_q)} in the record)"
        )
    folded = {}
    raised = []
    for k in sorted(set(old_q) | set(new_q)):
        if k in old_q and k in new_q:
            folded[k] = min(old_q[k], new_q[k])
        else:
            folded[k] = old_q.get(k, new_q.get(k))
        if k in old_q and folded[k] > old_q[k]:
            raised.append(k)  # structurally impossible; belt-and-braces
    assert not raised, f"fold raised rows {raised} — bug in fold_bench.py"
    out = dict(record)
    out["queries"] = folded
    out["value"] = sum(folded.values())
    note = record.get("note") or ""
    if note_suffix:
        out["note"] = (note + "; " if note else "") + note_suffix
    elif note:
        out["note"] = note
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    run_path = sys.argv[1]
    rec_path = sys.argv[2] if len(sys.argv) > 2 else "bench_records/latest.json"
    with open(run_path) as f:
        run = json.load(f)
    with open(rec_path) as f:
        record = json.load(f)
    out = fold(record, run)
    with open(rec_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    better = sum(
        1 for k, v in out["queries"].items() if k in record.get("queries", {}) and v < record["queries"][k]
    )
    print(f"folded {run_path} into {rec_path}: total {record.get('value'):.2f} -> {out['value']:.2f}, {better} rows improved")


if __name__ == "__main__":
    main()
