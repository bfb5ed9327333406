#!/usr/bin/env python3
"""One-off seed (r17) for the sidecar's best-ever-median ledger.

The median-defense gate's judged criterion is "committed median vs
best-ever committed MEDIAN", but until r17 the sidecar only carried
best-ever MINS (hist_best), so the gate compared against mins and
tripped on any query whose natural min-to-median spread exceeds the
gate factor (r16 advice). Bench now reads/merges a `hist_med` map; this
script back-fills it from every committed BENCH_SIDECAR.json in git
history (elementwise min over each run's full `queries` median map — an
inflated run can only lose the min), and seeds `floor_calib` from the
best run-start floor probes ever committed (ob_policy.floor_ref_ms /
job_floor_ref_ms, which were the raw run-start min-of-3 probes before
r17 added the upper clamp).

Run from the repo root; rewrites BENCH_SIDECAR.json in place by
inserting/replacing the two fields. Bench self-maintains both from then
on, so this runs once.
"""
import json
import re
import subprocess
import sys


def main() -> None:
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_SIDECAR.json"],
        capture_output=True, text=True, check=True).stdout.split()
    best_med: dict[str, float] = {}
    best_min: dict[str, float] = {}
    calib_quick, calib_job = [], []
    for rev in revs:
        p = subprocess.run(["git", "show", f"{rev}:BENCH_SIDECAR.json"],
                           capture_output=True, text=True)
        if p.returncode != 0:
            continue
        try:
            d = json.loads(p.stdout)
        except json.JSONDecodeError:
            continue
        if d.get("filtered"):
            continue  # partial run: medians not comparable
        if not str(d.get("sf", "")).endswith("sf0.1"):
            continue  # three early sidecars ran sf0.001/sf0.01 — their
            # medians are not comparable to the official-SF ledger
        for q, v in (d.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                best_med[q] = min(best_med.get(q, float("inf")), v)
        for q, v in (d.get("mins") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                best_min[q] = min(best_min.get(q, float("inf")), v)
        ob = d.get("ob_policy") or {}
        if isinstance(ob.get("floor_ref_ms"), int):
            calib_quick.append(ob["floor_ref_ms"])
        if isinstance(ob.get("job_floor_ref_ms"), int):
            calib_job.append(ob["job_floor_ref_ms"])

    txt = open("BENCH_SIDECAR.json", encoding="utf-8").read()
    cur = json.loads(txt)
    for q, v in (cur.get("queries") or {}).items():
        if isinstance(v, (int, float)) and v > 0:
            best_med[q] = min(best_med.get(q, float("inf")), v)
    # hist_best started accumulating only at r14 — rebuild it as the
    # genuine elementwise min over EVERY committed sf0.1 run plus the
    # existing ledger (which can only lower it further), so the history
    # gate references the actual cleanest windows ever recorded and the
    # hist_med >= hist_best invariant holds by construction.
    for q, v in (cur.get("hist_best") or {}).items():
        if isinstance(v, (int, float)) and v > 0:
            best_min[q] = min(best_min.get(q, float("inf")), v)
    hist_med = ",".join(f'"{q}":{best_med[q]:.3f}' for q in sorted(best_med))
    hist_best = ",".join(f'"{q}":{best_min[q]:.3f}' for q in sorted(best_min))
    quick = max(min(calib_quick, default=190), 150)
    job = max(min(calib_job, default=497), 350)
    calib = f'{{"quick_ms":{quick},"job_ms":{job}}}'

    # drop any existing copies of the fields, then replace hist_best and
    # insert the new ledgers after it
    txt = re.sub(r',"hist_med":\{[^}]*\}', "", txt)
    txt = re.sub(r',"floor_calib":\{[^}]*\}', "", txt)
    m = re.search(r'"hist_best":\{[^}]*\}', txt)
    if not m:
        sys.exit("no hist_best in sidecar")
    txt = (txt[:m.start()] + f'"hist_best":{{{hist_best}}}'
           + f',"hist_med":{{{hist_med}}}'
           + f',"floor_calib":{calib}' + txt[m.end():])
    json.loads(txt)  # must still parse
    open("BENCH_SIDECAR.json", "w", encoding="utf-8").write(txt)
    print(f"seeded hist_med with {len(best_med)} queries; "
          f"floor_calib quick={quick} job={job}")


if __name__ == "__main__":
    main()
