#!/usr/bin/env python3
"""Seed/repair the sidecar's history ledgers (r17).

The median-defense gate's judged criterion is "committed median vs
best-ever committed MEDIAN", but until r17 the sidecar only carried
best-ever MINS (hist_best), so the gate compared against mins and
tripped on any query whose natural min-to-median spread exceeds the
gate factor (r16 advice). Bench now reads/merges a `hist_med` map; this
script back-fills it from committed history.

WINDOW RULE (learned the hard way in r17): only sidecars that already
carry `hist_best` (the post-r14 ledger discipline) are merged. Query
DEFINITIONS evolve across rounds — q158 gained whitening + index
persistence + an append-equivalence rebuild in r14, tripling its
honest cost — so a pre-r14 median is a measurement of a DIFFERENT
query, and merging it plants an unreachable reference the gate then
burns its retry budget chasing every round. The incumbent hist_best
accumulation (monotone elementwise min since r14) already encodes this
window; `hist_best` itself is therefore restored from the newest
committed sidecar that predates `hist_med` (the last pre-r17
accumulation) rather than rebuilt from scratch, then merged with the
current file's own run mins.

Run from the repo root; rewrites BENCH_SIDECAR.json in place. Bench
self-maintains all three fields from then on, so this runs once (or
again to repair).
"""
import json
import re
import subprocess
import sys


def committed_sidecars() -> list[dict]:
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_SIDECAR.json"],
        capture_output=True, text=True, check=True).stdout.split()
    out = []
    for rev in revs:  # newest first
        p = subprocess.run(["git", "show", f"{rev}:BENCH_SIDECAR.json"],
                           capture_output=True, text=True)
        if p.returncode != 0:
            continue
        try:
            out.append(json.loads(p.stdout))
        except json.JSONDecodeError:
            continue
    return out


def main() -> None:
    history = committed_sidecars()
    txt = open("BENCH_SIDECAR.json", encoding="utf-8").read()
    cur = json.loads(txt)
    # Definition-version tags (r18): a sidecar entry measured under a
    # DIFFERENT definition of the query (tag mismatch vs the current file's
    # def_tags) is a measurement of a different query — skip it, the
    # mechanical form of the r17 window rule. Sidecars predating def_tags
    # carry no tags and are merged untagged (the hist_best window rule
    # below still bounds them to post-r14 definitions).
    cur_tags = cur.get("def_tags") or {}

    def tag_ok(d: dict, q: str) -> bool:
        t = (d.get("def_tags") or {}).get(q)
        c = cur_tags.get(q)
        return t is None or c is None or t == c

    best_med: dict[str, float] = {}
    hist_mins: dict[str, float] = {}
    calib_quick, calib_job = [], []
    for d in history:
        if d.get("filtered"):
            continue  # partial run: medians not comparable
        if not str(d.get("sf", "")).endswith("sf0.1"):
            continue  # three early sidecars ran sf0.001/sf0.01
        if "hist_best" not in d:
            continue  # pre-r14: different query definitions (window rule)
        for q, v in (d.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0 and tag_ok(d, q):
                best_med[q] = min(best_med.get(q, float("inf")), v)
        # every committed run's own MINS enter best-ever too (r17 advice):
        # restoring hist_best from only the newest pre-hist_med accumulation
        # discarded the mins that intermediate post-r17 committed runs had
        # merged, silently ratcheting best-ever entries back UP on a repair
        # re-run and weakening the history gate
        for q, v in (d.get("mins") or {}).items():
            if isinstance(v, (int, float)) and v > 0 and tag_ok(d, q):
                hist_mins[q] = min(hist_mins.get(q, float("inf")), v)
        ob = d.get("ob_policy") or {}
        if isinstance(ob.get("floor_ref_ms"), int):
            calib_quick.append(ob["floor_ref_ms"])
        if isinstance(ob.get("job_floor_ref_ms"), int):
            calib_job.append(ob["job_floor_ref_ms"])

    # hist_best: the newest committed accumulation from BEFORE hist_med
    # existed (pre-r17) is the complete, definition-windowed ledger —
    # monotone merging since r14 means the newest pre-r17 copy subsumes
    # all earlier ones.
    base_best: dict[str, float] = {}
    for d in history:  # newest first
        if "hist_best" in d and "hist_med" not in d:
            base_best = {q: v for q, v in d["hist_best"].items()
                         if isinstance(v, (int, float)) and v > 0}
            break
    if not base_best:
        sys.exit("no pre-r17 hist_best found in history")
    # ...merged with every committed post-r14-discipline run's mins
    # (collected above, already tag-filtered)
    for q, v in hist_mins.items():
        base_best[q] = min(base_best.get(q, float("inf")), v)

    # argv: extra full-run artifacts (e.g. /tmp copies of this round's other
    # official runs) whose measurements should also enter the ledgers
    extras = []
    for path in sys.argv[1:]:
        extras.append(json.load(open(path, encoding="utf-8")))
    for d in [cur] + extras:
        if str(d.get("sf", "")).endswith("sf0.1") and not d.get("filtered"):
            for q, v in (d.get("queries") or {}).items():
                if isinstance(v, (int, float)) and v > 0 and tag_ok(d, q):
                    best_med[q] = min(best_med.get(q, float("inf")), v)
            for q, v in (d.get("mins") or {}).items():
                if isinstance(v, (int, float)) and v > 0 and tag_ok(d, q):
                    base_best[q] = min(base_best.get(q, float("inf")), v)

    hist_med = ",".join(f'"{q}":{best_med[q]:.3f}' for q in sorted(best_med))
    hist_best = ",".join(f'"{q}":{base_best[q]:.3f}' for q in sorted(base_best))
    quick = max(min(calib_quick, default=190), 150)
    job = max(min(calib_job, default=497), 350)
    calib = f'{{"quick_ms":{quick},"job_ms":{job}}}'

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
          f"hist_best restored+merged ({len(base_best)}); "
          f"floor_calib quick={quick} job={job}")


if __name__ == "__main__":
    main()
