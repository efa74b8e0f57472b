"""Compare two bench.py JSON artifacts row-by-row with canary-aware
noise bands — the reproducibility check VERDICT r4 asked the bench
discipline to support ("BENCH_r05 rows reproducible within
canary-corrected noise of a clean re-run").

A row counts as REPRODUCED when the two best-of-2 times agree within
max(rel_tol x slower, abs_tol) after scaling each side by its per-row
canary (the 5M-iteration spin bench.py records as <row>_canary5m_s);
rows whose canary shows a throttle window (> 2x the artifact's median)
are reported separately rather than failed — the machine, not the code.

Usage: python scripts/bench_compare.py A.json B.json [rel_tol] [abs_tol]
Exit 1 if any non-throttled row fails the band.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the parsed line under "parsed"
    return d.get("parsed", d)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rel = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    abs_tol = float(sys.argv[4]) if len(sys.argv) > 4 else 0.4
    qa, qb = a["queries"], b["queries"]
    ea, eb = a.get("extra", {}), b.get("extra", {})

    def med(ex):
        cs = sorted(v for k, v in ex.items() if k.endswith("_canary5m_s"))
        return cs[len(cs) // 2] if cs else None

    med_a, med_b = med(ea), med(eb)
    shared = sorted(set(qa) & set(qb))
    failed, throttled = [], []
    for k in shared:
        ta, tb = qa[k], qb[k]
        ca = ea.get(f"{k}_canary5m_s")
        cb = eb.get(f"{k}_canary5m_s")
        # canary-correct: scale each time to its artifact's median regime
        ta_c = ta * (med_a / ca) if ca and med_a else ta
        tb_c = tb * (med_b / cb) if cb and med_b else tb
        hot = (ca and med_a and ca > 2 * med_a) or (cb and med_b and cb > 2 * med_b)
        ok = abs(ta_c - tb_c) <= max(rel * max(ta_c, tb_c), abs_tol)
        row = f"{k}: {ta} vs {tb} (canary-corr {ta_c:.2f} vs {tb_c:.2f})"
        if not ok and hot:
            throttled.append(row)
        elif not ok:
            failed.append(row)
    print(
        json.dumps(
            {
                "shared_rows": len(shared),
                "reproduced": len(shared) - len(failed) - len(throttled),
                "failed": failed,
                "throttled_window_rows": throttled,
                "only_in_a": sorted(set(qa) - set(qb)),
                "only_in_b": sorted(set(qb) - set(qa)),
            },
            indent=2,
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
