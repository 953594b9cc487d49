"""Summarize same-code best-observed pairs from BENCH_HISTORY.json.

Pure stdlib (safe to run while a bench is in flight — no Spark/JVM).
For each (cores_n, cores_4n, turns) pair config on the CURRENT code
fingerprint, prints n_runs, per-side minima, and the best-observed
scaling efficiency — the round-6 bar is >= 0.8 with n_runs >= 5.

    python tools/pair_status.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (only for the fingerprint helpers; no Spark)


def main() -> int:
    with open(os.path.join(bench.REPO, "BENCH_HISTORY.json")) as fh:
        history = json.load(fh)
    code = bench._code_fingerprint()
    qcode = bench._code_fingerprint(include_queries=True)

    pairs: dict[tuple, list[dict]] = {}
    for h in history:
        if h.get("code") == code and "t_n_sec" in h:
            key = (h["cores_n"], h["cores_4n"], h["turns"])
            pairs.setdefault(key, []).append(h)

    print(f"code fingerprint (phase B): {code}")
    for (n, n4, turns), runs in sorted(pairs.items()):
        best_n = min(r["t_n_sec"] for r in runs)
        best_4n = min(r["t_4n_sec"] for r in runs)
        eff = (best_n / best_4n) / (n4 / n)
        effs = sorted(round((r["t_n_sec"] / r["t_4n_sec"]) / (n4 / n), 3)
                      for r in runs)
        bar = "MEETS" if eff >= 0.8 and len(runs) >= 5 else "below"
        print(f"  ({n},{n4}) turns={turns}: n_runs={len(runs)} "
              f"best_n={best_n:.2f}s best_4n={best_4n:.2f}s "
              f"best_observed_eff={eff:.3f} [{bar} the 0.8/n>=5 bar] "
              f"in-window effs={effs}")

    qruns = [h for h in history
             if h.get("kind") == "queries" and h.get("code") == qcode]
    if qruns:
        names = qruns[0]["timings"].keys()
        best = {k: min(r["timings"][k] for r in qruns if k in r["timings"])
                for k in names}
        print(f"phase A (queries, code {qcode}): n_rounds={len(qruns)} "
              f"best_total={round(sum(best.values()), 3)}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
