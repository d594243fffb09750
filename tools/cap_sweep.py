"""Pass-1 cap robustness sweep for the headline bench (VERDICT r4
weak #5: the r4 headline sat two knob-clicks from losing a lane —
cap-tuned + single-round rescue).  With the r5 multi-round rescue
(round 1 full cap, capped cleanup rounds) the batch must stay 128/128
across cap +-10; this records the evidence.

    python tools/cap_sweep.py [caps...]     # default 45 50 55 60 65

Writes bench/out/cap_sweep.json.  Each cap is a separate process (the
cap is trace-static); compiled executables persist in the jax cache.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    caps = [int(c) for c in sys.argv[1:]] or [45, 50, 55, 60, 65]
    rows = []
    for cap in caps:
        env = dict(os.environ, BENCH_ITERS=str(cap), BENCH_PARITY="0")
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, timeout=3000,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            rows.append({"cap": cap, "error": p.stderr[-500:]})
            print(f"cap {cap}: ERROR", flush=True)
            continue
        d = json.loads(line[-1])["detail"]
        rows.append({
            "cap": cap,
            "converged": d["converged"],
            "solves_per_s": d["converged_solves_per_s"],
            "iters_max": d["iters_max"],
        })
        print(f"cap {cap}: {d['converged']}/128 "
              f"{d['converged_solves_per_s']} solves/s", flush=True)
    out = {
        "B": 128,
        "note": "multi-round rescue (round-1 full cap + capped "
                "cleanup); 128/128 across the window is the "
                "robustness claim",
        "rows": rows,
    }
    path = os.path.join(REPO, "bench", "out", "cap_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
