"""ATE sensitivity sweep (de-circularizes the bench envelope): batched
bench accuracy over {LM candidates} × {LK iters} × {sensor degradation},
each cell reporting all-sequence ATE mean/max + aggregate fps.

The round-2 envelope (4 LM candidates, LK 12/6) was justified only on the
clean bench scene; this sweep re-validates it under the D435i failure
modes the reference is engineered for (depth noise/holes, exposure drift,
rolling shutter, a moving object).

Run on TPU (slow — each distinct (iters, lk, degrade) cell compiles its
own scan program; results append to sweep_ate.json):

    python scripts/sweep_ate.py            # full grid
    SWEEP_CELLS=4:12:mild python scripts/sweep_ate.py   # one cell
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def cells():
    spec = os.environ.get("SWEEP_CELLS", "")
    if spec:
        for c in spec.split(","):
            si, lk, deg = c.split(":")
            yield int(si), int(lk), deg
        return
    # LM-candidate axis under each degradation level (LK fixed 12)
    for deg in ("off", "mild", "harsh"):
        for si in (2, 4, 8):
            yield si, 12, deg
    # LK axis at the default 4 candidates, mild degradation
    for lk in (8, 16):
        yield 4, lk, "mild"


def main():
    bench._setup_jax()
    import jax

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sweep_ate.json")
    results = []
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    done = {(r["lm"], r["lk"], r["degrade"]) for r in results}
    os.environ.setdefault("BENCH_LOOP", "0")  # accuracy sweep: isolate VIO
    for si, lk, deg in cells():
        if (si, lk, deg) in done:
            continue
        os.environ["BENCH_SOLVER_ITERS"] = str(si)
        os.environ["BENCH_LK_ITERS"] = str(lk)
        os.environ["BENCH_LK_COARSE"] = str(max(lk // 2, 4))
        os.environ["BENCH_DEGRADE"] = deg
        t0 = time.time()
        try:
            r = bench.run_batched()
        except Exception as e:  # record the failure, keep sweeping
            r = {"error": repr(e)}
        row = dict(lm=si, lk=lk, degrade=deg,
                   ate_m=r.get("ate_m"), ate_max_m=r.get("ate_max_m"),
                   fps=r.get("value"), error=r.get("error"),
                   wall_s=round(time.time() - t0, 1))
        print(json.dumps(row), flush=True)
        results.append(row)
        json.dump(results, open(out_path, "w"), indent=1)
        jax.clear_caches()  # bound host RAM across many compiled variants

    # markdown table for docs/PERFORMANCE.md
    print("\n| LM cand | LK iters | degrade | ATE mean (m) | ATE max (m) | fps |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['lm']} | {r['lk']} | {r['degrade']} | {r['ate_m']} "
              f"| {r['ate_max_m']} | {r['fps']} |")


if __name__ == "__main__":
    main()
