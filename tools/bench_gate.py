"""Pre-snapshot perf gate: run the north-star bench and FAIL on regression.

Round-4 shipped a default that lost 27% of the north-star metric; its own
bench flagged it in ``regressions_gt_5pct`` and the round ended anyway
(VERDICT r4 weak #1).  This gate makes that flag blocking: it runs the
exact ``bench.py`` programs under the shipped defaults, compares against
the latest ``BENCH_r*.json`` (bench.py already does this), and exits
non-zero if

  * any tracked metric regressed >5% vs the previous round, or
  * the accelerator was unreachable (a carried-numbers artifact proves
    nothing about the shipped defaults), or
  * the bench line could not be parsed.

Run it before ending a round / before committing any perf-affecting
default (documented in CLAUDE.md):

    timeout 1800 python tools/bench_gate.py

Exit 0 = safe to snapshot.  Non-zero = fix or revert first.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=3600)
    line = (proc.stdout.strip().splitlines() or [""])[-1]
    try:
        result = json.loads(line)
    except json.JSONDecodeError:
        print("GATE FAIL: bench.py emitted no parseable JSON line")
        print("stdout:", proc.stdout[-2000:])
        print("stderr:", proc.stderr[-2000:])
        return 2

    extra = result.get("extra", {})
    print(json.dumps({k: extra.get(k) for k in (
        "prev_round_file", "vs_prev_round", "regressions_gt_5pct",
        "tpu_unavailable")}, indent=1))
    print(f"value = {result.get('value')} {result.get('unit')}")

    if extra.get("tpu_unavailable"):
        print("GATE FAIL: accelerator unreachable — carried numbers can't "
              "certify the shipped defaults; retry when the tunnel recovers")
        return 3
    regressions = extra.get("regressions_gt_5pct") or []
    # tunnel-p50 entries annotated as inside the measured same-code
    # backend-drift band (bench.py prev_round_comparison) are warnings:
    # there is nothing to fix or revert — the identical program measured
    # 2.56-3.51 ms across same-day runs.  Throughput keys and any
    # beyond-band p50 move still block.
    drift = [r for r in regressions if "backend-drift band" in r]
    hard = [r for r in regressions if r not in drift]
    for r in drift:
        print("GATE WARN (environment):", r)
    if hard:
        print("GATE FAIL: >5% regression vs previous round:")
        for r in hard:
            print("  -", r)
        return 1
    print("GATE PASS: no code-attributable >5% regressions vs previous "
          "round")
    return 0


if __name__ == "__main__":
    sys.exit(main())
