"""Interleaved b1 A/B: separate ambient drift from XLA compile lottery.

Context (r5): the b1 D0@512 XLA forward measured 0.14 / 0.78 / 1.41
ms/iter across three different processes, while the fused-stem variant of
the same model measured a stable 1.35-1.40 everywhere.  Two hypotheses:

- ambient: the tunnel/device slows over time → both programs drift
  together inside one process;
- compile lottery: XLA's b1 compile is bimodal across processes →
  in-process blocks are flat, and only a fresh process re-rolls.

This probe measures BOTH programs in alternating blocks inside one
process (xla, fused, xla, fused, ...), each block a (1,129)+(1,257)
two-scale slope.  Run it 2-3 times (fresh processes) and compare:
flat-in-process + different-across-runs = lottery; co-moving blocks =
ambient.  Prints per-block values; writes nothing (diagnostic only).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from probe_b1_serving_fused import build, two_scale


def main(blocks=3):
    import jax
    print(f"devices: {jax.devices()}  interleaved b1 fwd A/B, "
          f"{blocks} blocks")
    runs = build()
    for i in range(blocks):
        for name in ("fwd_xla", "fwd_fused"):
            ms, lin = two_scale(runs[name])
            print(f"block {i} {name:10s}: {ms * 1e3:7.3f} ms/iter "
                  f"(linerr {lin:4.1f}%)  [{time.strftime('%H:%M:%S')}]")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
