"""Record the production serving-latency estimate (round-3 verdict item 9).

The dev harness reaches the TPU through the axon tunnel, whose ~30 ms RPC
floor dominates any naive request timing (`yolov4_640_p50_ms` ≈ 33 ms says
nothing about the product).  A production deployment has local dispatch,
so its p50 decomposes into the parts this repo has already measured
honestly:

- host request prep (base64 decode → JPEG decode → letterbox), native
  C++ path: ``serving_host_prep_native_ms``
- on-device image→boxes (forward + anchor decode + class-aware NMS),
  slope-method device time from the latest BENCH artifact:
  ``*_p50_image_to_boxes_ms_device``
- host response (unletterbox → clip → filter → draw → JPEG encode),
  native path: ``serving_host_resp_native_ms``

This tool sums them per model into ``serving_p50_production_estimate_*``
keys in baseline_measured.json.  It re-reads, never re-measures: each
component's methodology lives with its own tool (bench.py slope method,
tools/bench_serving_latency.py host split).
"""

import glob
import json
import os

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "baseline_measured.json")


def main():
    with open(BASELINE) as f:
        measured = json.load(f)

    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    assert benches, "no BENCH_r*.json artifact with device p50s"
    with open(benches[-1]) as f:
        bench = json.load(f)
    if "parsed" in bench:
        bench = bench["parsed"]
    extra = bench["extra"]

    prep = measured["serving_host_prep_native_ms"]
    resp = measured["serving_host_resp_native_ms"]
    out = {}
    for model, device_key in (
        ("yolov4_640", "yolov4_640_p50_image_to_boxes_ms_device"),
        ("d0_512", "efficientdet_d0_p50_image_to_boxes_ms_device"),
    ):
        device = extra[device_key]
        out[f"serving_p50_production_estimate_{model}_ms"] = round(
            prep + device + resp, 2)
        out[f"serving_p50_device_{model}_ms"] = device
    out["serving_p50_production_note"] = (
        "host-native prep (base64+JPEG decode+letterbox, "
        f"{prep} ms) + slope-method device image->boxes (from "
        f"{os.path.basename(benches[-1])}) + host-native response "
        f"(unletterbox+draw+encode, {resp} ms); the ~33 ms "
        "yolov4_640_p50_ms is the dev tunnel's RPC floor, not the product")

    from tools._prov import update_measured
    update_measured(out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
