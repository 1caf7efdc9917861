#!/usr/bin/env python3
"""Record the native PJRT runner's measured serving latency into
benchdata/serving_latency.json, which bench.py reports as the
serving_warm_ms field of its JSON line (BASELINE.md row 1: the reference's
`time_Result/test_perform_static.txt` contract, ascend310_infer/main.cc:127-143).

Usage: python scripts/record_serving_latency.py EXPERIMENT_DIR [WORKLOAD_DESC]
Run AFTER `bash scripts/run_infer_tpu.sh EXPERIMENT_DIR` (which writes
EXPERIMENT_DIR/time_Result/test_perform_static.txt). With NUM_SAMPLES>1 the
runner averages over the non-warmup inferences — prefer that for a stable
warm number.
"""

import datetime
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if len(sys.argv) < 2:
    raise SystemExit(__doc__)
exp_dir = sys.argv[1]
workload = sys.argv[2] if len(sys.argv) > 2 else "256px full-depth 2D sampler"

report = os.path.join(exp_dir, "time_Result", "test_perform_static.txt")
text = open(report).read()
m = re.search(r"average time:\s*([0-9.]+)\s*ms of infer_count\s*(\d+)", text)
if not m:
    raise SystemExit(f"no average time in {report}: {text!r}")
infer_count = int(m.group(2))

out = {
    "warm_ms": round(float(m.group(1)), 2),
    "date": datetime.date.today().isoformat(),
    "workload": workload,
    # provenance from the report itself, not a hardcoded claim: the runner
    # averages over infer_count non-warmup inferences (main.cc report line)
    "how": f"bash scripts/run_infer_tpu.sh <exp_dir> then this script; "
           f"warm average over {infer_count} non-warmup inference(s) "
           "(NUM_SAMPLES controls the count), incl. h2d/d2h through the "
           "axon tunnel",
    "infer_count": infer_count,
    "report": text.strip(),
}
dst = os.path.join(repo, "benchdata", "serving_latency.json")
with open(dst, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", dst, "->", out["warm_ms"], "ms")
