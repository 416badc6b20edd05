#!/bin/bash
# One-shot evidence landing: probe the tunnel, run the full bench, save the
# JSON line under results/ with a timestamp, and print the headline numbers.
# Run from the repo root when the tunnel is healthy (probe <~5 s).
set -u -o pipefail
cd "$(dirname "$0")/.."
echo "probing tunnel..."
if ! timeout 300 python -c "
import time, jax, jax.numpy as jnp
t0=time.time(); jax.devices()
x=jnp.ones((64,64)); v=float((x@x).sum())
print(f'probe ok in {time.time()-t0:.1f}s')
"; then
  echo "tunnel down - not running bench"; exit 1
fi
out="results/bench_r4_$(date -u +%Y%m%dT%H%M%S).json"
mkdir -p results
echo "running bench (internal budget 900s, hard cap 1500s)..."
if ! timeout 1500 python bench.py | tail -1 > "$out"; then
  echo "bench FAILED (rc=$?) - removing $out"; rm -f "$out"; exit 1
fi
if ! python -c "import json,sys; json.loads(open(sys.argv[1]).read())" "$out"; then
  echo "bench output not parseable - removing $out"; rm -f "$out"; exit 1
fi
echo "saved $out"
# results/ is gitignored (run artifacts); the landed evidence record is
# the exception — force-add it so the round's history carries it.
if git add -f "$out" && git commit -q -m "Land hardware bench evidence: $out" -- "$out"; then
  echo "committed $out"
else
  echo "WARNING: evidence saved but NOT committed - commit $out manually"
fi
python - "$out" << 'PY'
import json, sys
d = json.loads(open(sys.argv[1]).read())
print("value:", d.get("value"), "vs_baseline:", d.get("vs_baseline"))
print("flagship_ms:", d.get("flagship_mimic_scale_step_ms"),
      "midpoint:", d.get("flagship_midpoint_bwd_step_ms"))
print("pallas_parity:", d.get("pallas_parity"))
print("errors:", d.get("errors"))
for c in d.get("configs", []):
    print("-", c.get("config", "?")[:60])
print("mfu_grid:", json.dumps(d.get("mfu_grid"), indent=1)[:800])
PY
