#!/bin/bash
# One-shot evidence landing: probe the tunnel, run the full bench, save the
# headline JSON line AND the full record under results/, commit both, and
# print the headline numbers.  Run from the repo root when the tunnel is
# healthy (probe <~5 s).
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
out="results/bench_r5_$(date -u +%Y%m%dT%H%M%S).json"
mkdir -p results
echo "running bench (internal budget 1150s, hard cap 1800s)..."
if ! ONCDE_BENCH_BUDGET_S=1150 timeout 1800 python bench.py | tail -1 > "$out"; then
  echo "bench FAILED (rc=$?) - removing $out"; rm -f "$out"; exit 1
fi
if ! python -c "import json,sys; json.loads(open(sys.argv[1]).read())" "$out"; then
  echo "bench output not parseable - removing $out"; rm -f "$out"; exit 1
fi
echo "saved $out (headline)"
# The headline points at the full record written by bench.py's _emit.
full=$(python -c "import json,sys; print(json.loads(open(sys.argv[1]).read()).get('full_record') or '')" "$out")
echo "full record: $full"
# results/ is gitignored (run artifacts); the landed evidence records are
# the exception — force-add them so the round's history carries them.
if git add -f "$out" ${full:+"$full"} && \
   git commit -q -m "Land hardware bench evidence: $out" -- "$out" ${full:+"$full"}; then
  echo "committed $out ${full}"
else
  echo "WARNING: evidence saved but NOT committed - commit manually"
fi
python - "$out" << 'PY'
import json, sys
h = json.loads(open(sys.argv[1]).read())
print("headline:", json.dumps(h, indent=1))
full = h.get("full_record")
try:
    d = json.loads(open(full).read())
except Exception as e:
    print("full record unreadable:", e); sys.exit(0)
print("errors:", d.get("errors"))
for c in d.get("configs", []):
    print("-", c.get("config", "?")[:60])
print("concurrency_grid:", json.dumps(d.get("concurrency_grid"), indent=1)[:900])
print("mfu_grid:", json.dumps(d.get("mfu_grid"), indent=1)[:600])
PY
