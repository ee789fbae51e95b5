#!/bin/bash
# Runs the scaling benchmark at local[8] and local[32] in SEPARATE JVMs
# (fair JIT), then reports throughput at both levels + scaling efficiency.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling}
mkdir -p "$OUT"
for CPUS in 8 32; do
  echo "=== level local[$CPUS] ==="
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.ScalingBench $CPUS" 2>/dev/null \
    | grep -o '{"metric":"scaling_level".*}' > "$OUT/level_$CPUS.json"
  cat "$OUT/level_$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
r8 = json.load(open(f'{out}/level_8.json'))
r32 = json.load(open(f'{out}/level_32.json'))
eff = {}
for k in ['ingest_docs_per_sec', 'geocode_queries_per_sec', 'tile_points_per_sec']:
    eff[k.split('_')[0]] = round((r32[k] / r8[k]) / 4.0, 3)
rep = {"metric": "scaling_efficiency", "levels": [8, 32],
       "throughput_8": {k: r8[k] for k in r8 if k.endswith('per_sec')},
       "throughput_32": {k: r32[k] for k in r32 if k.endswith('per_sec')},
       "efficiency": eff}
print(json.dumps(rep, indent=1))
json.dump(rep, open(f'{out}/scaling.json', 'w'), indent=1)
EOF
