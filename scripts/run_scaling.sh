#!/bin/bash
# Runs the scaling benchmark at local[8] and local[32], INTERLEAVED over
# several rounds in separate JVMs (fair JIT, averages out shared-host
# noise), then reports median throughput per level + scaling efficiency.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/scaling}
ROUNDS=${ROUNDS:-3}
mkdir -p "$OUT"
for R in $(seq 1 "$ROUNDS"); do
  for CPUS in 8 32; do
    echo "=== round $R level local[$CPUS] ==="
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} sbt -batch "runMain graft.ScalingBench $CPUS" 2>/dev/null \
      | grep -o '{"metric":"scaling_level".*}' > "$OUT/level_${CPUS}_r${R}.json"
    cat "$OUT/level_${CPUS}_r${R}.json"
  done
done
python3 - "$OUT" "$ROUNDS" <<'EOF2'
import json, sys, statistics, glob
out, rounds = sys.argv[1], int(sys.argv[2])
keys = ['ingest_docs_per_sec', 'geocode_queries_per_sec', 'tile_points_per_sec']
med = {}
for cpus in (8, 32):
    runs = [json.load(open(f)) for f in sorted(glob.glob(f'{out}/level_{cpus}_r*.json'))]
    med[cpus] = {k: statistics.median(r[k] for r in runs) for k in keys}
    med[f'{cpus}_all'] = {k: [round(r[k]) for r in runs] for k in keys}
eff = {k.split('_')[0]: round((med[32][k] / med[8][k]) / 4.0, 3) for k in keys}
rep = {"metric": "scaling_efficiency", "levels": [8, 32], "rounds": rounds,
       "median_8": med[8], "median_32": med[32],
       "all_8": med['8_all'], "all_32": med['32_all'], "efficiency": eff}
print(json.dumps(rep, indent=1))
json.dump(rep, open(f'{out}/scaling.json', 'w'), indent=1)
EOF2
