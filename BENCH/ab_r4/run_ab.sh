#!/bin/bash
# Same-window A/B: r2 snapshot (6d612fe) vs HEAD (b247bff) bench.py at local[32], sf0.1.
# Interleaved ABAB so a mid-window phase drift cannot masquerade as a rev effect.
set -u
OUT=/root/repo/BENCH/ab_r4
probe() {
  python - <<'PY'
import sys; sys.path.insert(0, '/root/repo')
from bench_scaling import cpu_probe
import json; print(json.dumps(cpu_probe(4, dur=8.0)))
PY
}
echo "{\"event\":\"probe_start\",\"probe\":$(probe)}" >> $OUT/ab.jsonl
for i in 1 2; do
  for rev in r2 head; do
    if [ $rev = r2 ]; then D=/root/repo/.wt-r2; else D=/root/repo/.wt-legs; fi
    t0=$(date +%s)
    (cd $D && python bench.py > $OUT/bench_${rev}_$i.json 2> $OUT/bench_${rev}_$i.err)
    rc=$?
    t1=$(date +%s)
    echo "{\"event\":\"bench\",\"rev\":\"$rev\",\"iter\":$i,\"rc\":$rc,\"proc_wall\":$((t1-t0))}" >> $OUT/ab.jsonl
  done
done
echo "{\"event\":\"probe_end\",\"probe\":$(probe)}" >> $OUT/ab.jsonl
echo DONE
