#!/bin/bash
# Round-5 second scaling pair — the SAME 5M-doc local[2]/local[8] gate
# pair as BENCH/scaling.json, re-measured at HEAD in one short window.
#
# Why rerun a pair that already passes (0.941 at f4f7093): that pair's
# rev is one pipeline commit behind HEAD (53e0fb2 repartitions the
# bucket stream on band_key alone) and its 4.2 h window straddled a
# host phase change (pair_window_balanced false, understating bias).
# A pre-flight probe sweep (2/4/8/16 procs) shows the host is currently
# in a FAST, 2-vs-8-balanced phase (python_loop 3.59x, numpy_matmul
# 3.73x aggregate for 4x workers — both inside the finalize window
# [3.2, 5.0]) and that aggregate BLAS throughput DROPS from 8 to 16
# workers (3906 -> 3003 units/s), re-confirming the BASELINE.md choice
# of 2/8 as the widest host-provisioned pairing.  In this phase the
# pair's whole window is ~2.5-3 h, so one phase is likely to bracket
# both legs.
#
# Order: leg8 FIRST (cheap, ~35-55 min here) — an early wall far off
# the fast-phase estimate means the phase turned and the run should be
# reassessed before the ~2 h leg2.  Finalize is MANUAL after both legs
# (protocol: min wall per level, same-rev pairing; finalize pairs the
# newest rev holding both levels, i.e. this one).
#
# Heaps: the proven per-core-fair defaults (local[2] 8g, local[8] 24g)
# — identical to the f4f7093 pair, so walls are directly comparable.
set -u
cd "$(dirname "$0")"
WT=.wt-legs-r5b
if [ ! -d "$WT" ]; then
  git worktree add "$WT" HEAD || exit 1
  mkdir -p "$WT/BENCH"
  cp BENCH/runs_ledger.jsonl "$WT/BENCH/" 2>/dev/null || true
else
  git -C "$WT" fetch --quiet . HEAD 2>/dev/null
  git -C "$WT" reset --hard "$(git rev-parse HEAD)" || exit 1
  cp BENCH/runs_ledger.jsonl "$WT/BENCH/" 2>/dev/null || true
fi
MAIN_REV=$(git rev-parse HEAD)
WT_REV=$(git -C "$WT" rev-parse HEAD)
if [ "$MAIN_REV" != "$WT_REV" ]; then
  echo "worktree rev $WT_REV != main HEAD $MAIN_REV — aborting" >&2
  exit 1
fi
cd "$WT"
LOG=/root/repo/BENCH/legs_r5b.log
N=$(wc -l < BENCH/runs_ledger.jsonl)
echo "[$(date +%T)] leg8 start (ledger rows: $N, rev $(git rev-parse --short HEAD))" >> "$LOG"
python bench_scaling.py --leg 8 --docs 5000000 >> "$LOG" 2>&1
RC8=$?
echo "[$(date +%T)] leg8 rc=$RC8 ; leg2 start" >> "$LOG"
python bench_scaling.py --leg 2 --docs 5000000 >> "$LOG" 2>&1
RC2=$?
echo "[$(date +%T)] leg2 rc=$RC2" >> "$LOG"
tail -n +$((N+1)) BENCH/runs_ledger.jsonl >> /root/repo/BENCH/runs_ledger.jsonl
echo "[$(date +%T)] copied new rows to main ledger" >> "$LOG"
echo LEGS_DONE rc8=$RC8 rc2=$RC2
