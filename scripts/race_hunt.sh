#!/bin/bash
# r18 instrumentation: loop the full concurrent verify+compare hunting the
# driver's one-off pack_sequences hash mismatch (a tie/race would show as a
# sporadic VALUES failure). Usage: race_hunt.sh [iterations] [sfdir]
set -u
N=${1:-20}
SF=${2:-/root/testdata/sf0.01}
OUT=/tmp/gv18_race
LOG=/tmp/gv18_race_hunt.log
: > "$LOG"
for i in $(seq 1 "$N"); do
  rm -rf "$OUT"
  sbt -batch "runMain graft.Verify $SF $OUT" > /tmp/gv18_race_verify.log 2>&1
  res=$(python3 scripts/verify_local.py "$SF" "$OUT" 2>&1 | tail -1)
  echo "iter $i: $res" >> "$LOG"
  case "$res" in
    *" 0 fail") : ;;
    *) python3 scripts/verify_local.py "$SF" "$OUT" 2>&1 \
         | grep -v '^PASS' >> "$LOG" ;;
  esac
done
echo DONE >> "$LOG"
