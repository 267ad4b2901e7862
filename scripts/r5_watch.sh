#!/bin/bash
# Probe the tunnel every 8 min; run the r5 session once it's up.
cd "$(dirname "$0")/.."
for i in $(seq 1 60); do
  if bash scripts/r5_session.sh; then exit 0; fi
  rc=$?
  [ $rc -ne 3 ] && exit $rc   # session ran but failed mid-way: stop
  sleep 480
done
