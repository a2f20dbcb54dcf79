#!/bin/bash
# Wait for loadavg < $GATE (default 0.6), then run bench. Args passed via env.
GATE="${GATE:-0.6}"
MAX_WAIT="${MAX_WAIT:-1800}"
waited=0
while :; do
    la=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $la < $GATE else 0)")
    [ "$ok" = "1" ] && break
    [ "$waited" -ge "$MAX_WAIT" ] && { echo "GATE TIMEOUT at loadavg=$la"; break; }
    sleep 15; waited=$((waited+15))
done
echo "gate passed: loadavg=$(cut -d' ' -f1 /proc/loadavg) after ${waited}s"
exec python bench.py
