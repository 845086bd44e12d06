#!/bin/bash
# Axon-relay recovery watcher: probe until one real execute round-trips,
# then run whatever command line was passed (default: the headline bench).
#
# Device ENUMERATION is not health — a worker crashed by a killed client
# still lists its chip and fails the first execute with FAILED_PRECONDITION
# (observed Aug 19 2026; bench.py's watchdog catches the same mode).  So the
# probe reduces one scalar on device and only then declares the relay up.
#
# Usage: bash scripts/relay_watch.sh [cmd...]
cd "$(dirname "$0")/.."
PROBE_LOG=$(mktemp /tmp/probe.XXXXXX.log)  # per-watcher: concurrent runs must not clobber
probe() {
  timeout 120 python - <<'PY' > "$PROBE_LOG" 2>&1
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()))
PY
}
n=0
while ! probe; do
  n=$((n+1))
  echo "probe $n failed $(date -u): $(tail -c 120 "$PROBE_LOG")"
  sleep 120
done
echo "RELAY HEALTHY after $n failed probes $(date -u)"
if [ $# -gt 0 ]; then
  exec "$@"
fi
exec timeout 1800 python bench.py
