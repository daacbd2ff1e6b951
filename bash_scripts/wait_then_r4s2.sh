#!/usr/bin/env bash
# Wait for the r4s1 chain to exit, then launch the r4s2 chain.
# Usage: nohup bash bash_scripts/wait_then_r4s2.sh > /tmp/chain_r4s2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R4S1_PID="${R4S1_PID:-18107}"
echo "== waiting for r4s1 chain (pid $R4S1_PID) to exit"
while kill -0 "$R4S1_PID" 2>/dev/null; do sleep 120; done
echo "== r4s1 exited at $(date +%H:%M:%S); 60s settle, then r4s2"
sleep 60
exec bash bash_scripts/tpu_chain_r4s2.sh
