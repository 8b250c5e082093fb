#!/bin/bash
# Respawn supervisor: waits for the CURRENT watcher (by PID) to exit,
# then relaunches tpu_watch.sh detached — so the tunnel stays watched
# for the rest of the round even after the watcher's 60-probe loop
# ends. Never runs two watchers at once (waits for exit first).
set -u
WATCH_PID="${1:?usage: tpu_watch_respawn.sh <current-watcher-pid>}"
while kill -0 "$WATCH_PID" 2>/dev/null; do
  sleep 60
done
# If the watcher succeeded it leaves its session log; either way a new
# probe loop is harmless (it exits on first success after running the
# pipeline).
cd /root/repo
setsid nohup bash experiments/tpu_watch.sh < /dev/null \
    >> /tmp/tpu_watch_nohup.log 2>&1 &
echo "$(date +%H:%M:%S) respawned watcher pid $!" >> /tmp/tpu_watch.log
