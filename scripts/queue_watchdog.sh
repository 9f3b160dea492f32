#!/bin/bash
# Kill the s5 TPU queue (and its descendants, by PID walk — never by name
# pattern) after a deadline, so the driver's end-of-round bench.py gets the
# chip to itself. Usage: queue_watchdog.sh <queue_pid> <deadline_seconds>
QPID=$1
DEADLINE=${2:-3000}
sleep "$DEADLINE"
kill_tree() {
  local pid=$1
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
  kill "$pid" 2>/dev/null
}
if kill -0 "$QPID" 2>/dev/null; then
  echo "$(date -u +%T) WATCHDOG: deadline hit, killing queue tree $QPID" >> /root/repo/outputs/tpu_queue/queue.log
  kill_tree "$QPID"
fi
