#!/bin/bash
# Kill the s5 TPU queue (and its descendants, by PID walk — never by name
# pattern) after a deadline, so the driver's end-of-round bench.py gets the
# chip to itself. Usage: queue_watchdog.sh <queue_pid> <deadline_seconds>
QPID=$1
DEADLINE=${2:-3000}
sleep "$DEADLINE"
kill_tree() {
  # Kill the parent FIRST (SIGSTOP would also work, but the queue script
  # only forks between jobs) so it cannot fork a new child between the ps
  # walk and the kills; then descend into the (now orphaned, but still
  # enumerable) children. Prefer the process group when the queue was
  # launched with setsid: that kills the whole tree atomically.
  local pid=$1
  local pgid
  pgid=$(ps -o pgid= -p "$pid" 2>/dev/null | tr -d ' ')
  if [ -n "$pgid" ] && [ "$pgid" != "$$" ] && [ "$pgid" != "0" ]; then
    kill -- "-$pgid" 2>/dev/null && return
  fi
  kill "$pid" 2>/dev/null
  for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$child"
  done
}
if kill -0 "$QPID" 2>/dev/null; then
  echo "$(date -u +%T) WATCHDOG: deadline hit, killing queue tree $QPID" >> /root/repo/outputs/tpu_queue/queue.log
  kill_tree "$QPID"
fi
