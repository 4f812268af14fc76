#!/usr/bin/env bash
# Backend-outage recovery poller (VERDICT r3 item 1a).
#
# The axon TPU tunnel goes hard-down for hours at a time (observed Aug 17-18:
# "Unable to initialize backend 'axon': UNAVAILABLE", with in-process
# jax.devices() HANGING >500 s).  This poller probes backend init in a
# subprocess every POLL_S seconds and, the moment the chip returns, runs the
# headline bench (and optionally extra recovery commands) exactly once,
# recording outputs under benchmarks/recovery/.
#
# Usage:
#   nohup bash benchmarks/recover.sh > /tmp/recover.log 2>&1 &
#   echo $! > /tmp/recover.pid        # kill "$(cat /tmp/recover.pid)" to stop
#
# Env:
#   POLL_S       probe interval, default 300
#   MAX_HOURS    give up after this many hours, default 24
#   EXTRA_CMDS   file of shell commands to run after the bench (one per line)
set -u
cd "$(dirname "$0")/.."
POLL_S="${POLL_S:-300}"
MAX_HOURS="${MAX_HOURS:-24}"
OUT_DIR="benchmarks/recovery"
mkdir -p "$OUT_DIR"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

echo "# recover.sh: polling backend every ${POLL_S}s (budget ${MAX_HOURS}h)"
while :; do
    if timeout 240 python -c "import jax; print(len(jax.devices()), jax.default_backend())" \
        > "$OUT_DIR/probe.out" 2> "$OUT_DIR/probe.err"; then
        backend=$(cat "$OUT_DIR/probe.out")
        echo "# $(date -Is) backend up: $backend — running bench"
        stamp=$(date +%Y%m%dT%H%M%S)
        # Bench already has its own init-wait + HBM-wait + retry ladder.
        STORAGE_TPU_BENCH_INIT_WAIT_S=600 timeout 5400 python bench.py \
            > "$OUT_DIR/bench_$stamp.json" 2> "$OUT_DIR/bench_$stamp.log"
        echo "# bench done (rc=$?):"
        cat "$OUT_DIR/bench_$stamp.json"
        if [ -n "${EXTRA_CMDS:-}" ] && [ -f "$EXTRA_CMDS" ]; then
            while IFS= read -r cmd; do
                [ -z "$cmd" ] && continue
                echo "# extra: $cmd"
                bash -c "$cmd" >> "$OUT_DIR/extra_$stamp.log" 2>&1
            done < "$EXTRA_CMDS"
        fi
        exit 0
    fi
    if [ "$(date +%s)" -ge "$deadline" ]; then
        echo "# $(date -Is) recovery budget exhausted; giving up"
        exit 1
    fi
    echo "# $(date -Is) backend still down ($(tail -c 200 "$OUT_DIR/probe.err" | tr '\n' ' '))"
    sleep "$POLL_S"
done
