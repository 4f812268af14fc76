#!/usr/bin/env bash
# Backend-outage recovery poller (VERDICT r3 item 1a).
#
# The axon TPU tunnel goes hard-down for hours at a time (observed Aug 17-18:
# "Unable to initialize backend 'axon': UNAVAILABLE", with in-process
# jax.devices() HANGING >500 s).  This poller probes backend init in a
# subprocess every POLL_S seconds and, the moment the chip returns, runs the
# headline bench (and optionally extra recovery commands), recording outputs
# under benchmarks/recovery/.
#
# A FLAKY recovery must not burn the one-shot measurement queue: the extra
# commands only run after a GENUINE bench success (a fresh-measurement JSON
# line, not the stale-ledger fallback and not a failure record).  A probe
# that succeeds but a bench that then fails sends the poller back to
# polling, up to MAX_BENCH_TRIES genuine attempts (a chip that is up but
# tenant-held for hours would otherwise loop forever — after the cap the
# extras run anyway and rely on their own timeouts).
#
# Usage:
#   nohup bash benchmarks/recover.sh > /tmp/recover.log 2>&1 &
#   echo $! > /tmp/recover.pid        # kill "$(cat /tmp/recover.pid)" to stop
#
# Env:
#   POLL_S           probe interval, default 300
#   MAX_HOURS        give up after this many hours, default 24
#   MAX_BENCH_TRIES  genuine-bench attempts before extras run regardless (5)
#   EXTRA_CMDS       file of shell commands to run after the bench (one per line)
set -u
cd "$(dirname "$0")/.."
POLL_S="${POLL_S:-300}"
MAX_HOURS="${MAX_HOURS:-24}"
MAX_BENCH_TRIES="${MAX_BENCH_TRIES:-5}"
OUT_DIR="benchmarks/recovery"
mkdir -p "$OUT_DIR"
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))
bench_tries=0

run_extras() {
    local stamp="$1"
    if [ -n "${EXTRA_CMDS:-}" ] && [ -f "$EXTRA_CMDS" ]; then
        while IFS= read -r cmd; do
            [ -z "$cmd" ] && continue
            echo "# $(date -Is) extra: $cmd"
            bash -c "$cmd" >> "$OUT_DIR/extra_$stamp.log" 2>&1
            echo "# extra rc=$?"
        done < "$EXTRA_CMDS"
    fi
}

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
        rc=$?
        echo "# bench done (rc=$rc):"
        cat "$OUT_DIR/bench_$stamp.json"
        bench_tries=$((bench_tries + 1))
        # Genuine success = a seconds-unit line that is neither the
        # stale-ledger fallback nor a failure record.
        if [ "$rc" -eq 0 ] \
            && grep -q '"unit": "s"' "$OUT_DIR/bench_$stamp.json" \
            && ! grep -q '"stale": true' "$OUT_DIR/bench_$stamp.json" \
            && ! grep -q 'bench failed' "$OUT_DIR/bench_$stamp.json"; then
            echo "# $(date -Is) genuine bench success — running extras"
            run_extras "$stamp"
            exit 0
        fi
        if [ "$bench_tries" -ge "$MAX_BENCH_TRIES" ]; then
            echo "# $(date -Is) $bench_tries bench attempts without a genuine" \
                 "measurement — running extras anyway (their own timeouts apply)"
            run_extras "$stamp"
            exit 1
        fi
        echo "# $(date -Is) bench not genuine (attempt $bench_tries/$MAX_BENCH_TRIES); resuming polling"
    fi
    if [ "$(date +%s)" -ge "$deadline" ]; then
        echo "# $(date -Is) recovery budget exhausted; giving up"
        exit 1
    fi
    echo "# $(date -Is) backend still down ($(tail -c 200 "$OUT_DIR/probe.err" | tr '\n' ' '))"
    sleep "$POLL_S"
done
