#!/bin/bash
# Stall-supervised training (failure detection, SURVEY §5 — beyond the
# reference, which trains blind). The remote-TPU transport can silently drop
# a request; the training process then blocks forever in a d2h/compile wait
# with ~0 CPU, which no in-process exception handler can catch. This
# supervisor restarts the run from its newest checkpoint when the logbook
# stops advancing.
#
# Usage: bash scripts/train_watchdog.sh RUN_DIR STALL_SECS MAX_RESTARTS CMD...
#   RUN_DIR       the --run-dir passed to CMD (layout <run_dir>/<clip>/
#                 <checkname>/experiment_<n>/). MUST be dedicated to this
#                 run: the newest intermediate.json under it drives resume,
#                 so a shared dir would resume from an unrelated experiment.
#   STALL_SECS    no logbook growth for this long => stalled. Must exceed
#                 the longest expected cold compile (~600 s for the finest
#                 3D chunk through the tunnel); 900 is a good default.
#   MAX_RESTARTS  give up after this many restarts.
#   CMD...        the training command (train_image.py / train_video.py
#                 invocation). Must accept --netG/--intermediate for resume.
#
# On stall: SIGUSR1 first (the CLIs register a faulthandler — the stack dump
# lands in the process stderr for diagnosis), then SIGTERM/SIGKILL, then
# restart with --netG <newest ckpt> --intermediate <intermediate.json>.
set -u
run_dir=$1; stall=$2; max_restarts=$3; shift 3

# an external kill of the watchdog (timeout(1), a wall-clock budget, ^C)
# must not orphan the training child — it would keep holding the TPU
pid=""
trap 'if [ -n "$pid" ]; then kill -TERM "$pid" 2>/dev/null; sleep 5; \
      kill -KILL "$pid" 2>/dev/null; fi; exit 143' TERM INT

attempt=0
while :; do
    resume=()
    inter=$(ls -t "$run_dir"/*/*/experiment_*/intermediate.json 2>/dev/null | head -1)
    if [ -n "${inter:-}" ]; then
        exp_dir=$(dirname "$inter")
        # prefer a mid-scale inflight checkpoint (--ckpt-interval): resuming
        # from it continues the scale bit-exactly instead of retraining it
        read -r idx inf <<< "$(python3 -c "import json,sys
d=json.load(open(sys.argv[1])); print(d['scale_idx'], d.get('inflight',''))" "$inter")"
        if [ -n "${inf:-}" ] && [ -f "$exp_dir/$inf" ]; then
            ckpt="$exp_dir/$inf"
        else
            ckpt="$exp_dir/netG_${idx:-MISSING}.ckpt"
        fi
        if [ -f "$ckpt" ]; then
            resume=(--netG "$ckpt" --intermediate "$inter")
        else
            # an intermediate.json EXISTS but its checkpoint cannot be
            # resolved (probe failure, missing/renamed file). Starting a
            # fresh run here would silently abandon every completed scale —
            # and the fresh run's newer intermediate.json would then pin
            # all future restarts to the scratch run. Refuse instead.
            echo "watchdog: $inter exists but checkpoint '$ckpt' is" \
                 "missing/unresolvable — refusing to restart from scratch" \
                 "(delete the experiment dir to really start fresh)"
            exit 1
        fi
    fi
    "$@" "${resume[@]}" &
    pid=$!
    start_ts=$(date +%s)
    echo "watchdog: started pid $pid (attempt $attempt, resume: ${resume[*]:-fresh})"

    stalled=0
    while kill -0 "$pid" 2>/dev/null; do
        # interruptible sleep: a trap on TERM/INT fires only between
        # commands, and bash defers it until a foreground child exits —
        # `sleep & wait` lets the signal cut the wait immediately
        sleep 30 & wait $! 2>/dev/null
        log=$(ls -t "$run_dir"/*/*/experiment_*/logbook.txt 2>/dev/null | head -1)
        ref=$start_ts
        if [ -n "${log:-}" ]; then
            m=$(stat -c %Y "$log")
            [ "$m" -gt "$ref" ] && ref=$m
        fi
        now=$(date +%s)
        if [ $((now - ref)) -ge "$stall" ]; then
            echo "watchdog: no progress for $((now - ref))s — dumping stacks and restarting"
            kill -USR1 "$pid" 2>/dev/null; sleep 5
            kill -TERM "$pid" 2>/dev/null; sleep 10
            kill -KILL "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            stalled=1
            break
        fi
    done

    if [ "$stalled" = 0 ]; then
        wait "$pid"; rc=$?
        if [ "$rc" = 0 ]; then
            echo "watchdog: training completed"
            exit 0
        fi
        echo "watchdog: training exited rc=$rc"
    fi
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$max_restarts" ]; then
        echo "watchdog: giving up after $max_restarts restarts"
        exit 1
    fi
done
