#!/bin/bash
# (checked in from /tmp/tpu_queue3.sh — round-4 TPU evidence queue; safe to
# relaunch: every step is skipped once its artifact exists)
# Round-4 TPU queue v3: quick evidence first, long runs after, hard cutoff.
#
# Rationale (09:07 UTC): the tunnel has been down >9 h. If it returns late,
# v2's order (3h trajectory first) banks nothing before the round ends and
# could still hold the chip when the driver runs bench.py. v3 runs the
# ~20-30 min steps first (bench / op profile / ckpt A/B -> directives 3,7,6),
# then the 3 h trajectory (directive 1), BO (2), decode A/B (5). No new step
# starts after CUTOFF_START; per-step timeouts are clamped to CUTOFF_HARD so
# the chip is free for the driver's end-of-round bench.
cd /root/repo
Q=/tmp/tpu_queue.log
# Defaults: the original round-4 window (18:20/19:00 UTC) — but a RELAUNCH
# after that time would see an already-past cutoff and exit 0 before running
# any step, so fall back to a launch-relative window instead (review r4).
CUTOFF_START=${CUTOFF_START:-$(date -u -d "today 18:20" +%s)}
CUTOFF_HARD=${CUTOFF_HARD:-$(date -u -d "today 19:00" +%s)}
NOW=$(date +%s)
if [ "$CUTOFF_START" -le "$NOW" ]; then
  CUTOFF_START=$((NOW + 8 * 3600))
  CUTOFF_HARD=$((CUTOFF_START + 40 * 60))
fi

probe () {
  timeout 600 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((128,128)).sum()), flush=True)" >> /tmp/q_probe.log 2>&1
}

wait_for_tpu () {
  for i in $(seq 1 200); do
    [ "$(date +%s)" -ge "$CUTOFF_START" ] && { echo "[wait_for_tpu] cutoff reached" >> $Q; exit 0; }
    echo "[wait_for_tpu v3 $i] $(date -u +%H:%M:%S)" >> $Q
    probe && { echo "[wait_for_tpu] UP $(date -u +%H:%M:%S)" >> $Q; return 0; }
    sleep 180
  done
  return 1
}

run_step () {
  local name="$1"; local tmo="$2"; shift 2
  local now rem
  now=$(date +%s)
  [ "$now" -ge "$CUTOFF_START" ] && { echo "[$name] skipped: past start-cutoff" >> $Q; return 1; }
  rem=$(( CUTOFF_HARD - now ))
  [ "$rem" -lt 600 ] && { echo "[$name] skipped: <10min to hard cutoff" >> $Q; return 1; }
  [ "$tmo" -gt "$rem" ] && tmo=$rem
  for attempt in 1 2; do
    echo "[$name attempt $attempt tmo=$tmo] $(date -u +%H:%M:%S)" >> $Q
    PYTHONUNBUFFERED=1 timeout "$tmo" "$@" > /tmp/q_${name}.log 2>&1
    rc=$?
    echo "[$name attempt $attempt] rc=$rc $(date -u +%H:%M:%S)" >> $Q
    [ $rc -eq 0 ] && return 0
    [ "$(date +%s)" -ge "$CUTOFF_START" ] && { echo "[$name] no retry: past cutoff" >> $Q; return 1; }
    wait_for_tpu
  done
  echo "[$name] FAILED" >> $Q
  return 1
}

# Whatever way this script exits, never leave the CPU study suspended.
trap '[ -f /tmp/dstudy_q.pid ] && kill -CONT "$(cat /tmp/dstudy_q.pid)" 2>/dev/null' EXIT

echo "=== queue v3 start $(date -u) (cutoff_start=$(date -u -d @$CUTOFF_START +%H:%M) hard=$(date -u -d @$CUTOFF_HARD +%H:%M)) ===" >> $Q
wait_for_tpu || { echo "tunnel never came back" >> $Q; exit 1; }

# Pause the CPU-side destabilization study while the chip is fed from this
# host (synthetic feed + fetches are host-side; contention skews perf runs).
[ -f /tmp/dstudy_q.pid ] && kill -STOP "$(cat /tmp/dstudy_q.pid)" 2>/dev/null

# --- quick evidence first -------------------------------------------------
run_step bench 3600 python bench.py

[ -f OP_PROFILE_r4.json ] || run_step opprof 3600 python -m benchmarks.op_profile --trace --json_out OP_PROFILE_r4.json

[ -f CKPT_DTYPE_AB_r4.json ] || run_step ckab 3600 python -m benchmarks.ckpt_dtype_ab --out CKPT_DTYPE_AB_r4.json

# --- long runs ------------------------------------------------------------
[ -f REPRODUCTION_SYNTH_r4.json ] || run_step traj 10800 python -m disentangle_mlp_tpu.cli.reproduce \
  --name r4traj32k --synthetic_data True --synthetic_train_size 32768 \
  --stats_out .traj_r4/stats_32k.npz --stats_images 32768 --calib_images 8192 \
  --save_path ".traj_r4/%" --log_path ".traj_r4/%/log" \
  --checkpoint_every 0 --report_out REPRODUCTION_SYNTH_r4.json

[ -f BO_RUN_r4.json ] || run_step bo 10800 python -m disentangle_mlp_tpu.cli.bo \
  --name bo_r4 --posterior_only False --bo_iterations 6 --bo_epochs 2 \
  --bo_report BO_RUN_r4.json \
  --synthetic_data True --synthetic_train_size 8192 --n_samples 1000 \
  --checkpoint_every 0 --calc_fid True \
  --save_path ".bo_r4/%" --log_path ".bo_r4/%/log" \
  --fid_path_pretrained .traj_r4/stats_32k.npz

[ -f DECODE_WARM_AB_r4.json ] || run_step warmab 7200 python -m benchmarks.decode_warm_ab \
  --image_root /tmp/ab_imgs/train --out DECODE_WARM_AB_r4.json

[ -f /tmp/dstudy_q.pid ] && kill -CONT "$(cat /tmp/dstudy_q.pid)" 2>/dev/null
echo "=== queue v3 done $(date -u) ===" >> $Q
