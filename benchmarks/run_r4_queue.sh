#!/bin/bash
# Round-4 TPU queue v2: wait for tunnel health, then run steps (2 tries
# (checked in from /tmp/tpu_queue.sh — round-4 TPU evidence queue; safe to
# relaunch: every step is skipped once its artifact exists)
# each). If a step fails twice, re-verify tunnel health before moving on.
cd /root/repo
Q=/tmp/tpu_queue.log

probe () {
  timeout 600 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((128,128)).sum()), flush=True)" >> /tmp/q_probe.log 2>&1
}

wait_for_tpu () {
  for i in $(seq 1 200); do
    echo "[wait_for_tpu $i] $(date +%H:%M:%S)" >> $Q
    probe && { echo "[wait_for_tpu] UP $(date +%H:%M:%S)" >> $Q; return 0; }
    sleep 180
  done
  return 1
}

run_step () {
  local name="$1"; local tmo="$2"; shift 2
  [ -n "$(eval echo \$SKIP_$name)" ] && return 0
  for attempt in 1 2; do
    echo "[$name attempt $attempt] $(date +%H:%M:%S)" >> $Q
    PYTHONUNBUFFERED=1 timeout "$tmo" "$@" > /tmp/q_${name}.log 2>&1
    rc=$?
    echo "[$name attempt $attempt] rc=$rc $(date +%H:%M:%S)" >> $Q
    [ $rc -eq 0 ] && return 0
    wait_for_tpu
  done
  echo "[$name] FAILED" >> $Q
  return 1
}

echo "=== queue v2 start $(date) ===" >> $Q
wait_for_tpu || { echo "tunnel never came back" >> $Q; exit 1; }

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

[ -f CKPT_DTYPE_AB_r4.json ] || run_step ckab 3600 python -m benchmarks.ckpt_dtype_ab --out CKPT_DTYPE_AB_r4.json

[ -f OP_PROFILE_r4.json ] || run_step opprof 3600 python -m benchmarks.op_profile --trace --json_out OP_PROFILE_r4.json

run_step bench 3600 python bench.py

[ -f DECODE_WARM_AB_r4.json ] || run_step warmab 7200 python -m benchmarks.decode_warm_ab \
  --image_root /tmp/ab_imgs/train --out DECODE_WARM_AB_r4.json

echo "=== queue v2 done $(date) ===" >> $Q
