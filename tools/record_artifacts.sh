#!/bin/bash
# Record the benchmark-evidence artifacts on the real chip
# (BASELINE configs 4/5, scaling report, per-phase profile, op trace,
# headline bench).  Run from the repo root; writes bench/out/.
# Each step is serialized — the TPU is exclusive.
set -x
mkdir -p bench/out

# Config 4: 1024-scenario randomized sweep (shards to /tmp; only the
# metrics + aggregate report are committed).
SWEEP_DIR=${SWEEP_DIR:-/tmp/obca_sweep_r3}
rm -rf "$SWEEP_DIR"
timeout 2400 python bench/run_sweep.py --batch 1024 --shard-size 128 \
    --config f32 --out "$SWEEP_DIR"
cp "$SWEEP_DIR/metrics.jsonl" bench/out/sweep_metrics.jsonl
python bench/report.py "$SWEEP_DIR" > bench/out/sweep_report.json
cat bench/out/sweep_report.json

# Config 5: 10 Hz MPC at the canonical N=80, fleet + single-rollout
# latency.
timeout 2400 python bench/run_mpc.py --config f32 \
    > bench/out/mpc_n80.json
cat bench/out/mpc_n80.json

# Scaling report (1-chip row on this machine; >=2-host rows pod-gated).
timeout 2400 python bench/report_scaling.py

# Per-phase differential profile + op-level device trace.
timeout 2400 python tools/profile_solve.py 128 80 20 \
    > bench/out/profile_phase.json
cat bench/out/profile_phase.json
timeout 1200 python tools/trace_solve.py 128 80 20 \
    > bench/out/trace_ops.json

# Headline bench (also checks on-chip parity vs the f64 golden).
timeout 2400 python bench.py | tee bench/out/bench_headline.json
