#!/usr/bin/env bash
# Pending TPU measurements queued during the tunnel outage (docs/STATUS.md).
# Run when the tunnel is back (one TPU client at a time — stop everything
# else first). Each step is bounded; results land in /tmp/tpu_pending/.
#
#   bash tools/run_tpu_pending.sh
#
# 1. Serving @448^2, standard encoder  (reference point)
# 2. Serving @448^2, fused Pallas encoder (BENCH_FUSED_ENC=1) — the number
#    docs/STATUS.md lists as the first TODO
# 3. Headline train bench refresh (writes bench_detail.json)
set -u
out=/tmp/tpu_pending
mkdir -p "$out"
cd "$(dirname "$0")/.."

run() { # name timeout_s env...
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  env "$@" timeout "$t" python bench.py >"$out/$name.json" 2>"$out/$name.err"
  local rc=$?
  cat "$out/$name.json"
  [ $rc -ne 0 ] && echo "(exit $rc — see $out/$name.err)"
  return 0
}

run infer_448_std   900 BENCH_MODE=infer BENCH_INFER_CHAIN=16
run infer_448_fused 1200 BENCH_MODE=infer BENCH_INFER_CHAIN=16 BENCH_FUSED_ENC=1
run train_headline  1200
echo "done; results in $out"
