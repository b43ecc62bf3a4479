#!/bin/bash
# Round-3 on-chip perf sweep: run AFTER the training run releases the chip.
# Each line prints its config then the bench JSON. Results -> docs/PERF.md.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" timeout 900 python bench.py --model vit 2>/dev/null | tail -1
}
echo "--- baseline (monolithic, safe) ---"
run INTENTBEV_NOOP=1
echo "--- chunked safe ---"
run INTENTBEV_FWD_KV_CHUNK=512
run INTENTBEV_FWD_KV_CHUNK=1152
echo "--- monolithic unsafe ---"
run INTENTBEV_FWD_SOFTMAX=unsafe
echo "--- chunked unsafe ---"
run INTENTBEV_FWD_KV_CHUNK=512 INTENTBEV_FWD_SOFTMAX=unsafe
run INTENTBEV_FWD_KV_CHUNK=1152 INTENTBEV_FWD_SOFTMAX=unsafe
run INTENTBEV_FWD_KV_CHUNK=2304 INTENTBEV_FWD_SOFTMAX=unsafe
