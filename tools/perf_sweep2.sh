#!/bin/bash
# Round-3 sweep #2: chunked-unsafe forward variants (pipeline lookahead,
# exp2) and batch scaling. Run when the chip is free; results -> PERF.md.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" timeout 1200 python bench.py --model vit 2>/dev/null | tail -1
}
run INTENTBEV_FWD_PIPELINE=1
run INTENTBEV_FWD_EXP2=1
run INTENTBEV_FWD_PIPELINE=1 INTENTBEV_FWD_EXP2=1
echo "=== batch 16 (default kernel config) ==="
timeout 1200 python bench.py --model vit --batch 16 2>/dev/null | tail -1
