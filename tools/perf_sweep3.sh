#!/bin/bash
# Round-3 sweep #3: serving GELU variant (INTENTBEV_GELU=sigmoid) and its
# interaction with the MLP hidden-chunk / row-block knobs. Run when the
# chip is free; results -> docs/PERF.md. The flagship bench line (voxembed
# chunk transport) is the one that counts.
set -u
cd /root/repo
run() {
  echo "=== $* ==="
  env "$@" timeout 1200 python bench.py --voxembed 2>/dev/null | tail -1
}
echo "--- baseline (erf GELU — explicit: bench.py now defaults to sigmoid) ---"
run INTENTBEV_GELU=erf
echo "--- sigmoid GELU ---"
run INTENTBEV_GELU=sigmoid
run INTENTBEV_GELU=sigmoid INTENTBEV_MLP_HCHUNK=512
run INTENTBEV_GELU=sigmoid INTENTBEV_MLP_HCHUNK=0
echo "--- row blocks under hchunk 768 ---"
run INTENTBEV_LNMLP_BLOCK=512
run INTENTBEV_LNMLP_BLOCK=1024
