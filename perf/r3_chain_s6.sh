#!/bin/bash
# Session-6 relaunch: the environment restarted mid-session-5 (r3x/r3aa/r3w
# completed; r3y got 1/4 variants; r3z/r3ab/r3ac/r3ad never ran). Order =
# expected value: finish the packed-sweep op point (r3y_rest), then the
# guidance-interval variants incl. the DeepCache combos (r3ad), then batch-1
# latency Picard (r3ac), then the vmap/option retries (r3ab, r3z).
cd /root/repo
for s in perf/r3y_rest.sh perf/r3ad_queue.sh perf/r3ac_queue.sh \
         perf/r3ab_queue.sh perf/r3z_queue.sh; do
  echo "=== chain: starting $s at $(date +%H:%M:%S)" >> /tmp/r3_chain_s6.log
  bash "$s"
done
echo "=== chain DONE at $(date +%H:%M:%S)" >> /tmp/r3_chain_s6.log
