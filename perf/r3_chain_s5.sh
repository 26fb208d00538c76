#!/bin/bash
# Session-5 relaunch of the session-3/4 TPU queue: the environment restarted
# before any of r3w..r3ab produced results. Order = expected value:
# DeepCache (r3x) > ToMe (r3aa) > multi-LoRA serve (r3w) > packed sweep (r3y)
# > r3ab (vmap-noremat/LHS/fr options/unroll) > r3z (vmap retries + levers).
cd /root/repo
for s in r3x r3aa r3w r3y r3ab r3z; do
  echo "=== chain: starting $s at $(date +%H:%M:%S)" >> /tmp/r3_chain_s5.log
  bash perf/${s}_queue.sh
done
echo "=== chain DONE at $(date +%H:%M:%S)" >> /tmp/r3_chain_s5.log
