# Convenience targets. The real-weights runbook (VERDICT r3 #9):
#
#   make parity WEIGHTS=/path/to/weights_root
#
# runs every parity leg + the preset quality reports off one directory
# (layout: sd/ [lora/] [arcface.pth] [mtcnn/|mtcnn.pt] — see
# `python -m faceposegenerator_tpu.cli parity-all --help`) and writes
# parity_all_verdict.json.

PY ?= python
WEIGHTS ?= /weights

.PHONY: parity smoke test bench dryrun pod-rehearsal

parity:
	$(PY) -m faceposegenerator_tpu.cli parity-all --weights_root $(WEIGHTS) \
		--output parity_all_verdict.json

# fast test tier (<10 min target on the 1-CPU host); `make test` is the
# full sweep (~2 h — budget accordingly, see CLAUDE.md)
smoke:
	$(PY) -m pytest tests/ -q -m "not slow"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
	$(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

# real multi-PROCESS pod-launch rehearsal (separate OS processes +
# jax.distributed coordinator + Gloo collectives), CPU backend
pod-rehearsal:
	$(PY) -m faceposegenerator_tpu.cli pod-rehearsal --processes 2 --local_devices 2
