# Developer entry points — everything runs from a checkout, no install.
#
#   make test      full pytest suite (CPU, 8 virtual devices)
#   make dryrun    the driver's multi-chip contract on the virtual mesh
#   make bench     headline single-chip throughput (needs the TPU; fails
#                  fast with a clear error if the relay is unreachable)
#   make demo      end-to-end single-chip demo
#   make multichip three-leg multi-chip demo (serving / DP / chunked-DP)
#   make native    prebuild the host-ingest .so into the user cache

PY ?= python
CPU_MESH = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test dryrun bench demo multichip native tpu-jobs

tpu-jobs:  # run every queued TPU measurement (serial; exits 2 if relay down)
	env -u XLA_FLAGS -u JAX_PLATFORMS $(PY) scripts/tpu_jobs.py

test:
	$(PY) -m pytest tests/ -q

dryrun:
	env $(CPU_MESH) $(PY) __graft_entry__.py

bench:
	$(PY) bench.py

demo:
	env JAX_PLATFORMS=cpu $(PY) examples/demo.py

multichip:
	env $(CPU_MESH) $(PY) examples/multichip.py

native:
	$(PY) -c "from dfac_tpu.io.fastcast import native_available; \
	          print('native ingest:', 'built' if native_available() else 'unavailable (numpy fallback)')"
