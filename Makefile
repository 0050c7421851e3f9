SHELL := /bin/bash

.PHONY: help test test-fast native bench demo clean

help:
	@echo "targets: test | test-fast | native | bench | demo | clean"

## Full test suite on the 8-device virtual CPU mesh
test:
	python -m pytest tests/ -q

## Quick subset (no heavy conv tests)
test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_training.py \
	  --ignore=tests/test_unet.py --ignore=tests/test_cfg.py

## Build the native IO library
native:
	$(MAKE) -C native

## Headline benchmark on the attached TPU chip
bench:
	python bench.py

## End-to-end pipeline demo on synthetic data
demo:
	python -m drivescenegen_tpu.scripts.run_demo --work_dir /tmp/dsg_demo

clean:
	find . -type f -name "*.py[co]" -delete
	find . -type d -name "__pycache__" -prune -exec rm -rf {} \;
	$(MAKE) -C native clean
