# Developer entry points (reference: Makefile test/bench/ci targets).

PY ?= python

.PHONY: test test-fast bench native entry ci clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

sanitize:
	$(MAKE) -C native sanitize

entry:
	$(PY) __graft_entry__.py

ci: native sanitize test entry

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
