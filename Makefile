# Developer entry points (the reference's Makefile manages a Docker env;
# here the environment is bare-metal JAX/TPU, so targets map to local tools).

.PHONY: test test-fast native bench lint clean

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow"

bench: native
	python bench.py

lint:
	python -m compileall -q ball_action_spotting_tpu scripts configs

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
