# Developer entry points. Local targets assume a bare-metal TPU VM (the
# measured environment, docs/SETUP.md); the docker-* targets mirror the
# reference Makefile's container lifecycle (reference Makefile:12-47)
# for hosts that prefer an image.

.PHONY: test test-fast native bench lint clean \
	docker-build docker-run docker-stop docker-exec docker-logs docker-test

NAME ?= bas-tpu
WORKDIR_VOL ?= $(CURDIR)/workdir

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

# -- container lifecycle (TPU VM: --privileged + /dev for /dev/accel*) ------

docker-build:
	docker build -t $(NAME) .

docker-run: docker-stop
	docker run --rm -dit --name $(NAME) \
		--privileged --net=host -v /dev:/dev \
		-v $(WORKDIR_VOL):/workdir \
		$(NAME)

docker-stop:
	-docker stop $(NAME)

docker-exec:
	docker exec -it $(NAME) $(COMMAND)

docker-logs:
	docker logs -f $(NAME)

# CPU-backend suite inside the image (no TPU needed; validates the build)
docker-test:
	docker run --rm $(NAME) python -m pytest tests/ -q -m "not slow"
