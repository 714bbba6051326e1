# TPU-host serving/training image for ball_action_spotting_tpu.
#
# The reference ships a CUDA container (reference Dockerfile:1-6 on
# osaiai/dokai:23.05-vpf with NVDEC/VPF); the TPU analog is a slim
# python image + the pinned jax[tpu]/libtpu triple from constraints.txt
# (the exact environment every BENCH_r*.json number was measured in).
#
# Build / lifecycle targets: `make docker-build`, `make docker-run`,
# `make docker-exec` (reference Makefile:12-47 parity; see Makefile).
#
# On a Cloud TPU VM the container needs the TPU devices:
#   docker run --privileged --net=host -v /dev:/dev ...
# (libtpu talks to /dev/accel* or /dev/vfio; --net=host also exposes the
# gRPC ports multi-host pods use over ICI/DCN.)

FROM python:3.12-slim

# C++17 toolchain for native/libgray_store.so; libgl/libglib for OpenCV.
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# Environment first (constraints.txt = full pip freeze of the measured
# env: jax 0.9.0 / jaxlib 0.9.0 / libtpu 0.0.34, flax 0.12.3, ...) so
# code-only rebuilds reuse this layer. torch+cpu is optional (importer
# tests only) and deliberately excluded from the image.
COPY constraints.txt ./
RUN pip install --no-cache-dir -c constraints.txt \
        "jax[tpu]" flax optax orbax-checkpoint \
        numpy scipy opencv-python scikit-learn pytest \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
RUN make -C native && pip install --no-cache-dir --no-deps -e .

# Data/workdir volume (reference layout under it — see paths.py, docs/SETUP.md)
ENV BAS_TPU_WORKDIR=/workdir
# Persistent XLA compile cache across container restarts (serving restart
# cost 49.7 -> 13.4 s measured, BENCH_COLDSTART_r04.json)
ENV BAS_TPU_COMPILE_CACHE=/workdir/.jax_cache

# Default: show the CLI surface. Typical entrypoints:
#   python -m scripts.ball_action.train --experiment sampling_weights_001
#   python -m ball_action_spotting_tpu.predict.server --checkpoint ... --port 8080
CMD ["python", "-c", "import ball_action_spotting_tpu as b; print(b.__doc__)"]
