# TPU-host image for street_crafter_tpu (the reference ships a CUDA 11.8
# torch image, Dockerfile:1-63; this is its TPU-VM analog).
#
# Build:  docker build -t street-crafter-tpu .
# Run:    docker run --privileged --net=host street-crafter-tpu \
#           python -m street_crafter_tpu.runner.train --config configs/waymo_val_016.yaml
#
# On a Cloud TPU VM the libtpu device is exposed via /dev/accel*; the
# `--privileged --net=host` pair is the standard TPU-VM docker invocation.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential cmake ninja-build git ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# JAX with TPU support + the pinned scientific stack. torch is CPU-only:
# it is used exclusively by the weight converter (models/vdm/convert.py)
# to read reference checkpoints.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint chex einops numpy \
    imageio imageio-ffmpeg pyyaml pytest \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

COPY . /workspace/street_crafter_tpu_repo
WORKDIR /workspace/street_crafter_tpu_repo

# build the native C++ host kernels (PLY io fast paths); pure-python
# fallbacks exist, so failure is non-fatal
RUN python -m street_crafter_tpu.native.build || true

ENV PYTHONPATH=/workspace/street_crafter_tpu_repo

CMD ["python", "-m", "pytest", "tests/", "-q", "-x"]
